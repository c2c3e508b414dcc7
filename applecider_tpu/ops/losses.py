"""Loss functions as pure JAX ops.

Re-provides the reference loss zoo TPU-natively:

* focal loss            — reference ``src/applecider/models/HyraxBaselineCLS.py:169-191``
* cross entropy         — reference ``astrominn.py:147`` (torch CE semantics)
* dice loss             — reference ``_archive/AppleCider/models/AstroMiNN.py:815-834``
* multi-class BCE       — reference ``_archive/AppleCider/models/AstroMiNN.py:929-964``
* expert-specialization — reference ``_archive/AppleCider/models/AstroMiNN.py:875-926``
* class-balanced weights (effective number, beta=0.9999)
                        — reference ``_archive/AppleCider/utils.py:209-215``

All functions take logits of shape (B, C) and integer labels (B,) unless
stated otherwise, compute internally in f32, and reduce with ``mean`` by
default to match the torch defaults.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _reduce(x: jax.Array, reduction: str) -> jax.Array:
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    return x


def focal_loss(
    logits: jax.Array,
    labels: jax.Array,
    gamma: float = 2.0,
    alpha: jax.Array | None = None,
    eps: float = 0.0,
    reduction: str = "mean",
) -> jax.Array:
    """Multi-class focal loss: ``-(y * (1-p)^gamma * log p).sum(-1)``.

    ``eps > 0`` enables label smoothing with mass ``eps/(C-1)`` off-target.
    """
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    if eps > 0:
        y = jnp.full_like(logp, eps / (num_classes - 1))
        y = y.at[jnp.arange(labels.shape[0]), labels].set(1.0 - eps)
    else:
        y = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    focal_weight = (1.0 - p) ** gamma
    if alpha is not None:
        focal_weight = focal_weight * jnp.reshape(alpha, (1, num_classes))
    loss = -jnp.sum(y * focal_weight * logp, axis=-1)
    return _reduce(loss, reduction)


def cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    weight: jax.Array | None = None,
    reduction: str = "mean",
) -> jax.Array:
    """torch.nn.CrossEntropyLoss semantics, including one-hot/soft targets.

    If ``labels`` is floating point with the same rank as ``logits`` it is
    treated as a (possibly soft) target distribution — the reference feeds
    one-hot targets from ``ImageAndMetadataDataset.get_target``.
    Integer labels use the classic weighted-mean reduction.
    """
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    if jnp.issubdtype(labels.dtype, jnp.floating) and labels.ndim == logits.ndim:
        # torch semantics for probability targets: per-sample loss is
        # -sum_c w_c * y_c * log p_c (NOT (-sum y*logp) * (sum y*w), which
        # differs for genuinely soft targets), and 'mean' is the BATCH
        # mean — weight-normalized mean applies only to class-index targets
        if weight is not None:
            logp = logp * weight[None, :]
        loss = -jnp.sum(labels * logp, axis=-1)
        return _reduce(loss, reduction)
    picked = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if weight is not None:
        w = weight[labels]
        if reduction == "mean":
            return -jnp.sum(picked * w) / jnp.sum(w)
        return _reduce(-picked * w, reduction)
    return _reduce(-picked, reduction)


def dice_loss(logits: jax.Array, labels: jax.Array, smooth: float = 1.0) -> jax.Array:
    """Soft dice over softmax probabilities vs one-hot targets."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    y = jax.nn.one_hot(labels, logits.shape[-1], dtype=jnp.float32)
    intersection = jnp.sum(probs * y, axis=0)
    denom = jnp.sum(probs, axis=0) + jnp.sum(y, axis=0)
    dice = (2.0 * intersection + smooth) / (denom + smooth)
    return 1.0 - jnp.mean(dice)


def multiclass_bce_loss(logits: jax.Array, labels: jax.Array, reduction: str = "mean") -> jax.Array:
    """Per-class sigmoid BCE against one-hot targets."""
    y = jax.nn.one_hot(labels, logits.shape[-1], dtype=jnp.float32)
    logits = logits.astype(jnp.float32)
    per = jnp.maximum(logits, 0) - logits * y + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return _reduce(jnp.sum(per, axis=-1), reduction)


def expert_specialization_loss(
    logits: jax.Array,
    labels: jax.Array,
    router_weights: jax.Array,
    gamma: float = 2.0,
    spec_weight: float = 0.25,
    num_experts: int | None = None,
) -> jax.Array:
    """Focal loss + MSE pushing the router toward class-cycled expert one-hots.

    Sample with label ``c`` is nudged toward expert ``c % E`` — the
    specialization prior of the reference's
    ``FocalLossWithExpertSpecialization``.
    """
    num_experts = num_experts or router_weights.shape[-1]
    base = focal_loss(logits, labels, gamma=gamma)
    target_expert = labels % num_experts
    target = jax.nn.one_hot(target_expert, num_experts, dtype=jnp.float32)
    spec = jnp.mean((router_weights.astype(jnp.float32) - target) ** 2)
    return base + spec_weight * spec


def class_balanced_weights(class_counts: np.ndarray, beta: float = 0.9999) -> np.ndarray:
    """Effective-number class weights, normalized to sum to C."""
    counts = np.asarray(class_counts, dtype=np.float64)
    effective = 1.0 - np.power(beta, counts)
    weights = (1.0 - beta) / np.maximum(effective, 1e-12)
    weights = weights / weights.sum() * len(counts)
    return weights.astype(np.float32)


def power_class_weights(class_counts: np.ndarray, exponent: float = 1.0) -> np.ndarray:
    """``N / count^exponent`` class weights (reference AstroMiNN.py:1244-1253)."""
    counts = np.asarray(class_counts, dtype=np.float64)
    total = counts.sum()
    weights = total / np.power(np.maximum(counts, 1.0), exponent)
    return weights.astype(np.float32)
