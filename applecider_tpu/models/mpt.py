"""Masked-Event Pre-Training (MPT) for the photometry encoder.

Behavioral contract from the reference
(``src/applecider/models/HyraxBaselineCLS.py:194-319``): mask 30% of valid
tokens per sample with *band-stratified* selection (k = max(floor(n_valid *
mask_p), 3), k//3 per band without replacement, remainder drawn from the
untouched pool), zero channels 2:7 of masked tokens (flux, flux_err,
one-hot band — dt/dt_prev survive), then train three heads on the encoder's
event tokens: flux regression, 3-way band CE, next-dt regression, combined
with lambda weights (5/3/5).

Two deliberate divergences from the reference implementation (both are
documented reference bugs we do NOT replicate):

* the reference *multiplies* the lambda-weighted losses
  (``HyraxBaselineCLS.py:278``); the archive notebook and the paper sum
  them — we sum;
* the reference masks the batch tensor in place and then reads regression/
  classification targets from the already-zeroed tensor, destroying the
  flux/band targets; we keep the clean tensor for targets and feed the
  masked copy to the encoder.

The per-sample Python masking loop (``:286-319``) is re-expressed as a
fixed-shape vectorized ranking: draw uniform scores, rank valid tokens per
(sample, band) via double-argsort, select ``rank < quota``. Runs inside jit
on device.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from applecider_tpu.models.base import Task
from applecider_tpu.models.baseline_cls import BaselineCLSEncoder, BaselineCLSTask
from applecider_tpu.models.layers import resolve_remat
from applecider_tpu.models.layers import Linear
from applecider_tpu.registry import register_model


def band_stratified_mask(key: jax.Array, bands: jax.Array, pad_mask: jax.Array, mask_p: float):
    """Select masked token positions, band-stratified, fully vectorized.

    Parameters
    ----------
    bands : (B, L) int32 band id per token (argmax of the one-hot channels).
    pad_mask : (B, L) bool, True = padding.
    Returns (B, L) bool mask of selected tokens.
    """
    B, L = bands.shape
    valid = ~pad_mask
    n_valid = jnp.sum(valid, axis=1)  # (B,)
    k = jnp.maximum((n_valid.astype(jnp.float32) * mask_p).astype(jnp.int32), 3)
    num_each = k // 3
    extras = k - 3 * num_each

    def ranks_of(scores):
        order = jnp.argsort(scores, axis=1)
        rank = jnp.argsort(order, axis=1)
        return rank

    k_band, k_extra = jax.random.split(key)
    u = jax.random.uniform(k_band, (3, B, L))
    selected = jnp.zeros((B, L), dtype=bool)
    for band in range(3):
        in_pool = valid & (bands == band)
        scores = jnp.where(in_pool, u[band], jnp.inf)
        rank = ranks_of(scores)
        count_b = jnp.sum(in_pool, axis=1, keepdims=True)
        quota = jnp.minimum(count_b, num_each[:, None])
        selected = selected | (in_pool & (rank < quota))

    # extras drawn uniformly from valid-but-unselected tokens
    pool = valid & ~selected
    scores = jnp.where(pool, jax.random.uniform(k_extra, (B, L)), jnp.inf)
    rank = ranks_of(scores)
    selected = selected | (pool & (rank < extras[:, None]))
    return selected


def apply_event_mask(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Zero channels 2:7 (logf, logfe, one-hot band) of masked tokens."""
    channel_is_masked = jnp.arange(x.shape[-1]) >= 2
    return jnp.where(mask[..., None] & channel_is_masked[None, None, :], 0.0, x)


class MPTModule(nn.Module):
    """Encoder trunk + three prediction heads over event tokens."""

    d_model: int = 128
    n_heads: int = 8
    n_layers: int = 4
    dropout: float = 0.40
    dtype: Optional[jnp.dtype] = None
    attn_impl: str = "auto"  # honor model.BaselineCLS.attention_impl too
    remat: object = False  # False | True | "attn"

    @nn.compact
    def __call__(self, x, pad_mask, *, deterministic: bool = True):
        z = BaselineCLSEncoder(
            self.d_model, self.n_heads, self.n_layers, self.dropout,
            dtype=self.dtype, attn_impl=self.attn_impl, remat=self.remat,
            name="trunk",
        )(x, pad_mask, deterministic=deterministic, te_dropout=True)
        h = z[:, 1:].astype(jnp.float32)  # event tokens only
        f_hat = Linear(1, name="head_flux")(h)[..., 0]
        b_hat = Linear(3, name="head_band")(h)
        dt_hat = Linear(1, name="head_dt")(h)[..., 0]
        return f_hat, b_hat, dt_hat


def _masked_mean(x, mask):
    m = mask.astype(jnp.float32)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


@register_model(name="MPT")
@register_model(name="MPTModel")
class MPTTask(Task):
    name = "MPT"

    def __init__(self, config):
        super().__init__(config)
        mc = config["model"]["BaselineCLS"]  # shares the classifier's hyperparameters
        self.mc = mc
        self.grad_clip = float(mc.get("grad_clip", 1.0))
        self.mask_p = float(mc.get("mask_p", 0.30))
        self.lambda_f = float(mc.get("lambda_f", 5.0))
        self.lambda_b = float(mc.get("lambda_b", 3.0))
        self.lambda_dt = float(mc.get("lambda_dt", 5.0))
        self.module = MPTModule(
            d_model=int(mc["d_model"]),
            n_heads=int(mc["n_heads"]),
            n_layers=int(mc["n_layers"]),
            dropout=float(mc["dropout"]),
            dtype=self.compute_dtype(),
            attn_impl=str(mc.get("attention_impl", "auto")),
            remat=resolve_remat(mc.get("remat", "auto")),
        )

    def init(self, rng, batch):
        data, pad_mask, *_ = batch
        return self.module.init(
            {"params": rng}, jnp.asarray(data), jnp.asarray(pad_mask), deterministic=True
        )

    def loss_fn(self, params, batch, rng, train: bool):
        data, pad_mask = batch[0], batch[1]
        k_mask, k_drop = jax.random.split(rng)
        bands = jnp.argmax(data[..., 4:7], axis=-1)
        mask = band_stratified_mask(k_mask, bands, pad_mask.astype(bool), self.mask_p)
        x_masked = apply_event_mask(data, mask)

        f_hat, b_hat, dt_hat = self.module.apply(
            {"params": params}, x_masked, pad_mask,
            deterministic=not train, rngs={"dropout": k_drop} if train else {},
        )

        true_f = data[..., 2]
        loss_f = _masked_mean((f_hat - true_f) ** 2, mask)

        logp = jax.nn.log_softmax(b_hat, axis=-1)
        loss_b = _masked_mean(-jnp.take_along_axis(logp, bands[..., None], axis=-1)[..., 0], mask)

        dt_gt = jnp.roll(data[..., 1], -1, axis=1).at[:, -1].set(0.0)
        loss_dt = _masked_mean((dt_hat - dt_gt) ** 2, mask)

        loss = self.lambda_f * loss_f + self.lambda_b * loss_b + self.lambda_dt * loss_dt
        metrics = {"loss": loss, "loss_f": loss_f, "loss_b": loss_b, "loss_dt": loss_dt}
        return loss, {"metrics": metrics}

    def predict(self, params, batch):
        data, pad_mask = batch[0], batch[1]
        return self.module.apply({"params": params}, data, pad_mask, deterministic=True)

    def make_optimizer(self):
        return optax.adamw(float(self.mc.get("pretrain_lr", 1e-4)), weight_decay=0.01)

    @staticmethod
    def to_tensor(data_dict: dict):
        return BaselineCLSTask.to_tensor(data_dict)


def warmstart_classifier_params(classifier_params: dict, mpt_params: dict) -> dict:
    """Copy the pretrained trunk into a fresh classifier param tree.

    The reference's weight surgery (baselineCLS_example.py:31-39) copies all
    non-``head.*`` keys; here the trunk subtree is the exact equivalent.
    """
    out = dict(classifier_params)
    out["trunk"] = jax.tree.map(np.asarray, mpt_params["trunk"])
    return out
