"""Optimizer schedules and EMA.

Re-provides the reference training utilities TPU-natively:

* linear warmup -> cosine annealing with warm restarts (the reference's
  ``SequentialLR(LinearLR, CosineAnnealingWarmRestarts)``,
  ``_archive/AppleCider/train_utils.py:255-275``) via ``optax.join_schedules``;
* EMA shadow weights (``train_utils.py:17-45``);
* gradient clipping composed in front of the task optimizer
  (``clip_grad_norm_(max_norm=1.0)`` in every reference train step).

No GradScaler is needed: bf16 on TPU trains without loss scaling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def warmup_cosine_restarts(
    base_lr: float,
    warmup_steps: int,
    first_cycle_steps: int,
    n_cycles: int = 4,
    t_mult: int = 2,
    min_scale: float = 0.0,
) -> optax.Schedule:
    """Linear warmup then cosine annealing with warm restarts."""
    schedules = []
    boundaries = []
    step = warmup_steps
    if warmup_steps > 0:
        schedules.append(optax.linear_schedule(base_lr * 0.1, base_lr, warmup_steps))
        boundaries.append(warmup_steps)
    cycle = first_cycle_steps
    for _ in range(n_cycles):
        schedules.append(
            optax.cosine_decay_schedule(base_lr, cycle, alpha=min_scale)
        )
        step += cycle
        boundaries.append(step)
        cycle *= t_mult
    # terminal constant floor
    schedules.append(optax.constant_schedule(base_lr * max(min_scale, 1e-3)))
    return optax.join_schedules(schedules, boundaries)


def warmup_cosine(base_lr: float, warmup_steps: int, total_steps: int) -> optax.Schedule:
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0 if warmup_steps else base_lr,
        peak_value=base_lr,
        warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, warmup_steps + 1),
    )


def freeze_subtrees(tx: optax.GradientTransformation, prefixes) -> optax.GradientTransformation:
    """Zero updates for params whose '/'-joined path starts with a prefix.

    Enables the reference's head-then-full finetune recipe (train the
    classifier with the MPT-pretrained trunk frozen, then unfreeze).
    """
    prefixes = tuple(str(p) for p in prefixes)

    def labels(params):
        def lab(path, _):
            joined = "/".join(str(getattr(p, "key", p)) for p in path)
            # segment-boundary match: 'trunk' freezes trunk/* but not a
            # sibling named trunk_norm
            frozen = any(
                joined == pre or joined.startswith(pre + "/") for pre in prefixes
            )
            return "frozen" if frozen else "train"

        return jax.tree_util.tree_map_with_path(lab, params)

    return optax.multi_transform({"train": tx, "frozen": optax.set_to_zero()}, labels)


def with_grad_clip(tx: optax.GradientTransformation, max_norm: float | None) -> optax.GradientTransformation:
    if max_norm is None or max_norm <= 0:
        return tx
    return optax.chain(optax.clip_by_global_norm(max_norm), tx)


class EMA:
    """Exponential moving average of params (host-driven, device-resident)."""

    def __init__(self, decay: float = 0.999):
        self.decay = decay
        self.shadow = None

    def init(self, params):
        # copy=True: the shadow must own its buffers — the train step
        # donates params (jit donate_argnums), so aliasing them here would
        # leave the shadow pointing at deleted arrays after step 1.
        self.shadow = jax.tree.map(lambda p: jnp.array(p, copy=True), params)

    def update(self, params):
        if self.shadow is None:
            self.init(params)
            return
        d = self.decay
        self.shadow = jax.tree.map(lambda s, p: s * d + p * (1.0 - d), self.shadow, params)

    def params(self):
        return self.shadow


def with_plateau_scale(tx: optax.GradientTransformation) -> optax.GradientTransformation:
    """Append a host-adjustable LR multiplier to a transformation.

    The multiplier lives in the optimizer state (``inject_hyperparams``),
    so the Trainer can lower it between epochs — torch
    ``ReduceLROnPlateau.step(val_loss)`` semantics — without recompiling
    the jitted train step.
    """
    return optax.chain(tx, optax.inject_hyperparams(optax.scale)(step_size=1.0))


def set_plateau_scale(opt_state, scale: float):
    """Return ``opt_state`` with the plateau multiplier set to ``scale``."""
    inject = opt_state[-1]
    hyper = dict(inject.hyperparams)
    hyper["step_size"] = jnp.asarray(scale, dtype=jnp.asarray(hyper["step_size"]).dtype)
    return opt_state[:-1] + (inject._replace(hyperparams=hyper),)


class ReduceLROnPlateau:
    """Host-side plateau tracker -> multiplicative LR scale.

    Consumed by the Trainer: the returned scale is written into the
    optimizer state built with ``with_plateau_scale``
    (reference semantics: ``core/trainer.py:233-238`` steps a torch
    ReduceLROnPlateau on val loss each epoch).
    """

    def __init__(self, factor: float = 0.5, patience: int = 5, min_scale: float = 1e-3):
        self.factor = factor
        self.patience = patience
        self.min_scale = min_scale
        self.best = float("inf")
        self.bad_epochs = 0
        self.scale = 1.0

    def step(self, metric: float) -> float:
        if metric < self.best - 1e-12:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale = max(self.scale * self.factor, self.min_scale)
                self.bad_epochs = 0
        return self.scale


class EarlyStopping:
    """Patience-based early stop on a monitored (lower-is-better) metric.

    Reference semantics: ``brew_cider.py:871-887``.
    """

    def __init__(self, patience: int = 15):
        self.patience = patience
        self.best = None
        self.counter = 0

    def step(self, metric: float) -> bool:
        if self.best is None or metric < self.best:
            self.best = metric
            self.counter = 0
        else:
            self.counter += 1
        return self.counter >= self.patience
