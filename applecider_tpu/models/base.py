"""Task abstraction: a flax module bundled with its loss, optimizer and
host-side batch conversion.

This replaces the Hyrax model contract (``@hyrax_model`` classes owning a
``criterion``/``optimizer`` and implementing ``forward``/``train_step``/
``to_tensor``) with a functional split the TPU runtime can jit: the Trainer
differentiates ``Task.loss_fn`` and applies the optax transformation; the
model itself stays a pure flax module.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax


class Task:
    """Base class for registered model tasks.

    Subclasses set ``self.module`` in ``__init__`` and implement
    ``loss_fn`` / ``predict`` / ``to_tensor``.
    """

    name: str = "task"
    grad_clip: Optional[float] = None

    def __init__(self, config):
        self.config = config

    # --- device plane -----------------------------------------------------
    def init(self, rng: jax.Array, batch) -> dict:
        raise NotImplementedError

    def loss_fn(self, params, batch, rng: jax.Array, train: bool) -> tuple[jax.Array, dict]:
        """Return (scalar loss, aux metrics dict). Must be jit-traceable."""
        raise NotImplementedError

    def predict(self, params, batch) -> jax.Array:
        """Deterministic forward pass (logits or probabilities per config)."""
        raise NotImplementedError

    def make_optimizer(self) -> optax.GradientTransformation:
        return optax.adam(1e-4)

    # --- host plane ---------------------------------------------------------
    @staticmethod
    def to_tensor(data_dict: dict):
        """Convert a host batch dict into the device batch tuple."""
        raise NotImplementedError

    # --- helpers -------------------------------------------------------------
    def compute_dtype(self):
        name = self.config.get_path("train.compute_dtype", default="bfloat16")
        return jnp.bfloat16 if str(name) == "bfloat16" else jnp.float32


def maybe_softmax(logits: jax.Array, use_probabilities: bool) -> jax.Array:
    if use_probabilities:
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return logits
