"""Time2Vec temporal embedding.

Behavioral contract from the reference (``src/applecider/models/Time2Vec.py:48-72``):
map scalar time t to a d_model vector with one linear feature
``w0*t + b0`` and ``d_model-1`` periodic features ``sin(w_i*t + b_i)``.
Weights init ~ N(0,1), biases zero (torch.randn / zeros).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


class Time2Vec(nn.Module):
    d_model: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, t):
        """t: (B, L) scalar times -> (B, L, d_model)."""
        w0 = self.param("w0", nn.initializers.normal(1.0), (1,))
        b0 = self.param("b0", nn.initializers.zeros, (1,))
        w = self.param("w", nn.initializers.normal(1.0), (self.d_model - 1,))
        b = self.param("b", nn.initializers.zeros, (self.d_model - 1,))
        t = t.astype(jnp.float32)
        linear = (w0 * t[..., None] + b0)
        periodic = jnp.sin(t[..., None] * w + b)
        out = jnp.concatenate([linear, periodic], axis=-1)
        return out.astype(self.dtype or out.dtype)
