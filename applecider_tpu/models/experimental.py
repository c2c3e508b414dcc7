"""Experimental modules documented in the reference's design exploration.

Behavioral contracts from ``_archive/AppleCider/models/AstroMiNN.py``:

* ``PositionEmbeddingSine`` (``:225-320``) — 2-D sine/cosine positional
  encoding over feature maps (DETR-style), plus learned and Fourier
  variants selectable by ``kind``;
* ``CNNTower`` (``:101-222``) — per-channel CNN backbones over the
  sci/tmpl/diff planes with attention-derived centroid offsets between the
  science and difference channels.

These are not used by the final AppleCider model (the reference keeps them
as exploration artifacts); they are provided for capability parity and as
building blocks.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from applecider_tpu.models.layers import Linear, gelu_exact
from applecider_tpu.models.convnext import Conv2dTorch


def position_embedding_sine(h: int, w: int, dim: int, temperature: float = 10000.0) -> jnp.ndarray:
    """(h, w, dim) 2-D sine/cosine positional encoding."""
    assert dim % 4 == 0, "dim must be divisible by 4"
    quarter = dim // 4
    y = jnp.arange(h, dtype=jnp.float32)[:, None, None]
    x = jnp.arange(w, dtype=jnp.float32)[None, :, None]
    freq = temperature ** (jnp.arange(quarter, dtype=jnp.float32) / quarter)
    y_enc = jnp.concatenate([jnp.sin(y / freq), jnp.cos(y / freq)], axis=-1)  # (h,1,2q)
    x_enc = jnp.concatenate([jnp.sin(x / freq), jnp.cos(x / freq)], axis=-1)  # (1,w,2q)
    y_enc = jnp.broadcast_to(y_enc, (h, w, 2 * quarter))
    x_enc = jnp.broadcast_to(x_enc, (h, w, 2 * quarter))
    return jnp.concatenate([y_enc, x_enc], axis=-1)


class PositionEmbedding(nn.Module):
    """Sine / learned / Fourier positional encodings for (B, H, W, C) maps."""

    dim: int
    kind: str = "sine"  # "sine" | "learned" | "fourier"

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        if self.kind == "sine":
            pe = position_embedding_sine(H, W, self.dim)
        elif self.kind == "learned":
            pe = self.param("pe", nn.initializers.normal(0.02), (H, W, self.dim))
        elif self.kind == "fourier":
            bmat = self.param("b", nn.initializers.normal(1.0), (2, self.dim // 2))
            yy, xx = jnp.meshgrid(
                jnp.linspace(0, 1, H), jnp.linspace(0, 1, W), indexing="ij"
            )
            coords = jnp.stack([yy, xx], axis=-1)  # (H, W, 2)
            proj = 2 * math.pi * coords @ bmat
            pe = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
        else:
            raise ValueError(self.kind)
        return x + pe[None].astype(x.dtype)


def soft_centroid(attn_map: jax.Array) -> jax.Array:
    """(B, H, W) attention map -> (B, 2) soft centroid in pixel coords."""
    B, H, W = attn_map.shape
    probs = jax.nn.softmax(attn_map.reshape(B, -1), axis=-1).reshape(B, H, W)
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    cy = jnp.sum(probs * ys[None, :, None], axis=(1, 2))
    cx = jnp.sum(probs * xs[None, None, :], axis=(1, 2))
    return jnp.stack([cy, cx], axis=-1)


class CNNTower(nn.Module):
    """Per-channel CNN backbones + sci/diff attention centroid offset.

    Each input plane gets its own small conv stack; a 1-channel attention
    head per plane yields a soft centroid, and the science-vs-difference
    centroid offset joins the pooled features (the reference's centroid
    trick for astrometric displacement).
    """

    channels: int = 32
    depth: int = 3
    outdims: int = 32
    pos_kind: str = "sine"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, P) stacked planes (sci, tmpl, diff)."""
        B, H, W, P = x.shape
        feats, centroids = [], []
        for p in range(P):
            h = x[..., p : p + 1]
            for d in range(self.depth):
                h = Conv2dTorch(self.channels, 3, padding=1, dtype=self.dtype,
                                name=f"plane{p}_conv{d}")(h)
                h = gelu_exact(h)
                if d < self.depth - 1:
                    h = nn.max_pool(h, (2, 2), strides=(2, 2))
            h = PositionEmbedding(self.channels, self.pos_kind, name=f"plane{p}_pos")(h)
            attn = Conv2dTorch(1, 1, dtype=self.dtype, name=f"plane{p}_attn")(h)[..., 0]
            centroids.append(soft_centroid(attn.astype(jnp.float32)))
            feats.append(jnp.mean(h, axis=(1, 2)))
        offset = centroids[-1] - centroids[0]  # diff vs sci displacement
        fused = jnp.concatenate(feats + [offset.astype(feats[0].dtype)], axis=-1)
        return Linear(self.outdims, dtype=self.dtype, name="out")(fused).astype(jnp.float32)
