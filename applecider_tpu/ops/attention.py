"""Fused masked self-attention Pallas kernel.

The photometry encoder's attention (L=258, d=128, 8 heads) is the hot op
of the BaselineCLS/MPT path. Unfused XLA materializes the (B, H, L, L)
score tensor in HBM (hundreds of MB per large batch); this kernel computes
scores -> mask -> softmax -> weighted sum entirely in VMEM, one BATCH per
grid program with the heads looped inside — the sequence is short enough
that a full head's (L, L) score tile plus all heads' q/k/v fit on-chip
comfortably.

Grid history (measured TPU v5e, B=256): the round-2 kernel used one
(batch, head) pair per program — 2048 programs whose ~6 us launch/DMA
overhead alone cost ~12.9 ms, 1.8x SLOWER than XLA's 7.3 ms unfused chain.
This version launches B=256 programs and loops H=8 heads in-kernel,
amortizing the per-program overhead 8x; see docs/KERNEL_NOTES.md for the
current A/B verdict and `bench_kernels.py bench_attention` to re-measure.

Numerics match ``models.layers.MultiHeadSelfAttention`` (q/sqrt(hd) scaling,
-1e9 additive key-padding mask, f32 softmax); used behind the
``attention_impl="pallas"`` flag with the XLA einsum path as default and
fallback (the kernel requires a TPU; tests run it in interpreter mode).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mha_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    pad = mask_ref[0]  # (1, L) int32; 1 = padded key
    H = q_ref.shape[1]
    for h in range(H):  # static unroll: all heads share this program's DMA
        q = q_ref[0, h].astype(jnp.float32)  # (L, hd)
        k = k_ref[0, h].astype(jnp.float32)
        v = v_ref[0, h].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (L, L)
        scores = jnp.where(pad > 0, -1e9, scores)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, h] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def pallas_masked_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, key_padding_mask: jax.Array | None,
    interpret: bool = False,
) -> jax.Array:
    """q/k/v: (B, H, L, hd); key_padding_mask: (B, L) bool (True = pad).

    Returns (B, H, L, hd) attention output.
    """
    B, H, L, hd = q.shape
    scale = 1.0 / math.sqrt(hd)
    if key_padding_mask is None:
        mask = jnp.zeros((B, 1, L), jnp.int32)
    else:
        mask = key_padding_mask.astype(jnp.int32)[:, None, :]
    # one batch per program, heads looped in-kernel (see module docstring)
    grid = (B,)
    out = pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, H, L, hd), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H, L, hd), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, L, hd), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, L, hd), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, L, hd), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * H * L * L * hd,
            bytes_accessed=4 * H * L * hd * 4,
            transcendentals=H * L * L,
        ),
    )(q, k, v, mask)
    return out
