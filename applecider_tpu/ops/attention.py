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
    G, H = q_ref.shape[0], q_ref.shape[1]

    # fori_loop (not a static unroll) over the G*H (batch, head) pairs: a
    # full unroll keeps every iteration's (L, L) f32 intermediates live on
    # the Mosaic stack simultaneously — G=8 measured 25 MB of scoped VMEM
    # against the 16 MB limit (compile-time OOM). The loop body's buffers
    # are reused across iterations.
    def body(i, carry):
        g, h = i // H, i % H
        # additive mask row: 0 live / -1e9 padded — an add instead of an
        # (L, L) select per head
        neg = jnp.where(mask_ref[g] > 0, -1e9, 0.0).astype(jnp.float32)  # (1, L)
        # fold the 1/sqrt(hd) scale into q: (L, hd) mult instead of (L, L)
        q = q_ref[g, h].astype(jnp.float32) * scale
        k = k_ref[g, h].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) + neg  # (L, L)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        # unnormalized PV + per-row rescale of the (L, hd) output: divides
        # L*hd elements instead of L*L. p feeds the MXU in the output dtype
        # (bf16 in serving — matches the XLA path, which also casts probs
        # to the compute dtype before the PV einsum).
        denom = jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(o_ref.dtype), v_ref[g, h],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        o_ref[g, h] = (pv / denom).astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, G * H, body, 0)


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
    # G batches per program, heads looped in-kernel: at B=1024 a G=1 grid
    # paid ~6 us launch/DMA overhead x 1024 programs (~6 ms) before any
    # math; G=8 amortizes it 8x while q/k/v/o for 8 batches (~1.6 MB at
    # L=194) still fit VMEM comfortably
    G = 1
    for cand in (8, 4, 2):
        if B % cand == 0:
            G = cand
            break
    grid = (B // G,)
    out = pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, H, L, hd), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, H, L, hd), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, H, L, hd), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, H, L, hd), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, H, L, hd), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # the default 16 MB scoped-VMEM cap rejects the G=8 blocks at
            # B=1024 (measured: "scoped allocation 25.00M"); v5e has 128 MB
            # physical VMEM — 64 MB leaves room for double-buffered DMA
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        # CostEstimate describes the WHOLE op (all B//G grid programs),
        # not one program — understating it by B/G skews XLA's scheduling
        # around the hot op; q/k/v/out are bf16 (2 bytes), mask is bool
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * L * L * hd,
            bytes_accessed=4 * B * H * L * hd * 2 + B * L,
            transcendentals=B * H * L * L,
        ),
    )(q, k, v, mask)
    return out
