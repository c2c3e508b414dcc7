"""Flash attention with fused in-kernel dropout for the TRAINING path.

Why this exists (measured, v5e, b256 fusion train step, `scripts/
tpu_train_trace.py`): the XLA training attention materializes four
(B, H, L, L) tensor families in HBM — bf16 scores, probs, the u8 dropout
masks (545 MB of RNG bytes/step), and their backward counterparts — while
the actual MXU work is <1 ms (head_dim 16 underfills the 128-lane
contraction).  The trace attributes ~31 ms/step to attention fusions plus
~20 ms/step to `rng-bit-generator` and its layout copies.  This kernel
computes scores -> mask -> softmax -> dropout -> PV for one (batch, head)
pair entirely in VMEM, generating the dropout bits with the TPU-core PRNG
(`pltpu.prng_random_bits`) so the mask never exists in HBM; the backward
kernel RE-generates the identical bits (same per-(program, pair) seeding)
and recomputes the (L, L) intermediates, so no residual larger than q/k/v
is saved.  L <= 258 means a full (L, L) f32 tile fits VMEM — no online
softmax needed.

Dropout semantics match ``ops.dropout.FastDropout`` (drop iff u8 bits <
round(rate*256); inverted scale 256/(256-thresh) computed from the integer
threshold, exactly unbiased for the realized rate) — the mask *stream*
differs from the XLA path (TPU-core PRNG vs threefry/rbg), which is fine:
dropout is stochastic regularization, only the distribution is contractual.

Numerics: f32 scores/softmax in VMEM; probs cast to the I/O dtype (bf16 in
bf16 mode) for the PV matmul, matching the XLA path's bf16-probs einsum and
the serving kernel (`ops/attention.py`).  Backward matmul operands cast to
the I/O dtype with f32 accumulation (standard bf16 training numerics).

Testability: ``pltpu.prng_*`` has no CPU lowering, so the PRNG path only
runs on TPU.  ``flash_attention_with_bits`` takes a precomputed u8 bits
tensor instead — identical math, runs in interpreter mode — and is the CPU
test oracle; ``flash_attention_export_mask`` additionally outputs the
PRNG-generated keep mask so the on-chip check can replay it through the
injected-bits path and a pure-JAX oracle (see
``scripts/tpu_flash_attn_check.py``).

Reference behavior covered: torch ``nn.MultiheadAttention`` with
``dropout=p`` inside the reference's photometry encoders
(``HyraxBaselineCLS.py``; key-padding mask, 1/sqrt(hd) q-scaling).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _drop_consts(rate: float) -> tuple[int, float]:
    """(integer threshold, inverted keep scale) — FastDropout semantics."""
    thresh = int(round(float(rate) * 256.0))
    if thresh >= 256:
        raise ValueError("flash attention does not support rate ~= 1 (drop-all)")
    scale = 256.0 / (256 - thresh)
    return thresh, scale


def _keep_mask(bits_u32, thresh: int):
    """keep iff low byte >= thresh (drop prob = thresh/256)."""
    return (bits_u32 & jnp.uint32(0xFF)) >= jnp.uint32(thresh)


def _fwd_pair(q, k, v, neg, keep, drop_scale: float, out_dtype):
    """Attention forward for one (batch, head): f32 softmax math in VMEM.

    q: (L, hd) f32 ALREADY scaled by 1/sqrt(hd); k/v: (L, hd) refs' dtype;
    neg: (1, L) f32 additive key mask; keep: (L, L) bool or None.
    Returns (out (L, hd) out_dtype).

    The QK^T matmul runs with OPERANDS in the I/O dtype and f32
    accumulation: in bf16 mode that is the MXU's native bf16xbf16->f32
    path (an f32xf32 matmul runs at ~1/4 rate via multi-pass — measured
    4x self-time on the b256 train trace before this change); in f32 mode
    nothing changes, preserving the CPU oracle's exact semantics.
    """
    scores = jax.lax.dot_general(
        q.astype(k.dtype), k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + neg
    m = jnp.max(scores, axis=-1, keepdims=True)
    p_un = jnp.exp(scores - m)
    denom = jnp.sum(p_un, axis=-1, keepdims=True)
    if keep is not None:
        # dropout on normalized probs == dropout on p_un (elementwise mult
        # commutes with the per-row denom division)
        p_un = jnp.where(keep, p_un * jnp.float32(drop_scale), 0.0)
    pv = jax.lax.dot_general(
        p_un.astype(out_dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (pv / denom).astype(out_dtype)


def _bwd_pair(q_scaled, k, v, neg, keep, drop_scale: float, do, scale: float,
              io_dtype):
    """Gradients for one (batch, head) pair; recomputes the forward tile.

    Returns (dq, dk, dv) in io_dtype. q_scaled is q * 1/sqrt(hd) in f32.
    The scores recompute uses I/O-dtype operands with f32 accumulation —
    identical numerics to the forward's matmul (see _fwd_pair), which the
    bit-replay contract requires.
    """
    scores = jax.lax.dot_general(
        q_scaled.astype(k.dtype), k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + neg
    m = jnp.max(scores, axis=-1, keepdims=True)
    p_un = jnp.exp(scores - m)
    denom = jnp.sum(p_un, axis=-1, keepdims=True)
    p = p_un / denom  # normalized pre-dropout probs, f32
    if keep is not None:
        pd = jnp.where(keep, p * jnp.float32(drop_scale), 0.0)
    else:
        pd = p
    dof = do.astype(jnp.float32)
    # out = pd @ v  =>  dv = pd^T @ do ; dpd = do @ v^T
    dv = jax.lax.dot_general(
        pd.astype(io_dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dpd = jax.lax.dot_general(
        dof.astype(io_dtype), v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if keep is not None:
        dp = jnp.where(keep, dpd * jnp.float32(drop_scale), 0.0)
    else:
        dp = dpd
    # softmax backward: ds = p * (dp - rowsum(dp * p))
    t = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - t)
    dsc = ds.astype(io_dtype)
    # scores = scale * q @ k^T  (scale was folded into q_scaled)
    dq = jax.lax.dot_general(
        dsc, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) * jnp.float32(scale)
    dk = jax.lax.dot_general(
        dsc, (q_scaled / jnp.float32(scale)).astype(io_dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) * jnp.float32(scale)
    return dq.astype(io_dtype), dk.astype(io_dtype), dv.astype(io_dtype)


# --------------------------------------------------------------- kernels


def _seed_pair(seed_ref, i, n_pairs: int):
    # one seed stream per (grid program, in-kernel pair index); forward and
    # backward MUST call this identically so the regenerated bits match.
    # Mosaic caps prng_seed at 2 values, so (program, pair) folds into one.
    pltpu.prng_seed(seed_ref[0], pl.program_id(0) * n_pairs + i)


def _fwd_kernel_prng(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                     scale: float, thresh: int, drop_scale: float):
    G, H, L = q_ref.shape[0], q_ref.shape[1], q_ref.shape[2]

    def body(i, carry):
        g, h = i // H, i % H
        neg = jnp.where(mask_ref[g] > 0, _NEG, 0.0).astype(jnp.float32)
        _seed_pair(seed_ref, i, G * H)
        bits = pltpu.bitcast(pltpu.prng_random_bits((L, L)), jnp.uint32)
        keep = _keep_mask(bits, thresh)
        q = q_ref[g, h].astype(jnp.float32) * scale
        o_ref[g, h] = _fwd_pair(q, k_ref[g, h], v_ref[g, h], neg, keep,
                                drop_scale, o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, G * H, body, 0)


def _fwd_kernel_prng_export(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref,
                            keep_ref, *, scale: float, thresh: int,
                            drop_scale: float):
    G, H, L = q_ref.shape[0], q_ref.shape[1], q_ref.shape[2]

    def body(i, carry):
        g, h = i // H, i % H
        neg = jnp.where(mask_ref[g] > 0, _NEG, 0.0).astype(jnp.float32)
        _seed_pair(seed_ref, i, G * H)
        bits = pltpu.bitcast(pltpu.prng_random_bits((L, L)), jnp.uint32)
        keep = _keep_mask(bits, thresh)
        keep_ref[g, h] = keep.astype(jnp.uint8)
        q = q_ref[g, h].astype(jnp.float32) * scale
        o_ref[g, h] = _fwd_pair(q, k_ref[g, h], v_ref[g, h], neg, keep,
                                drop_scale, o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, G * H, body, 0)


def _bwd_kernel_prng(seed_ref, q_ref, k_ref, v_ref, mask_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, *, scale: float, thresh: int,
                     drop_scale: float):
    G, H, L = q_ref.shape[0], q_ref.shape[1], q_ref.shape[2]

    def body(i, carry):
        g, h = i // H, i % H
        neg = jnp.where(mask_ref[g] > 0, _NEG, 0.0).astype(jnp.float32)
        _seed_pair(seed_ref, i, G * H)
        bits = pltpu.bitcast(pltpu.prng_random_bits((L, L)), jnp.uint32)
        keep = _keep_mask(bits, thresh)
        q = q_ref[g, h].astype(jnp.float32) * scale
        dq, dk, dv = _bwd_pair(q, k_ref[g, h], v_ref[g, h], neg, keep,
                               drop_scale, do_ref[g, h], scale, dq_ref.dtype)
        dq_ref[g, h], dk_ref[g, h], dv_ref[g, h] = dq, dk, dv
        return carry

    jax.lax.fori_loop(0, G * H, body, 0)


def _fwd_kernel_bits(q_ref, k_ref, v_ref, mask_ref, bits_ref, o_ref, *,
                     scale: float, thresh: int, drop_scale: float):
    G, H = q_ref.shape[0], q_ref.shape[1]

    def body(i, carry):
        g, h = i // H, i % H
        neg = jnp.where(mask_ref[g] > 0, _NEG, 0.0).astype(jnp.float32)
        keep = bits_ref[g, h].astype(jnp.uint32) >= jnp.uint32(thresh)
        q = q_ref[g, h].astype(jnp.float32) * scale
        o_ref[g, h] = _fwd_pair(q, k_ref[g, h], v_ref[g, h], neg, keep,
                                drop_scale, o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, G * H, body, 0)


def _bwd_kernel_bits(q_ref, k_ref, v_ref, mask_ref, bits_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, *, scale: float, thresh: int,
                     drop_scale: float):
    G, H = q_ref.shape[0], q_ref.shape[1]

    def body(i, carry):
        g, h = i // H, i % H
        neg = jnp.where(mask_ref[g] > 0, _NEG, 0.0).astype(jnp.float32)
        keep = bits_ref[g, h].astype(jnp.uint32) >= jnp.uint32(thresh)
        q = q_ref[g, h].astype(jnp.float32) * scale
        dq, dk, dv = _bwd_pair(q, k_ref[g, h], v_ref[g, h], neg, keep,
                               drop_scale, do_ref[g, h], scale, dq_ref.dtype)
        dq_ref[g, h], dk_ref[g, h], dv_ref[g, h] = dq, dk, dv
        return carry

    jax.lax.fori_loop(0, G * H, body, 0)


# ----------------------------------------------------------- pallas_call


def _pick_g(B: int) -> int:
    for cand in (8, 4, 2):
        if B % cand == 0:
            return cand
    return 1


# index maps take (*grid_ids, *scalar_prefetch_refs) under
# PrefetchScalarGridSpec and just (*grid_ids,) under a plain grid — the
# trailing *_ absorbs the seed ref in the PRNG-path calls
def _qkv_spec(G, H, L, hd):
    return pl.BlockSpec((G, H, L, hd), lambda i, *_: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _mask_spec(G, L):
    return pl.BlockSpec((G, 1, L), lambda i, *_: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _bits_spec(G, H, L):
    return pl.BlockSpec((G, H, L, L), lambda i, *_: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _fwd_cost(B, H, L, hd):
    return pl.CostEstimate(
        flops=2 * 2 * B * H * L * L * hd,
        bytes_accessed=4 * B * H * L * hd * 2 + B * L * 4,
        transcendentals=B * H * L * L,
    )


def _bwd_cost(B, H, L, hd):
    # recompute fwd scores + 4 grad matmuls
    return pl.CostEstimate(
        flops=6 * 2 * B * H * L * L * hd,
        bytes_accessed=7 * B * H * L * hd * 2 + B * L * 4,
        transcendentals=B * H * L * L,
    )


def _norm_mask(key_padding_mask, B: int, L: int):
    if key_padding_mask is None:
        return jnp.zeros((B, 1, L), jnp.int32)
    return key_padding_mask.astype(jnp.int32).reshape(B, 1, L)


def _float0(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


# ------------------------------------------------ public API: PRNG path


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def flash_attention(q, k, v, mask_i32, seed, rate: float):
    """Fused attention + dropout, TPU-only (in-kernel PRNG).

    q/k/v: (B, H, L, hd); mask_i32: (B, 1, L) int32 (1 = padded key);
    seed: (1,) int32; rate: static drop probability in [0, 1).
    Use :func:`flash_attention_train` for the key_padding_mask-style API.
    """
    out, _ = _flash_fwd(q, k, v, mask_i32, seed, rate)
    return out


def _flash_fwd(q, k, v, mask_i32, seed, rate: float):
    B, H, L, hd = q.shape
    scale = 1.0 / math.sqrt(hd)
    thresh, drop_scale = _drop_consts(rate)
    if jax.device_count() > 1:  # mesh-capable path (SPMD rule below)
        out = _sharded_prng("fwd", scale, thresh, drop_scale)(
            q, k, v, mask_i32, seed)
    else:
        out = _prng_call(
            _fwd_kernel_prng, q, k, v, mask_i32, seed,
            out_shapes=jax.ShapeDtypeStruct((B, H, L, hd), q.dtype),
            scale=scale, thresh=thresh, drop_scale=drop_scale,
            cost=_fwd_cost(B, H, L, hd),
        )
    return out, (q, k, v, mask_i32, seed)


def _prng_call(kernel, q, k, v, mask_i32, seed, *, out_shapes, scale, thresh,
               drop_scale, cost, extra_inputs=()):
    """pallas_call wrapper for the PRNG kernels: seed rides in SMEM as a
    scalar-prefetch argument so every grid program sees the full (1,) array."""
    B, H, L, hd = q.shape
    G = _pick_g(B)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // G,),
        in_specs=[_qkv_spec(G, H, L, hd)] * 3 + [_mask_spec(G, L)]
        + [_qkv_spec(G, H, L, hd) for _ in extra_inputs],
        out_specs=jax.tree.map(
            lambda s: (_qkv_spec(G, H, L, hd) if s.shape[-1] == hd
                       else _bits_spec(G, H, L)),
            out_shapes,
            is_leaf=lambda s: isinstance(s, jax.ShapeDtypeStruct),
        ),
    )
    return pl.pallas_call(
        functools.partial(kernel, scale=scale, thresh=thresh,
                          drop_scale=drop_scale),
        out_shape=out_shapes,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=cost,
    )(seed, q, k, v, mask_i32, *extra_inputs)


# ------------------------------------------------- SPMD partitioning rule
#
# ``pallas_call`` carries no SPMD rule, so by itself the kernel would force
# a fully-replicated computation under a mesh (the reason round-3's first
# cut gated flash to ``device_count() == 1``).  The batch/head pairs are
# embarrassingly parallel, so a ``custom_partitioning`` wrapper declares the
# Shardy rule "batch dim is passthrough, everything else replicated": under
# ``pjit`` each device runs the kernel on its local batch shard and NO
# collective is inserted.  The per-shard seed is offset by the linearized
# index over the batch-sharding mesh axes so shards draw decorrelated
# dropout streams (same contract as the single-chip path: only the keep
# distribution is contractual, not the stream).  Engaged only when
# ``jax.device_count() > 1`` — the measured single-chip path is untouched.


def _offset_seed(seed, batch_spec, mesh):
    """seed + linearized shard index over the batch-sharding axes (wraps i32)."""
    if not batch_spec:
        return seed
    names = (batch_spec,) if isinstance(batch_spec, str) else tuple(batch_spec)
    idx = None
    for n in names:
        i = jax.lax.axis_index(n)
        idx = i if idx is None else idx * mesh.shape[n] + i
    return seed + idx.astype(jnp.int32) * jnp.int32(-1640531527)  # odd const


def _prng_invoke(kind: str, q, k, v, mask_i32, seed, extra, *, scale, thresh,
                 drop_scale):
    """Shape-derived dispatch to the fwd/bwd PRNG kernels (local shapes)."""
    B, H, L, hd = q.shape
    shp = jax.ShapeDtypeStruct((B, H, L, hd), q.dtype)
    if kind == "fwd":
        kernel, out_shapes, cost = _fwd_kernel_prng, shp, _fwd_cost(B, H, L, hd)
    else:
        kernel, out_shapes, cost = (_bwd_kernel_prng, (shp, shp, shp),
                                    _bwd_cost(B, H, L, hd))
    return _prng_call(kernel, q, k, v, mask_i32, seed, out_shapes=out_shapes,
                      scale=scale, thresh=thresh, drop_scale=drop_scale,
                      cost=cost, extra_inputs=extra)


_PRNG_RULE_IN = "b h l d, b h l d, b h l d, b m l, s"


@functools.lru_cache(maxsize=None)
def _sharded_prng(kind: str, scale: float, thresh: int, drop_scale: float):
    """custom_partitioning wrapper for the PRNG kernels (batch passthrough)."""

    @custom_partitioning
    def call(q, k, v, mask_i32, seed, *extra):
        return _prng_invoke(kind, q, k, v, mask_i32, seed, extra, scale=scale,
                            thresh=thresh, drop_scale=drop_scale)

    def infer(mesh, arg_shapes, shape):
        s = arg_shapes[0].sharding
        return s if kind == "fwd" else (s, s, s)

    def partition(mesh, arg_shapes, result_shape):
        arg_shardings = jax.tree.map(lambda a: a.sharding, tuple(arg_shapes))
        out_shardings = jax.tree.map(lambda r: r.sharding, result_shape)
        q_spec = arg_shardings[0].spec
        batch_spec = q_spec[0] if len(q_spec) else None

        def lower_fn(q, k, v, mask_i32, seed, *extra):
            seed = _offset_seed(seed, batch_spec, mesh)
            return _prng_invoke(kind, q, k, v, mask_i32, seed, extra,
                                scale=scale, thresh=thresh,
                                drop_scale=drop_scale)

        return mesh, lower_fn, out_shardings, arg_shardings

    rule_out = "b h l d" if kind == "fwd" else "b h l d, b h l d, b h l d"
    rule_in = _PRNG_RULE_IN + (", b h l d" if kind == "bwd" else "")
    call.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=f"{rule_in} -> {rule_out}",
        need_replication_factors=("h", "l", "d", "m", "s"),
    )
    return call


def _flash_bwd(rate: float, res, g_out):
    q, k, v, mask_i32, seed = res
    B, H, L, hd = q.shape
    scale = 1.0 / math.sqrt(hd)
    thresh, drop_scale = _drop_consts(rate)
    if jax.device_count() > 1:  # mesh-capable path (SPMD rule above)
        dq, dk, dv = _sharded_prng("bwd", scale, thresh, drop_scale)(
            q, k, v, mask_i32, seed, g_out)
    else:
        shp = jax.ShapeDtypeStruct((B, H, L, hd), q.dtype)
        dq, dk, dv = _prng_call(
            _bwd_kernel_prng, q, k, v, mask_i32, seed,
            out_shapes=(shp, shp, shp),
            scale=scale, thresh=thresh, drop_scale=drop_scale,
            cost=_bwd_cost(B, H, L, hd), extra_inputs=(g_out,),
        )
    return dq, dk, dv, _float0(mask_i32), _float0(seed)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_attention_export_mask(q, k, v, key_padding_mask, seed, rate: float):
    """Forward only; also returns the keep mask (u8) the PRNG generated —
    for on-chip validation against the injected-bits path."""
    B, H, L, hd = q.shape
    scale = 1.0 / math.sqrt(hd)
    thresh, drop_scale = _drop_consts(rate)
    mask_i32 = _norm_mask(key_padding_mask, B, L)
    out_shapes = (jax.ShapeDtypeStruct((B, H, L, hd), q.dtype),
                  jax.ShapeDtypeStruct((B, H, L, L), jnp.uint8))
    return _prng_call(
        _fwd_kernel_prng_export, q, k, v, mask_i32, seed,
        out_shapes=out_shapes, scale=scale, thresh=thresh,
        drop_scale=drop_scale, cost=_fwd_cost(B, H, L, hd),
    )


# --------------------------------------- public API: injected-bits path


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def flash_attention_with_bits(q, k, v, mask_i32, bits_u8, rate: float,
                              interpret: bool = False):
    """Same math with precomputed u8 bits (keep iff bits >= round(rate*256)).

    Runs in interpreter mode — the CPU test oracle for the PRNG path, and
    the replay target for masks exported by ``flash_attention_export_mask``
    (pass ``keep * 255`` as bits to reproduce a keep decision exactly).
    """
    out, _ = _bits_fwd(q, k, v, mask_i32, bits_u8, rate, interpret)
    return out


def _bits_call(kernel, q, k, v, mask_i32, bits_u8, *, out_shapes, scale,
               thresh, drop_scale, cost, interpret, extra_inputs=()):
    B, H, L, hd = q.shape
    G = _pick_g(B)
    return pl.pallas_call(
        functools.partial(kernel, scale=scale, thresh=thresh,
                          drop_scale=drop_scale),
        out_shape=out_shapes,
        grid=(B // G,),
        in_specs=[_qkv_spec(G, H, L, hd)] * 3 + [_mask_spec(G, L),
                                                 _bits_spec(G, H, L)]
        + [_qkv_spec(G, H, L, hd) for _ in extra_inputs],
        out_specs=jax.tree.map(
            lambda s: _qkv_spec(G, H, L, hd), out_shapes,
            is_leaf=lambda s: isinstance(s, jax.ShapeDtypeStruct),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=cost,
    )(q, k, v, mask_i32, bits_u8, *extra_inputs)


def _bits_invoke(kind: str, q, k, v, mask_i32, bits_u8, extra, *, scale,
                 thresh, drop_scale, interpret):
    """Shape-derived dispatch to the fwd/bwd bits kernels (local shapes)."""
    B, H, L, hd = q.shape
    shp = jax.ShapeDtypeStruct((B, H, L, hd), q.dtype)
    if kind == "fwd":
        kernel, out_shapes, cost = _fwd_kernel_bits, shp, _fwd_cost(B, H, L, hd)
    else:
        kernel, out_shapes, cost = (_bwd_kernel_bits, (shp, shp, shp),
                                    _bwd_cost(B, H, L, hd))
    return _bits_call(kernel, q, k, v, mask_i32, bits_u8,
                      out_shapes=out_shapes, scale=scale, thresh=thresh,
                      drop_scale=drop_scale, cost=cost, interpret=interpret,
                      extra_inputs=extra)


_BITS_RULE_IN = "b h l d, b h l d, b h l d, b m l, b h l e"


@functools.lru_cache(maxsize=None)
def _sharded_bits(kind: str, scale: float, thresh: int, drop_scale: float,
                  interpret: bool):
    """custom_partitioning wrapper for the injected-bits kernels.

    Same Shardy rule as :func:`_sharded_prng` (batch passthrough, everything
    else replicated); the bits tensor shards with the batch.  No seed to
    offset — the caller supplies the full bits tensor, which pjit slices.
    This is the CPU-mesh test proxy for the PRNG path's partitioning rule
    (``tests/test_flash_attention.py``).
    """

    @custom_partitioning
    def call(q, k, v, mask_i32, bits_u8, *extra):
        return _bits_invoke(kind, q, k, v, mask_i32, bits_u8, extra,
                            scale=scale, thresh=thresh,
                            drop_scale=drop_scale, interpret=interpret)

    def infer(mesh, arg_shapes, shape):
        s = arg_shapes[0].sharding
        return s if kind == "fwd" else (s, s, s)

    def partition(mesh, arg_shapes, result_shape):
        arg_shardings = jax.tree.map(lambda a: a.sharding, tuple(arg_shapes))
        out_shardings = jax.tree.map(lambda r: r.sharding, result_shape)

        def lower_fn(q, k, v, mask_i32, bits_u8, *extra):
            return _bits_invoke(kind, q, k, v, mask_i32, bits_u8, extra,
                                scale=scale, thresh=thresh,
                                drop_scale=drop_scale, interpret=interpret)

        return mesh, lower_fn, out_shardings, arg_shardings

    rule_out = "b h l d" if kind == "fwd" else "b h l d, b h l d, b h l d"
    rule_in = _BITS_RULE_IN + (", b h l d" if kind == "bwd" else "")
    call.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=f"{rule_in} -> {rule_out}",
        need_replication_factors=("h", "l", "d", "m", "e"),
    )
    return call


def _bits_fwd(q, k, v, mask_i32, bits_u8, rate: float, interpret: bool):
    B, H, L, hd = q.shape
    scale = 1.0 / math.sqrt(hd)
    thresh, drop_scale = _drop_consts(rate)
    if jax.device_count() > 1:  # mesh-capable path (SPMD rule above)
        out = _sharded_bits("fwd", scale, thresh, drop_scale, interpret)(
            q, k, v, mask_i32, bits_u8)
    else:
        out = _bits_call(
            _fwd_kernel_bits, q, k, v, mask_i32, bits_u8,
            out_shapes=jax.ShapeDtypeStruct((B, H, L, hd), q.dtype),
            scale=scale, thresh=thresh, drop_scale=drop_scale,
            cost=_fwd_cost(B, H, L, hd), interpret=interpret,
        )
    return out, (q, k, v, mask_i32, bits_u8)


def _bits_bwd(rate: float, interpret: bool, res, g_out):
    q, k, v, mask_i32, bits_u8 = res
    B, H, L, hd = q.shape
    scale = 1.0 / math.sqrt(hd)
    thresh, drop_scale = _drop_consts(rate)
    if jax.device_count() > 1:  # mesh-capable path (SPMD rule above)
        dq, dk, dv = _sharded_bits("bwd", scale, thresh, drop_scale,
                                   interpret)(q, k, v, mask_i32, bits_u8,
                                              g_out)
    else:
        shp = jax.ShapeDtypeStruct((B, H, L, hd), q.dtype)
        dq, dk, dv = _bits_call(
            _bwd_kernel_bits, q, k, v, mask_i32, bits_u8,
            out_shapes=(shp, shp, shp),
            scale=scale, thresh=thresh, drop_scale=drop_scale,
            cost=_bwd_cost(B, H, L, hd), interpret=interpret,
            extra_inputs=(g_out,),
        )
    return dq, dk, dv, _float0(mask_i32), _float0(bits_u8)


flash_attention_with_bits.defvjp(_bits_fwd, _bits_bwd)


# ------------------------------------------------------- model-facing API


def flash_attention_train(q, k, v, key_padding_mask, seed, rate: float):
    """(B, H, L, hd) attention with fused dropout; key_padding_mask is the
    (B, L) bool convention (True = padded) used by the model layers."""
    B, H, L, hd = q.shape
    mask_i32 = _norm_mask(key_padding_mask, B, L)
    return flash_attention(q, k, v, mask_i32, seed, rate)
