"""Flash attention (fused train-path attention+dropout) vs pure-JAX oracle.

The TPU-core PRNG path cannot run on CPU, so these tests drive the
injected-bits variant (`flash_attention_with_bits`, interpret mode) — the
math is identical to the PRNG kernels, only the source of the u8 bits
differs.  The on-chip validation of the PRNG path itself (export mask →
replay through this path and the oracle) lives in
`scripts/tpu_flash_attn_check.py`.

Reference behavior: torch nn.MultiheadAttention(dropout=p) in the
reference's photometry encoders (HyraxBaselineCLS.py) — key-padding mask,
1/sqrt(hd) scaling, dropout applied to the softmax probabilities.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from applecider_tpu.ops.flash_attention import (
    _drop_consts,
    flash_attention_with_bits,
)


def _oracle(q, k, v, pad_mask, bits_u8, rate):
    """Pure-JAX replica of the kernel semantics (additive -1e9 key mask,
    FastDropout integer-threshold keep rule, inverted scale)."""
    hd = q.shape[-1]
    thresh, drop_scale = _drop_consts(rate)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk",
        q.astype(jnp.float32),
        k.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) / math.sqrt(hd)
    neg = jnp.where(pad_mask[:, None, None, :], -1e9, 0.0).astype(jnp.float32)
    scores = scores + neg
    p = jax.nn.softmax(scores, axis=-1)
    keep = bits_u8.astype(jnp.uint32) >= jnp.uint32(thresh)
    pd = jnp.where(keep, p * jnp.float32(drop_scale), 0.0)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", pd, v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def _inputs(rng, B=2, H=4, L=24, hd=16, rate=0.25):
    q = jnp.asarray(rng.normal(size=(B, H, L, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, L, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, L, hd)).astype(np.float32))
    lengths = rng.integers(L // 2, L + 1, size=B)
    pad = jnp.asarray(np.arange(L)[None, :] >= lengths[:, None])
    bits = jnp.asarray(rng.integers(0, 256, size=(B, H, L, L), dtype=np.uint8))
    mask_i32 = pad.astype(jnp.int32).reshape(B, 1, L)
    return q, k, v, pad, mask_i32, bits, rate


def test_flash_bits_forward_matches_oracle(rng):
    q, k, v, pad, mask_i32, bits, rate = _inputs(rng)
    ref = _oracle(q, k, v, pad, bits, rate)
    out = flash_attention_with_bits(q, k, v, mask_i32, bits, rate, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_flash_bits_forward_rate_zero(rng):
    """rate=0 == plain masked attention (keep-all, scale 1)."""
    q, k, v, pad, mask_i32, bits, _ = _inputs(rng, rate=0.0)
    ref = _oracle(q, k, v, pad, bits, 0.0)
    out = flash_attention_with_bits(q, k, v, mask_i32, bits, 0.0, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # and it really is the no-dropout softmax@V
    plain = _oracle(q, k, v, pad, jnp.full_like(bits, 255), 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(plain), atol=1e-5)


def test_flash_bits_gradients_match_oracle(rng):
    """The hand-written recompute backward == autodiff through the oracle."""
    q, k, v, pad, mask_i32, bits, rate = _inputs(rng, B=2, H=2, L=16, hd=8)
    tgt = jnp.asarray(rng.normal(size=q.shape).astype(np.float32))

    def loss_kernel(q, k, v):
        out = flash_attention_with_bits(q, k, v, mask_i32, bits, rate, True)
        return jnp.sum((out - tgt) ** 2)

    def loss_oracle(q, k, v):
        return jnp.sum((_oracle(q, k, v, pad, bits, rate) - tgt) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gk, go, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4,
            err_msg=f"d{name} mismatch",
        )


def test_flash_bits_dropout_unbiased(rng):
    """E[dropout(attn)] == attn when averaged over the bits distribution —
    checks the integer-threshold inverted scale is exactly unbiased.

    The n independent bit draws ride the batch axis of ONE kernel call
    (identical q/k/v per row) — one trace instead of n interpret-mode
    retraces."""
    q, k, v, pad, mask_i32, _, _ = _inputs(rng, B=1, H=1, L=8, hd=4)
    rate = 0.25  # thresh 64, scale 256/192
    plain = _oracle(q, k, v, pad, jnp.full((1, 1, 8, 8), 255, jnp.uint8), 0.0)
    n = 400
    bit_rng = np.random.default_rng(7)
    bits = jnp.asarray(bit_rng.integers(0, 256, size=(n, 1, 8, 8), dtype=np.uint8))
    qn, kn, vn = (jnp.broadcast_to(t, (n, 1, 8, 4)) for t in (q, k, v))
    mask_n = jnp.broadcast_to(mask_i32, (n, 1, 8))
    out = flash_attention_with_bits(qn, kn, vn, mask_n, bits, rate, True)
    mean = np.asarray(out).astype(np.float64).mean(axis=0, keepdims=True)
    np.testing.assert_allclose(mean, np.asarray(plain), atol=0.15)


def test_flash_bits_under_mesh_matches_unsharded(rng):
    """The Shardy custom_partitioning rule: batch-sharded pjit execution ==
    the unsharded call, forward and grads (the CPU-mesh proxy for the PRNG
    path's rule — same partition logic, bits instead of in-kernel PRNG)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    q, k, v, pad, mask_i32, bits, rate = _inputs(rng, B=8, H=2, L=16, hd=8)
    ref = flash_attention_with_bits(q, k, v, mask_i32, bits, rate, True)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    shard4 = NamedSharding(mesh, P("data", None, None, None))
    shard3 = NamedSharding(mesh, P("data", None, None))
    qs, ks, vs = (jax.device_put(t, shard4) for t in (q, k, v))
    ms = jax.device_put(mask_i32, shard3)
    bs = jax.device_put(bits, shard4)
    f = jax.jit(lambda a, b, c, m, u: flash_attention_with_bits(
        a, b, c, m, u, rate, True))
    out = f(qs, ks, vs, ms, bs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def loss(q, k, v, m, u):
        return jnp.sum(flash_attention_with_bits(q, k, v, m, u, rate, True) ** 2)

    g_mesh = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qs, ks, vs, ms, bs)
    g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, mask_i32, bits)
    for a, b, name in zip(g_mesh, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-5,
            err_msg=f"mesh d{name} mismatch",
        )


def test_flash_seed_offset_linearizes_shards():
    """_offset_seed: replicated spec is a no-op; the sharded variant is
    exercised end-to-end by the mesh test above and on chip by
    scripts/tpu_flash_attn_check.py (single-device mesh smoke)."""
    from applecider_tpu.ops.flash_attention import _offset_seed

    seed = jnp.asarray([1234], jnp.int32)
    assert _offset_seed(seed, None, None) is seed
    assert _offset_seed(seed, (), None) is seed


def test_flash_eval_falls_through_to_xla(rng):
    """impl='flash' in the layer is train-only: deterministic calls produce
    the exact XLA-path output (flash never engages without dropout RNG)."""
    from applecider_tpu.models.layers import MultiHeadSelfAttention

    x = jnp.asarray(rng.normal(size=(2, 20, 32)).astype(np.float32))
    mask = jnp.zeros((2, 20), bool)
    m_xla = MultiHeadSelfAttention(4, 0.1, dtype=jnp.float32)
    params = m_xla.init(jax.random.PRNGKey(0), x, mask)["params"]
    ref = m_xla.apply({"params": params}, x, mask, deterministic=True)
    m_fl = MultiHeadSelfAttention(4, 0.1, dtype=jnp.float32, impl="flash")
    out = m_fl.apply({"params": params}, x, mask, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_flash_bits_bf16_matches_f32_oracle(rng):
    """bf16-mode kernel vs the f32 oracle, fwd AND grads (ADVICE r4).

    The kernel's QK^T casts the f32-scaled q to the I/O dtype so bf16 mode
    rides the MXU's native bf16xbf16->f32 path — a real numerics change vs
    f32 operands. This pins the bf16 accuracy envelope so future kernel
    edits can't silently degrade it: bf16 has an 8-bit mantissa, so per-op
    relative error ~2^-8 and a few e-2 absolute after the L-length sums.
    """
    q, k, v, pad, mask_i32, bits, rate = _inputs(rng, B=2, H=2, L=16, hd=8)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    ref = _oracle(q, k, v, pad, bits, rate)

    out = flash_attention_with_bits(qb, kb, vb, mask_i32, bits, rate, True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=4e-2, rtol=4e-2)

    tgt = jnp.asarray(rng.normal(size=q.shape).astype(np.float32))

    def loss_kernel(q, k, v):
        out = flash_attention_with_bits(q, k, v, mask_i32, bits, rate, True)
        return jnp.sum((out.astype(jnp.float32) - tgt) ** 2)

    def loss_oracle(q, k, v):
        return jnp.sum((_oracle(q, k, v, pad, bits, rate) - tgt) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(qb, kb, vb)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gk, go, "qkv"):
        a = np.asarray(a, np.float32)
        b = np.asarray(b)
        # grads sum over L and square the bf16 rounding; scale-relative bound
        denom = max(float(np.abs(b).max()), 1e-6)
        assert np.max(np.abs(a - b)) / denom < 8e-2, f"d{name} mismatch"
