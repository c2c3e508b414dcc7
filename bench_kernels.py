"""Kernel A/B microbenchmarks: XLA vs Pallas attention, FFT vs direct conv.

Evidence harness for the two performance claims in this framework:

* ``applecider_tpu.ops.attention.pallas_masked_attention`` (fused VMEM
  attention) vs the unfused XLA einsum path, at the BaselineCLS shape
  (B, 8 heads, 258 tokens, 16 head dim);
* ``applecider_tpu.ops.conv1d`` FFT path vs direct ``lax.conv`` at each
  SpectraNet stage shape (kernels 1021/251/61/31/13).

Prints one JSON line per comparison. Run on the real chip to decide which
implementation each config should default to; numbers land in
docs/KERNEL_NOTES.md.
"""

from __future__ import annotations

import json
import time

import numpy as np

SPECTRA_STAGES = [
    # (L, Cin, Cout, K) mirrors SpectraNetModule defaults on a 3481-bin input
    (3481, 1, 64, 1021),
    (3481, 1, 64, 61),
    (870, 192, 128, 251),
    (217, 384, 256, 61),
    (54, 768, 512, 31),
    (13, 1536, 1024, 13),
]


def _time(fn, *args, iters=30):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_attention(batch=256, heads=8, seq=258, head_dim=16, dtype="bfloat16"):
    import jax
    import jax.numpy as jnp

    from applecider_tpu.ops.attention import pallas_masked_attention

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    rng = np.random.default_rng(0)
    shape = (batch, heads, seq, head_dim)
    q, k, v = (jnp.asarray(rng.normal(size=shape), dtype=dtype) for _ in range(3))
    mask = jnp.asarray(np.arange(seq)[None] >= 180).repeat(batch, 0)

    import math

    @jax.jit
    def xla_attn(q, k, v, mask):
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(q.shape[-1])
        scores = jnp.where(mask[:, None, None, :], -1e9, scores)
        attn = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", attn, v)

    pallas_fn = jax.jit(
        lambda q, k, v, m: pallas_masked_attention(q, k, v, m, interpret=not on_tpu)
    )

    t_xla = _time(xla_attn, q, k, v, mask)
    t_pal = _time(pallas_fn, q, k, v, mask) if on_tpu else None
    err = None
    if on_tpu:
        a = np.asarray(xla_attn(q, k, v, mask), np.float32)
        b = np.asarray(pallas_fn(q, k, v, mask), np.float32)
        err = float(np.max(np.abs(a - b)))
    print(json.dumps({
        "bench": "attention", "shape": list(shape),
        "xla_us": round(t_xla * 1e6, 1),
        "pallas_us": round(t_pal * 1e6, 1) if t_pal else None,
        "speedup": round(t_xla / t_pal, 2) if t_pal else None,
        "max_abs_err": err,
        "device": str(jax.devices()[0]),
    }))


def bench_conv(batch=64, dtype="bfloat16"):
    import jax
    import jax.numpy as jnp

    from applecider_tpu.ops.conv1d import conv1d_direct, conv1d_fft

    rng = np.random.default_rng(0)
    for L, cin, cout, K in SPECTRA_STAGES:
        x = jnp.asarray(rng.normal(size=(batch, L, cin)), dtype=dtype)
        w = jnp.asarray(rng.normal(size=(K, cin, cout)) / np.sqrt(cin * K), jnp.float32)
        direct = jax.jit(lambda x, w: conv1d_direct(x, w))
        fftc = jax.jit(lambda x, w: conv1d_fft(x, w))
        t_d = _time(direct, x, w, iters=10)
        t_f = _time(fftc, x, w, iters=10)
        a = np.asarray(direct(x, w), np.float32)
        b = np.asarray(fftc(x, w), np.float32)
        denom = max(float(np.abs(a).max()), 1e-6)
        print(json.dumps({
            "bench": "conv1d", "L": L, "cin": cin, "cout": cout, "K": K,
            "direct_us": round(t_d * 1e6, 1), "fft_us": round(t_f * 1e6, 1),
            "fft_speedup": round(t_d / t_f, 2),
            "rel_err": round(float(np.max(np.abs(a - b))) / denom, 8),
            "device": str(jax.devices()[0]),
        }))


if __name__ == "__main__":
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    bench_attention()
    bench_conv()
