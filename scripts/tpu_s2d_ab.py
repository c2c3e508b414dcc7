"""On-chip validation + A/B for the s2d (polyphase) stage-0 conv route.

Gate history demands numerics-first: conv1d_s2d at block=8 was an XLA TPU
miscompile at batch >= ~64 (docs/KERNEL_NOTES.md); block=32 was verified
clean at batch 256. This probe (a) oracles block=32 against conv1d_direct
ON DEVICE at every serving-relevant batch (reductions computed on device —
fetching full (B, 3481, 64) outputs would ship ~1 GB over the ~40 MB/s
relay), plus a host-f64 oracle on fetched tail slices at B=64 (the block=8
bug corrupted the LAST output blocks); (b) times direct vs s2d at the
stage-0 shape; (c) A/Bs the fused serving pipeline with the auto-route
off (ACS2D=0) vs on (default on TPU).

Measurement rules (docs/KERNEL_NOTES.md): numerics fetched BEFORE any
timing; sync by materializing one element of the last dispatched program.
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import deque

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

from applecider_tpu.ops.conv1d import conv1d_direct, conv1d_s2d  # noqa: E402


def sync(y):
    return float(np.asarray(y[(0,) * y.ndim]))


def timeit(fn, *args, iters=10):
    y = fn(*args)
    sync(y)  # warm + drain
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    sync(y)
    return (time.perf_counter() - t0) / iters


def host_direct_f64(x, w):
    """np f64 'same' cross-correlation oracle, x (L, 1), w (K, 1, C)."""
    L, K, C = x.shape[0], w.shape[0], w.shape[2]
    xp = np.zeros(L + K - 1, np.float64)
    xp[K // 2: K // 2 + L] = x[:, 0].astype(np.float64)
    out = np.empty((L, C), np.float64)
    for c in range(C):
        # cross-correlation = convolve with reversed kernel
        out[:, c] = np.convolve(xp, w[::-1, 0, c].astype(np.float64), "valid")
    return out


def main() -> None:
    dev = jax.devices()[0]
    print(json.dumps({"probe": "s2d_ab", "device": str(dev)}), flush=True)
    rng = np.random.default_rng(0)
    L, K, cout = 3481, 1021, 64
    w = jnp.asarray(rng.normal(size=(K, 1, cout)) / np.sqrt(K), jnp.float32)

    direct = jax.jit(lambda x, w: conv1d_direct(x, w))
    s2d = jax.jit(lambda x, w: conv1d_s2d(x, w, block=32))
    # on-device comparison: scalars only cross the relay
    comp = jax.jit(lambda x, w: (
        jnp.max(jnp.abs(conv1d_s2d(x, w, block=32).astype(jnp.float32)
                        - conv1d_direct(x, w).astype(jnp.float32))),
        jnp.max(jnp.abs(conv1d_direct(x, w).astype(jnp.float32))),
    ))

    # ---- numerics sweep (before ANY timing)
    for B in (8, 64, 129, 256, 308, 1024):
        for dtype in ("bfloat16", "float32") if B in (64, 1024) else ("bfloat16",):
            x = jnp.asarray(rng.normal(size=(B, L, 1)), dtype=dtype)
            dmax, amax = comp(x, w)
            rel = float(np.asarray(dmax)) / max(float(np.asarray(amax)), 1e-9)
            print(json.dumps({"check": "s2d_vs_direct_on_device", "batch": B,
                              "dtype": dtype, "rel_err": round(rel, 8)}), flush=True)

    # ---- host-f64 tail oracle at B=64 (block=8's failure corrupted the
    # LAST output blocks; fetch only 2 rows x tail x 4 channels, ~100 KB)
    B = 64
    x = jnp.asarray(rng.normal(size=(B, L, 1)), jnp.float32)
    xs_np = np.asarray(x)
    tail = 2200
    for name, fn in (("direct", direct), ("s2d", s2d)):
        y = fn(x, w)
        got = np.asarray(y[[0, B - 1], -tail:, :4], np.float64)
        for ri, r in enumerate((0, B - 1)):
            want = host_direct_f64(xs_np[r], np.asarray(w))[-tail:, :4]
            denom = max(np.abs(want).max(), 1e-9)
            rel = float(np.abs(got[ri] - want).max() / denom)
            print(json.dumps({"check": f"{name}_vs_host_f64_tail", "row": int(r),
                              "rel_err": round(rel, 8)}), flush=True)

    # ---- timing at stage-0 serving shapes
    for B in (129, 308, 1024):
        x = jnp.asarray(rng.normal(size=(B, L, 1)), jnp.bfloat16)
        t_d = timeit(direct, x, w)
        t_s = timeit(s2d, x, w)
        print(json.dumps({"bench": "stage0_conv", "batch": B,
                          "direct_ms": round(t_d * 1e3, 2),
                          "s2d_ms": round(t_s * 1e3, 2),
                          "s2d_speedup": round(t_d / t_s, 2)}), flush=True)

    # ---- fused serving A/B: auto-route off vs on
    from bench import BUCKETS, make_stream_samples
    from __graft_entry__ import _fusion_batch, _fusion_task
    from applecider_tpu.infer.stream import FusedSpectraStream

    task = _fusion_task(tiny=False, compute_dtype="bfloat16")
    try:
        from ml_dtypes import bfloat16 as img_dtype
    except ImportError:
        img_dtype = np.float32
    variables = task.module.init(jax.random.PRNGKey(0), *_fusion_batch(2)[:5],
                                 deterministic=True)
    params = variables["params"]

    bs, n_sets, iters, depth = 1024, 4, 24, 3
    for frac in (0.1, 0.3):
        sets = [make_stream_samples(bs, seed=40 + j, spectrum_frac=frac)
                for j in range(n_sets)]
        rates = {}
        outs = {}
        for mode, env in (("direct", "0"), ("s2d", None)):
            os.environ.pop("ACS2D", None)
            if env is not None:
                os.environ["ACS2D"] = env
            router = FusedSpectraStream(task)
            placed = [router.place(s, length_buckets=BUCKETS, image_dtype=img_dtype)
                      for s in sets]
            outs[mode] = np.asarray(router.run_placed(params, placed[0])())
            for p in placed[1:]:
                router.run_placed(params, p)()
            pend: deque = deque()
            t0 = time.perf_counter()
            for i in range(iters):
                pend.append(router.run_placed(params, placed[i % n_sets]))
                if len(pend) > depth:
                    pend.popleft()()
            while pend:
                pend.popleft()()
            rates[mode] = bs * iters / (time.perf_counter() - t0)
        dmax = float(np.abs(outs["direct"] - outs["s2d"]).max())
        print(json.dumps({
            "bench": "fused_serving", "spectrum_frac": frac, "batch": bs,
            "direct_alerts_per_sec": round(rates["direct"], 1),
            "s2d_alerts_per_sec": round(rates["s2d"], 1),
            "speedup": round(rates["s2d"] / rates["direct"], 3),
            "probs_max_abs_diff": round(dmax, 8),
        }), flush=True)


if __name__ == "__main__":
    main()
