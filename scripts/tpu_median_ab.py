"""A/B exact-median implementations for the spectra MAD normalize on TPU.

The compact-spectra block's MAD normalize measures 26 ms at (129, 3481) —
bigger than the whole SpectraNet forward on the same block (15 ms). Each
variant computes the SAME quantity (exact median of each 3481-length row,
even-n = mean of central pair); numerics are cross-checked against
jnp.median BEFORE timing (relay rule), then timed materialization-synced.

Variants:
  hist128x4   current: histogram rank selection, bins=128, passes=4
  hist32x6    narrower histogram, more passes (less HBM/pass, same depth^)
  hist256x3   wider histogram, fewer passes
  sort        jnp.sort the block once, gather the central pair
  median      jnp.median (XLA's own lowering)
  topk        lax.top_k to rank n//2+1, take the min of the kept set
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

from bench import _block  # noqa: E402
from applecider_tpu.infer.stream import _median_no_sort  # noqa: E402


def med_sort(x):
    n = x.shape[-1]
    s = jnp.sort(x, axis=-1)
    return 0.5 * (s[..., (n - 1) // 2] + s[..., n // 2])


def med_xla(x):
    return jnp.median(x, axis=-1)


def med_topk(x):
    n = x.shape[-1]
    k = n // 2 + 1  # keep the top half + 1; its two smallest are the central pair
    top, _ = jax.lax.top_k(x, k)
    return 0.5 * (top[..., -1] + top[..., -2]) if n % 2 == 0 else top[..., -1]


def timeit(fn, x, iters=24):
    _block(fn(x))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(x)
    _block(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    dev = jax.devices()[0]
    S = int(os.environ.get("PROBE_S", "129"))
    G = 3481
    rng = np.random.default_rng(0)
    x = rng.normal(size=(S, G)).astype(np.float32) * 100.0
    x[0, 7] = 1e30  # outlier row: exactness stressor
    xd = jax.device_put(x, dev)
    ref = np.median(x, axis=-1)

    variants = {
        "hist128x4": jax.jit(jax.vmap(_median_no_sort)),
        "hist32x6": jax.jit(jax.vmap(partial(_median_no_sort, passes=6, bins=32))),
        "hist256x3": jax.jit(jax.vmap(partial(_median_no_sort, passes=3, bins=256))),
        "sort": jax.jit(med_sort),
        "median": jax.jit(med_xla),
        "topk": jax.jit(med_topk),
    }
    only = sys.argv[1:]
    for name, fn in variants.items():
        if only and name not in only:
            continue
        got = np.asarray(fn(xd))  # numerics FIRST (relay rule)
        err = float(np.max(np.abs(got - ref)))
        dt = timeit(fn, xd)
        print(json.dumps({"variant": name, "rows": S, "ms": round(dt * 1e3, 3),
                          "max_abs_err": err, "device": str(dev)}), flush=True)


if __name__ == "__main__":
    main()
