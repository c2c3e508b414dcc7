"""Break down the compact-spectra block's cost inside FusedSpectraStream.

At the realistic 10%-spectra mix the fused pipeline's delta over the
spectrum-free pipeline is the whole remaining serving cost (batch 1024:
94.6 ms vs 54.7 ms measured, tpu_results/spectrum_frac_bs1024_r3.jsonl).
This probe times the block's three stages in isolation at the bucketed
frac-0.1 shape (S+1 = 129 rows):

  (a) resample_spectrum vmap (interp-fill + MAD normalize), (129, 512) -> 3481
  (b) _mad_normalize alone on a (129, 3481) resampled block
  (c) SpectraNet forward alone at batch 129 (bf16)

Relay rules: materialize-to-sync, numerics fetched before timing, no
state chaining. One JSON line per stage.
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
from __graft_entry__ import _fusion_task  # noqa: E402
from applecider_tpu.infer.stream import _mad_normalize, resample_spectrum  # noqa: E402


def timeit(fn, args, iters=24):
    _block(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _block(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    dev = jax.devices()[0]
    S = int(os.environ.get("PROBE_S", "129"))  # frac-0.1 bucket at B=1024
    W, G = 512, 3481
    rng = np.random.default_rng(0)

    # ascending-prefix packed spectra rows (the assume_sorted contract)
    wl = np.sort(rng.uniform(3000.0, 11000.0, size=(S, W)).astype(np.float32), axis=1)
    fx = rng.normal(size=(S, W)).astype(np.float32)
    vd = np.ones((S, W), bool)
    grid = np.linspace(3500.0, 10500.0, G).astype(np.float32)
    wl_d, fx_d, vd_d = (jax.device_put(a, dev) for a in (wl, fx, vd))

    # grid must be closed over as a CONSTANT: passed as a jit operand it
    # becomes a Tracer and resample_spectrum falls back to the slow
    # sort/searchsorted reference path (first run of this probe measured
    # that path at 88.8 ms and mislabeled it as the production cost)
    res = jax.jit(jax.vmap(
        lambda w, f, v: resample_spectrum(w, f, v, grid, assume_sorted=True)))
    dt = timeit(lambda: res(wl_d, fx_d, vd_d), (), iters=24)
    print(json.dumps({"stage": "resample+mad", "rows": S,
                      "ms": round(dt * 1e3, 2), "device": str(dev)}), flush=True)

    blk = jax.device_put(rng.normal(size=(S, G)).astype(np.float32), dev)
    mad = jax.jit(jax.vmap(_mad_normalize))
    dt = timeit(lambda: mad(blk), (), iters=24)
    print(json.dumps({"stage": "mad_only", "rows": S,
                      "ms": round(dt * 1e3, 2)}), flush=True)

    task = _fusion_task(tiny=False, compute_dtype="bfloat16")
    spec = rng.normal(size=(S, G)).astype(np.float32)
    variables = task.init(jax.random.PRNGKey(0), None) if False else None
    # init via the module path used by the bench
    from __graft_entry__ import _fusion_batch
    varis = task.module.init(jax.random.PRNGKey(0), *_fusion_batch(2)[:5],
                             deterministic=True)
    params = varis["params"]
    enc = task.module.bind({"params": params}).spectra_encoder
    spec_d = jax.device_put(spec, dev)

    def spectranet(x):
        return task.module.apply(
            {"params": params}, x, deterministic=True,
            method=lambda m, s, deterministic: m.spectra_encoder(
                s, deterministic=deterministic),
        )

    sfn = jax.jit(spectranet)
    dt = timeit(lambda: sfn(spec_d), (), iters=24)
    print(json.dumps({"stage": "spectranet_fwd", "rows": S,
                      "ms": round(dt * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
