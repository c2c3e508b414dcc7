"""Per-submodule forward timing on TPU: photometry transformer vs SpectraNet
vs AstroMiNN vs fusion head. Each jitted separately, blocked per iter.

Run: python -u scripts/tpu_forward_breakdown.py [batch] (background, no kill).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timed(fn, *args, iters=8):
    import jax

    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def flops_of(fn, *args):
    import jax

    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    dev = jax.devices()[0]
    emit(stage="device", device=str(dev), batch=bs)

    from __graft_entry__ import _fusion_batch, _fusion_task

    task = _fusion_task(tiny=False, compute_dtype="bfloat16")
    batch = _fusion_batch(batch_size=bs)
    variables = task.init(jax.random.PRNGKey(0), _fusion_batch(batch_size=8))
    params = variables["params"]

    photometry, pad_mask, metadata, images, spectra, _ = [
        jax.device_put(a, dev) for a in batch
    ]
    params = jax.device_put(params, dev)

    m = task.module

    # full forward
    def full(p, *a):
        return m.apply({"params": p}, *a, deterministic=True)

    args = (photometry, pad_mask, metadata, images, spectra)
    ms = timed(jax.jit(full), params, *args)
    fl = flops_of(full, params, *args)
    emit(stage="full_forward", ms=round(ms, 2), gflops=round(fl / 1e9, 1),
         tflops=round(fl / ms / 1e9, 1), alerts_per_sec=round(bs / ms * 1e3, 1))

    # per-modality encoders, run as bound children of the fusion module
    def run_child(method, *a):
        def f(p, *a2):
            return m.apply({"params": p}, *a2, method=method)
        ms = timed(jax.jit(f), params, *a)
        fl = flops_of(f, params, *a)
        return ms, fl

    for name, method, a in (
        ("photometry_encoder",
         lambda mm, x, mask: mm.photometry_encoder(x, mask, deterministic=True),
         (photometry, pad_mask)),
        ("spectra_encoder",
         lambda mm, x: mm.spectra_encoder(x, deterministic=True),
         (spectra,)),
        ("img_meta_encoder",
         lambda mm, md, im: mm.img_meta_encoder(md, im, deterministic=True),
         (metadata, images)),
    ):
        try:
            ms, fl = run_child(method, *a)
            emit(stage=name, ms=round(ms, 2), gflops=round(fl / 1e9, 1),
                 tflops=round(fl / ms / 1e9, 1))
        except Exception as e:
            emit(stage=name, error=f"{type(e).__name__}: {e}"[:200])


if __name__ == "__main__":
    main()
