"""Chain-amortized (np.asarray-synced) forward submodule timing on TPU.

block_until_ready doesn't sync through the axon relay; this probe times
N dispatches + one final host materialization, amortized.
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


def chain_time(fn, argsets, N=16):
    import jax  # noqa: F401

    out = fn(*argsets[0])
    _ = np.asarray(jax.tree.leaves(out)[0])[:1]  # compile + sync
    t0 = time.perf_counter()
    for i in range(N):
        out = fn(*argsets[i % len(argsets)])
    _ = np.asarray(jax.tree.leaves(out)[0])[:1]
    return (time.perf_counter() - t0) / N * 1e3


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    dev = jax.devices()[0]
    emit(stage="device", device=str(dev))

    from __graft_entry__ import _fusion_batch, _fusion_task

    task = _fusion_task(tiny=False, compute_dtype="bfloat16")
    params = jax.device_put(
        task.init(jax.random.PRNGKey(0), _fusion_batch(batch_size=8))["params"], dev
    )
    m = task.module

    def place(bs, n=2):
        sets = []
        for s in range(n):
            rng = np.random.default_rng(s)
            batch = list(_fusion_batch(batch_size=bs)[:5])
            batch[0] = batch[0] + rng.normal(scale=0.01, size=batch[0].shape).astype(np.float32)
            sets.append(tuple(jax.device_put(x, dev) for x in batch))
        return sets

    # submodules at 256
    bs = 256
    sets = place(bs)
    photometry, pad_mask, metadata, images, spectra = sets[0]

    def sub(method):
        return jax.jit(lambda p, *a: m.apply({"params": p}, *a, method=method))

    jobs = [
        ("photometry_encoder",
         sub(lambda mm, x, mask: mm.photometry_encoder(x, mask, deterministic=True)),
         [(params, s[0], s[1]) for s in sets]),
        ("spectra_encoder",
         sub(lambda mm, x: mm.spectra_encoder(x, deterministic=True)),
         [(params, s[4]) for s in sets]),
        ("img_meta_encoder",
         sub(lambda mm, md, im: mm.img_meta_encoder(md, im, deterministic=True)),
         [(params, s[2], s[3]) for s in sets]),
    ]
    for name, fn, argsets in jobs:
        try:
            ms = chain_time(fn, argsets)
            emit(stage=name, batch=bs, ms=round(ms, 2))
        except Exception as e:
            emit(stage=name, error=f"{type(e).__name__}: {e}"[:200])

    # full forward at several batch sizes
    fullj = jax.jit(lambda p, *a: m.apply({"params": p}, *a, deterministic=True))
    for bsz in (256, 512, 1024):
        try:
            ssets = place(bsz)
            ms = chain_time(fullj, [(params, *s) for s in ssets], N=12)
            emit(stage="full_forward", batch=bsz, ms=round(ms, 2),
                 alerts_per_sec=round(bsz / ms * 1e3, 1))
        except Exception as e:
            emit(stage="full_forward", batch=bsz, error=f"{type(e).__name__}: {e}"[:200])


if __name__ == "__main__":
    main()
