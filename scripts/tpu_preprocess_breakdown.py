"""Which device-preprocess stage eats the 178 ms? merge vs featurize vs spectra.

Each stage jitted separately over the same packed batch, blocked per iter.
Run: python -u scripts/tpu_preprocess_breakdown.py [batch] (background, no kill).
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timed(fn, *args, iters=8):
    """Chain-amortized with host materialization (block_until_ready does
    not sync through the relay — KERNEL_NOTES measurement rule #1)."""
    import jax

    def sync(o):
        leaf = jax.tree.leaves(o)[0]
        idx = tuple(0 for _ in range(getattr(leaf, "ndim", 0)))
        np.asarray(leaf[idx] if idx else leaf)

    sync(fn(*args))  # compile + sync
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return float((time.perf_counter() - t0) / iters * 1e3)


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    dev = jax.devices()[0]
    emit(stage="device", device=str(dev))

    from applecider_tpu.infer.stream import (
        featurize_events, merge_light_curve, pack_alert_batch, resample_spectrum,
    )
    from bench import BUCKETS, make_stream_samples

    raw = pack_alert_batch(make_stream_samples(bs, seed=1), length_buckets=BUCKETS)
    placed = {k: jax.device_put(v, dev) for k, v in raw.items()}
    jax.block_until_ready(placed)
    P = raw["photo_t"].shape[1]
    emit(stage="shapes", batch=bs, P=P, S=raw["spec_wl"].shape[1])

    merge = jax.jit(jax.vmap(partial(merge_light_curve, dt_days=0.5, assume_sorted=True)))
    ms = timed(merge, placed["photo_t"], placed["photo_flux"], placed["photo_err"],
               placed["photo_band"], placed["photo_valid"])
    emit(stage="merge", ms=round(ms, 2))

    merged = merge(placed["photo_t"], placed["photo_flux"], placed["photo_err"],
                   placed["photo_band"], placed["photo_valid"])
    jax.block_until_ready(merged)

    feat = jax.jit(jax.vmap(featurize_events))
    ms = timed(feat, *merged)
    emit(stage="featurize", ms=round(ms, 2))

    grid = jax.device_put(np.linspace(4500.0, 7980.0, 3481, dtype=np.float32), dev)
    spec = jax.jit(jax.vmap(partial(resample_spectrum, grid=grid)))
    ms = timed(spec, placed["spec_wl"], placed["spec_flux"], placed["spec_valid"])
    emit(stage="spectra_resample", ms=round(ms, 2))

    # sub-stages of merge: band flags (x3) alone
    from applecider_tpu.infer.stream import _band_group_flags

    def flags_only(t, band, valid):
        t_sorted = np.inf * (~valid) + t * valid
        out = 0
        for b in range(3):
            out = out + _band_group_flags(t_sorted, valid & (band == b), 0.5)
        return out

    fo = jax.jit(jax.vmap(flags_only))
    ms = timed(fo, placed["photo_t"], placed["photo_band"], placed["photo_valid"])
    emit(stage="merge_band_flags_only", ms=round(ms, 2))

    # merge without the final compaction argsort: approximate by timing argsort alone
    def compact_sort(t):
        return jax.numpy.argsort(t, axis=-1)

    cs = jax.jit(compact_sort)
    ms = timed(cs, placed["photo_t"])
    emit(stage="argsort_P", ms=round(ms, 2))

    # spectra sub-stages: interp without MAD vs MAD alone
    def interp_only(wl, flux, valid):
        import jax.numpy as jnp
        big = 1e30
        wl_s = jnp.where(valid, wl, big)
        order = jnp.argsort(wl_s)
        x = wl_s[order]
        y = flux[order]
        n = jnp.maximum(jnp.sum(valid), 2)
        idx = jnp.clip(jnp.searchsorted(x, grid), 1, n - 1)
        x0, x1 = x[idx - 1], x[idx]
        y0, y1 = y[idx - 1], y[idx]
        slope = (y1 - y0) / jnp.maximum(x1 - x0, 1e-12)
        return y0 + slope * (grid - x0)

    io = jax.jit(jax.vmap(interp_only))
    ms = timed(io, placed["spec_wl"], placed["spec_flux"], placed["spec_valid"])
    emit(stage="spectra_interp_only", ms=round(ms, 2))

    from applecider_tpu.infer.stream import _median_no_sort

    def mad_only(x):
        med = _median_no_sort(x)
        return _median_no_sort(jax.numpy.abs(x - med))

    mo = jax.jit(jax.vmap(mad_only))
    xs = io(placed["spec_wl"], placed["spec_flux"], placed["spec_valid"])
    jax.block_until_ready(xs)
    ms = timed(mo, xs)
    emit(stage="spectra_mad_only", ms=round(ms, 2))


if __name__ == "__main__":
    main()
