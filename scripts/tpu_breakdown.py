"""Stage-by-stage TPU pipeline breakdown — finds where the 500 ms/batch goes.

The round-3 decision pass measured: model_only 685k alerts/s (implausible,
implied MFU 2009%) but device_pipeline only 502 alerts/s at batch 256.
This probe separates, with a block_until_ready after EVERY step:
  1. H2D: device_put of one packed batch (bytes / bandwidth)
  2. preprocess+forward with device-resident inputs
  3. forward only, per-iteration blocked (true model rate, honest MFU)
  4. D2H of the output probs

Run: `python scripts/tpu_breakdown.py [batch_size]` (background, never kill
mid-TPU-use). Prints one JSON line per measurement.
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


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    dev = jax.devices()[0]
    emit(stage="device", device=str(dev), platform=dev.platform)

    from __graft_entry__ import _fusion_batch, _fusion_task
    from applecider_tpu.infer.stream import AlertStreamPipeline, pack_alert_batch
    from bench import BUCKETS, make_stream_samples

    task = _fusion_task(tiny=False, compute_dtype="bfloat16")
    init_batch = _fusion_batch(batch_size=8)
    params = task.init(jax.random.PRNGKey(0), init_batch)["params"]
    pipe = AlertStreamPipeline(task)

    raw = pack_alert_batch(make_stream_samples(bs, seed=1), length_buckets=BUCKETS)
    nbytes = sum(a.nbytes for a in raw.values())

    # 1. H2D bandwidth, blocked (3 reps, fresh arrays to defeat caching)
    for rep in range(3):
        raw_r = {k: (v + 0 if v.dtype != bool else v.copy()) for k, v in raw.items()}
        t0 = time.perf_counter()
        placed = {k: jax.device_put(v, dev) for k, v in raw_r.items()}
        jax.block_until_ready(placed)
        dt = time.perf_counter() - t0
        emit(stage="h2d", rep=rep, batch=bs, mbytes=round(nbytes / 1e6, 2),
             ms=round(dt * 1e3, 2), mb_per_s=round(nbytes / 1e6 / dt, 1))

    # 2. full pipeline with device-resident inputs, per-iter blocked
    jax.block_until_ready(pipe(params, placed))  # compile
    times = []
    for _ in range(8):
        t0 = time.perf_counter()
        jax.block_until_ready(pipe(params, placed))
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times) * 1e3)
    emit(stage="pipeline_device_resident", batch=bs, ms=round(ms, 2),
         alerts_per_sec=round(bs / (ms / 1e3), 1))

    # 3. model forward only, per-iter blocked (device-resident featurized args)
    fwd_args = tuple(jax.device_put(a, dev) for a in _fusion_batch(bs)[:5])

    @jax.jit
    def forward(params, photometry, pad_mask, metadata, images, spectra):
        return task.module.apply(
            {"params": params}, photometry, pad_mask, metadata, images, spectra,
            deterministic=True,
        )

    compiled = forward.lower(params, *fwd_args).compile()
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
    except Exception:
        flops = 0.0
    jax.block_until_ready(forward(params, *fwd_args))
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(forward(params, *fwd_args))
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times) * 1e3)
    tflops = flops / (ms / 1e3) / 1e12 if flops else None
    emit(stage="forward_blocked", batch=bs, ms=round(ms, 2),
         alerts_per_sec=round(bs / (ms / 1e3), 1),
         cost_analysis_gflops_per_batch=round(flops / 1e9, 2) if flops else None,
         implied_tflops=round(tflops, 1) if tflops else None,
         implied_mfu_pct_at_197=round(100 * tflops / 197, 1) if tflops else None)

    # 3b. same but timed as the bench does (async loop, block once at end)
    t0 = time.perf_counter()
    out = None
    for _ in range(30):
        out = forward(params, *fwd_args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    emit(stage="forward_async_loop_30", batch=bs, total_ms=round(dt * 1e3, 2),
         alerts_per_sec=round(bs * 30 / dt, 1))

    # 4. D2H of the probs
    probs = pipe(params, placed)
    jax.block_until_ready(probs)
    t0 = time.perf_counter()
    np.asarray(probs)
    emit(stage="d2h_probs", ms=round((time.perf_counter() - t0) * 1e3, 2),
         mbytes=round(probs.size * 4 / 1e6, 3))

    # 5. preprocess only (merge+featurize+spectra, no model): diff 2 and 3
    emit(stage="summary", batch=bs,
         note="pipeline_device_resident - forward_blocked = device preprocess cost; "
              "h2d + pipeline = what the e2e bench loop pays per dispatch")


if __name__ == "__main__":
    main()
