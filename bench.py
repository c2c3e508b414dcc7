"""Benchmark: ZTF alerts/sec/chip, full 4-modality fusion inference.

Runs the flagship AppleCider fusion model (full reference scale: d=128/8h/4L
photometry transformer, 5-stage SpectraNet with FFT conv banks,
ConvNeXt-tiny image tower + MoE) in bf16 under jit on the available chip,
over synthetic fixed-shape alert batches, and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "alerts/sec/chip", "vs_baseline": N}

vs_baseline is measured against the BASELINE.json north star of 10,000
alerts/sec/chip. Also reports p50 single-alert latency as a secondary
field.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_ALERTS_PER_SEC = 10_000.0


def main():
    import jax

    # persistent compile cache: the first driver run pays the remote TPU
    # compile once; later runs are instant
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _fusion_batch, _fusion_task

    task = _fusion_task(tiny=False, compute_dtype="bfloat16")

    batch_size = 256
    batch = _fusion_batch(batch_size)
    variables = task.init(jax.random.PRNGKey(0), batch)
    params = variables["params"]

    @jax.jit
    def forward(params, photometry, pad_mask, metadata, images, spectra):
        return task.module.apply(
            {"params": params}, photometry, pad_mask, metadata, images, spectra,
            deterministic=True,
        )

    args = batch[:5]
    # warmup / compile
    forward(params, *args).block_until_ready()

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(params, *args)
    out.block_until_ready()
    elapsed = time.perf_counter() - t0
    alerts_per_sec = batch_size * iters / elapsed

    # p50 single-alert latency
    single = _fusion_batch(1)[:5]
    forward(params, *single).block_until_ready()
    lat = []
    for _ in range(30):
        t1 = time.perf_counter()
        forward(params, *single).block_until_ready()
        lat.append(time.perf_counter() - t1)
    p50_ms = float(np.median(lat) * 1e3)

    print(json.dumps({
        "metric": "alerts/sec/chip, 4-modality fusion inference",
        "value": round(alerts_per_sec, 1),
        "unit": "alerts/sec/chip",
        "vs_baseline": round(alerts_per_sec / BASELINE_ALERTS_PER_SEC, 3),
        "p50_single_alert_ms": round(p50_ms, 3),
        "batch_size": batch_size,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
