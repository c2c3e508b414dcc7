"""Separate true device execution cost from tunnel RPC roundtrip latency.

block_until_ready through the axon relay does NOT wait for execution
(measured: 4096^3 matmul "completes" in 27 us = 5000 TFLOP/s, 25x over
peak). Only host materialization (np.asarray) synchronizes. So:

  per-iter materialized  = exec + D2H + RPC roundtrip
  N dispatches + 1 final materialize, / N  = exec + (D2H + RPC)/N

Comparing the two at N=16/32 yields both components, for the known-FLOP
matmul and the fusion forward.
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
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    dev = jax.devices()[0]
    emit(stage="device", device=str(dev))

    # known-FLOP matmul, amortized chain with data dependency
    n = 4096
    a = jax.device_put(jnp.full((n, n), 1e-4, jnp.bfloat16), dev)
    b = jax.device_put(jnp.full((n, n), 1e-4, jnp.bfloat16), dev)
    mm = jax.jit(lambda a, b: a @ b)
    _ = np.asarray(mm(a, b))  # compile + sync
    fl = 2.0 * n**3

    for N in (4, 16, 64):
        t0 = time.perf_counter()
        out = a
        for _ in range(N):
            out = mm(out, b)  # data-dependent chain: must execute serially
        _ = np.asarray(out[:1, :1])
        dt = (time.perf_counter() - t0) / N
        emit(stage="matmul_chain", N=N, ms_per_iter=round(dt * 1e3, 3),
             implied_tflops=round(fl / dt / 1e12, 1))

    from __graft_entry__ import _fusion_batch, _fusion_task

    task = _fusion_task(tiny=False, compute_dtype="bfloat16")
    params = jax.device_put(
        task.init(jax.random.PRNGKey(0), _fusion_batch(batch_size=8))["params"], dev
    )

    def full(p, *a):
        return task.module.apply({"params": p}, *a, deterministic=True)

    fullj = jax.jit(full)
    sets = []
    for s in range(4):
        rng = np.random.default_rng(s)
        batch = list(_fusion_batch(batch_size=bs)[:5])
        batch[0] = batch[0] + rng.normal(scale=0.01, size=batch[0].shape).astype(np.float32)
        sets.append(tuple(jax.device_put(x, dev) for x in batch))
    _ = np.asarray(fullj(params, *sets[0]))  # compile + sync

    for N in (4, 16, 32):
        t0 = time.perf_counter()
        out = None
        for i in range(N):
            out = fullj(params, *sets[i % 4])
        _ = np.asarray(out[:1, :1])
        dt = (time.perf_counter() - t0) / N
        emit(stage="forward_chain", N=N, ms_per_iter=round(dt * 1e3, 3),
             alerts_per_sec=round(bs / dt, 1))

    # e2e pipeline amortized (device-resident raw)
    from applecider_tpu.infer.stream import AlertStreamPipeline, pack_alert_batch
    from bench import BUCKETS, make_stream_samples

    pipe = AlertStreamPipeline(task)
    raws = []
    for s in range(4):
        raw = pack_alert_batch(make_stream_samples(bs, seed=20 + s), length_buckets=BUCKETS)
        raws.append({k: jax.device_put(v, dev) for k, v in raw.items()})
    _ = np.asarray(pipe(params, raws[0]))  # compile + sync
    for N in (4, 16):
        t0 = time.perf_counter()
        out = None
        for i in range(N):
            out = pipe(params, raws[i % 4])
        _ = np.asarray(out[:1, :1])
        dt = (time.perf_counter() - t0) / N
        emit(stage="pipeline_chain_device_resident", N=N,
             ms_per_iter=round(dt * 1e3, 3), alerts_per_sec=round(bs / dt, 1))

    # e2e pipeline amortized with HOST raw (pays real H2D per dispatch)
    host_raws = [pack_alert_batch(make_stream_samples(bs, seed=30 + s),
                                  length_buckets=BUCKETS) for s in range(4)]
    _ = np.asarray(pipe(params, host_raws[0]))
    for N in (4, 16):
        t0 = time.perf_counter()
        out = None
        for i in range(N):
            out = pipe(params, host_raws[i % 4])
        _ = np.asarray(out[:1, :1])
        dt = (time.perf_counter() - t0) / N
        emit(stage="pipeline_chain_host_raw", N=N,
             ms_per_iter=round(dt * 1e3, 3), alerts_per_sec=round(bs / dt, 1))


if __name__ == "__main__":
    main()
