"""Decide which forward timing is real: 88 ms or 0.56 ms at batch 256.

Tests, all blocked per iteration:
  1. known-FLOP matmul (4096^3 bf16 = 137 GFLOP) — implied TFLOP/s must be
     <= chip peak (197); calibrates trust in wall-clock timing.
  2. fusion forward with the SAME input buffers every iter.
  3. fusion forward ROTATING 4 distinct input sets (defeats any
     executable+buffer result caching in the relay).
  4. same as 3 but materializing a scalar (np.asarray) every iter.
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

    # 1. known-FLOP matmul
    n = 4096
    a = jax.device_put(jnp.ones((n, n), jnp.bfloat16), dev)
    b = jax.device_put(jnp.ones((n, n), jnp.bfloat16), dev)
    mm = jax.jit(lambda a, b: a @ b)
    jax.block_until_ready(mm(a, b))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(mm(a, b))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts) * 1e3)
    fl = 2 * n**3
    emit(stage="matmul_4096", ms=round(ms, 3), implied_tflops=round(fl / ms / 1e9, 1))

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
        batch = _fusion_batch(batch_size=bs)
        # perturb so each set is distinct data
        batch = tuple(np.asarray(x) + (rng.normal(scale=0.01, size=np.shape(x))
                                        if np.asarray(x).dtype != bool else 0)
                      if np.asarray(x).dtype != bool else np.asarray(x)
                      for x in batch[:5])
        sets.append(tuple(jax.device_put(x, dev) for x in batch))
    jax.block_until_ready(fullj(params, *sets[0]))

    # 2. same buffers
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(fullj(params, *sets[0]))
        ts.append(time.perf_counter() - t0)
    emit(stage="forward_same_buffers", ms=round(float(np.median(ts) * 1e3), 3))

    # 3. rotating buffers
    for s in sets:
        jax.block_until_ready(fullj(params, *s))
    ts = []
    for i in range(12):
        t0 = time.perf_counter()
        jax.block_until_ready(fullj(params, *sets[i % 4]))
        ts.append(time.perf_counter() - t0)
    emit(stage="forward_rotating", ms=round(float(np.median(ts) * 1e3), 3))

    # 4. rotating + host materialization of a scalar
    ts = []
    outs = []
    for i in range(12):
        t0 = time.perf_counter()
        out = fullj(params, *sets[i % 4])
        outs.append(float(np.asarray(out)[0, 0]))
        ts.append(time.perf_counter() - t0)
    emit(stage="forward_rotating_materialized", ms=round(float(np.median(ts) * 1e3), 3),
         sample_outputs=[round(o, 4) for o in outs[:4]])


if __name__ == "__main__":
    main()
