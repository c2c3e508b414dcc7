"""On-chip A/B: int8 PTQ FusedSpectraStream vs f32/bf16, frac-0.3 mix.

Validation-first per the measurement rules (docs/KERNEL_NOTES.md): fetch
the agreement numerics BEFORE any timing loop; sync by materializing one
element of the last dispatched program; never chain state.

    nohup python -u scripts/tpu_int8_ab.py > /tmp/int8_ab.log 2>&1 &
"""

import json
import sys
import time
from collections import deque
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _fusion_task  # noqa: E402
from bench import make_stream_samples  # noqa: E402
from applecider_tpu.infer.stream import FusedSpectraStream  # noqa: E402
from applecider_tpu.ops.quant import quant_error_report  # noqa: E402

BUCKETS = (64, 128, 192, 257)
OUT = REPO / "tpu_results" / "int8_ab_r3.jsonl"


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    task = _fusion_task(tiny=False, compute_dtype="bfloat16")
    bs, iters, n_sets, depth = 1024, 24, 2, 3

    sets = [make_stream_samples(bs, seed=20 + j, spectrum_frac=0.3)
            for j in range(n_sets)]
    variables = task.init(
        jax.random.PRNGKey(0),
        (np.zeros((2, 64, 7), np.float32), np.zeros((2, 64), bool),
         np.zeros((2, 24), np.float32), np.zeros((2, 63, 63, 3), np.float32),
         np.zeros((2, 3481), np.float32), np.zeros(2, np.int64)),
    )
    params = jax.device_put(variables["params"])

    router = FusedSpectraStream(task)
    placed = [router.place(s, length_buckets=BUCKETS) for s in sets]

    # ---- calibrate on the host CPU backend (eager; scales are device-free)
    cpu = jax.devices("cpu")[0]
    cpu_params = jax.device_put(variables["params"], cpu)
    t0 = time.time()
    with jax.default_device(cpu):
        calib = [router.place(make_stream_samples(32, seed=70 + j, spectrum_frac=0.5),
                              length_buckets=BUCKETS, device=cpu)
                 for j in range(2)]
        scales = router.pipe.calibrate(cpu_params, calib)
    print(f"calibrated {len(scales)} scales in {time.time()-t0:.1f}s", flush=True)
    q_router = FusedSpectraStream(task, quantize_scales=scales)

    # ---- numerics FIRST (relay rule): agreement on one batch
    ref = router.run_placed(params, placed[0])()
    q = q_router.run_placed(params, placed[0])()
    agree = quant_error_report(ref, q)
    print("agreement:", agree, flush=True)

    rows = []
    for label, r in (("f32", router), ("int8", q_router)):
        for p in placed:
            r.run_placed(params, p)()  # compile + warm
        pend = deque()
        t0 = time.perf_counter()
        for i in range(iters):
            pend.append(r.run_placed(params, placed[i % n_sets]))
            if len(pend) > depth:
                pend.popleft()()
        while pend:
            pend.popleft()()
        rate = bs * iters / (time.perf_counter() - t0)
        rows.append({"variant": label, "alerts_per_sec": round(rate, 1),
                     "batch": bs, "spectrum_frac": 0.3, "device": str(dev)})
        print(rows[-1], flush=True)

    rows.append({"agreement": agree})
    OUT.parent.mkdir(exist_ok=True)
    with open(OUT, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
