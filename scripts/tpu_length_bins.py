"""Measure fused serving rate vs light-curve length bucket.

Every sample in a batch pads to the batch's longest light curve, so a
mixed stream runs ~all batches at the top bucket (192 for the bench's
P ~ U(20, 180) mix). A feeder that bins alerts by length into
homogeneous batches would run each batch at its own bucket — this probe
measures what each bucket's batch actually sustains (B=1024, frac 0.1,
depth-3 pipelining, materialization-synced) so the blended win is
arithmetic, not a guess.
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import deque

sys.path.insert(0, ".")

import jax
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

from bench import BUCKETS, make_stream_samples  # noqa: E402
from __graft_entry__ import _fusion_batch, _fusion_task  # noqa: E402
from applecider_tpu.infer.stream import FusedSpectraStream  # noqa: E402


def clip_samples(samples, lo, hi, rng):
    """Restrict each sample's light curve to lo <= P <= hi (resample count)."""
    out = []
    for s in samples:
        s = dict(s)
        P = len(s["photo_t"])
        want = int(rng.integers(lo, hi + 1))
        if want < P:
            idx = np.sort(rng.choice(P, size=want, replace=False))
            for k in ("photo_t", "photo_flux", "photo_err", "photo_band"):
                s[k] = s[k][idx]
        out.append(s)
    return out


def main() -> None:
    dev = jax.devices()[0]
    on_tpu = dev.platform not in ("cpu",)
    task = _fusion_task(tiny=False, compute_dtype="bfloat16")
    try:
        from ml_dtypes import bfloat16 as img_dtype
    except ImportError:
        img_dtype = np.float32
    if not on_tpu:
        img_dtype = np.float32

    variables = task.module.init(jax.random.PRNGKey(0), *_fusion_batch(2)[:5],
                                 deterministic=True)
    params = variables["params"]
    router = FusedSpectraStream(task)

    bs = int(os.environ.get("PROBE_BS", "1024"))
    frac = float(os.environ.get("PROBE_FRAC", "0.1"))
    n_sets, iters, depth = 4, 24 if on_tpu else 3, 3
    rng = np.random.default_rng(7)

    # (label, P range) per bucket: homogeneous-length batches
    ranges = [("le64", 20, 64), ("le128", 65, 128), ("le192", 129, 180)]
    for label, lo, hi in ranges:
        sets = [clip_samples(make_stream_samples(bs, seed=40 + j, spectrum_frac=frac),
                             lo, hi, rng) for j in range(n_sets)]
        placed = [router.place(s, length_buckets=BUCKETS, image_dtype=img_dtype)
                  for s in sets]
        for p in placed:
            router.run_placed(params, p)()
        pend: deque = deque()
        t0 = time.perf_counter()
        for i in range(iters):
            pend.append(router.run_placed(params, placed[i % n_sets]))
            if len(pend) > depth:
                pend.popleft()()
        while pend:
            pend.popleft()()
        rate = bs * iters / (time.perf_counter() - t0)
        print(json.dumps({"bucket": label, "spectrum_frac": frac,
                          "alerts_per_sec": round(rate, 1), "batch_size": bs,
                          "device": str(dev)}), flush=True)


if __name__ == "__main__":
    main()
