"""Measure device-routed throughput vs the stream's spectrum fraction.

The headline bench fixes spectrum_frac=0.3 (the conservative end of the
live-stream mix); only ~10% of real ZTF alerts carry a contemporaneous
spectrum (reference: spectra are a per-object, not per-alert, product —
`/root/reference/src/applecider/preprocessing_utils/preprocess_multimodal.py:770`
attaches at most one spectrum per object). Spectrum-presence routing
(`applecider_tpu.infer.stream.RoutedAlertStream`) skips SpectraNet for
spectrum-less alerts, so the routed rate scales with the mix. This probe
measures the device-resident routed rate at several fractions instead of
extrapolating.

Usage:  python scripts/probe_spectrum_frac.py   (runs on the default jax device)
Writes one JSON line per fraction to stdout.
"""

from __future__ import annotations

import json
import sys
import time
from collections import deque

sys.path.insert(0, ".")

import os  # noqa: E402

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

from bench import BUCKETS, make_stream_samples  # noqa: E402
from __graft_entry__ import _fusion_batch, _fusion_task  # noqa: E402
from applecider_tpu.infer.stream import FusedSpectraStream, RoutedAlertStream  # noqa: E402


def main() -> None:
    device = jax.devices()[0]
    on_tpu = device.platform not in ("cpu",)
    task = _fusion_task(tiny=False, compute_dtype="bfloat16")
    try:
        from ml_dtypes import bfloat16 as img_dtype
    except ImportError:
        img_dtype = np.float32
    if not on_tpu:
        img_dtype = np.float32

    variables = task.init(jax.random.PRNGKey(0), _fusion_batch(batch_size=8))
    params = variables["params"]
    modes = [("fused", FusedSpectraStream(task)),
             ("routed", RoutedAlertStream(task))]
    if sys.argv[1:]:
        modes = [m for m in modes if m[0] in sys.argv[1:]]

    bs = int(os.environ.get("PROBE_BS", "256"))
    n_sets, iters, depth = 4, 24 if on_tpu else 3, 3
    for frac in (0.3, 0.1, 0.0):
        sample_sets = [
            make_stream_samples(bs, seed=10 + j, spectrum_frac=frac)
            for j in range(n_sets)
        ]
        for name, router in modes:
            placed = [
                router.place(s, length_buckets=BUCKETS, image_dtype=img_dtype)
                for s in sample_sets
            ]
            for p in placed:  # compile + warm every bucket in every set
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
            print(json.dumps({
                "mode": name,
                "spectrum_frac": frac,
                "device_routed_alerts_per_sec": round(rate, 1),
                "batch_size": bs,
                "iters": iters,
                "pipeline_depth": depth,
                "device": str(device),
            }), flush=True)


if __name__ == "__main__":
    main()
