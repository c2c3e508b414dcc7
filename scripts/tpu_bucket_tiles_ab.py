"""A/B of length-bucket boundaries against TPU tile geometry.

The transformer prepends a CLS token, so a bucket P runs attention at
L = P + 1, and the (B, H, L, L) score tensors pad physically to bf16
tiles of (16 sublanes, 128 lanes). The default buckets [64, 128, 192,
257] give L in {65, 129, 193, 258} -> physical tiles 80x128, 144x256,
208x256, 272x384 — bucket 128 materializes 2.25x the exact-tile
footprint. Tile-exact buckets [63, 127, 191, 255] give L in {64, 128,
192, 256} -> 64x128, 128x128, 192x256, 256x256.

This probe times the fused serving forward on HOMOGENEOUS batches whose
lengths fit the smaller bucket of each pair, packed at the old vs the
tile-exact bucket — identical inputs, only the pad target differs.
Relay measurement rules (KERNEL_NOTES) throughout.

Run: nohup python -u scripts/tpu_bucket_tiles_ab.py > /tmp/btab.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import deque

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

from bench import make_stream_samples  # noqa: E402
from scripts.tpu_length_bins import clip_samples  # noqa: E402
from __graft_entry__ import _fusion_batch, _fusion_task  # noqa: E402
from applecider_tpu.infer.stream import FusedSpectraStream  # noqa: E402


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
    print(json.dumps({"stage": "device", "device": str(dev), "batch": bs}),
          flush=True)

    # (old bucket, tile-exact bucket): samples fit the SMALLER one
    pairs = ((64, 63), (128, 127), (192, 191), (257, 255))
    for old_b, new_b in pairs:
        lo = max(20, new_b - 60)
        sets = [clip_samples(make_stream_samples(bs, seed=40 + j, spectrum_frac=frac),
                             lo, new_b, rng) for j in range(n_sets)]
        row = {"lengths": f"{lo}-{new_b}"}
        for label, bucket in (("old", old_b), ("tile", new_b)):
            placed = [router.place(s, length_buckets=(bucket,),
                                   image_dtype=img_dtype) for s in sets]
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
            row[f"{label}_bucket"] = bucket
            row[f"{label}_alerts_per_sec"] = round(
                bs * iters / (time.perf_counter() - t0), 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
