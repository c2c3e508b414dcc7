"""Break the device merge into seg-ids vs tail (segment_sum + compaction).

Round-3 state: the Pallas seg-ids kernel (ops/merge_scan.py) is the
single-device TPU default and cut the sequential scan 2.2-3.6x; what's
left of the merge is the *tail* — five segment_sum scatter-adds into the
P+1 segment space, the weighted means, and the rank+scatter compaction.
This probe times, at the production shapes:

  (a) seg_ids_pallas alone,
  (b) the full merge with seg_ids precomputed (isolates the tail),
  (c) the full merge, XLA scan and in-graph pallas variants, for reference.

Decides whether a fused full-merge Pallas kernel (accumulate segments in
the same sequential pass, kill the scatters) is worth building. Relay
rules apply: oracle-fetch before timing, materialize-to-sync.

    nohup python -u scripts/tpu_merge_tail_probe.py > /tmp/merge_tail.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

from bench import _block, make_stream_samples  # noqa: E402
from applecider_tpu.infer.stream import (  # noqa: E402
    merge_light_curve, pack_alert_batch,
)
from applecider_tpu.ops.merge_scan import seg_ids_pallas  # noqa: E402

OUT = REPO / "tpu_results" / "merge_tail_r3.jsonl"


def timeit(fn, args, iters=24):
    _block(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _block(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main() -> None:
    dev = jax.devices()[0]
    rows = []
    for bs, bucket in ((256, (192,)), (1024, (192,)), (1024, (257,))):
        samples = make_stream_samples(bs, seed=1, spectrum_frac=0.0)
        # force every sample into one bucket so P is the bucket size
        raw = pack_alert_batch(samples, length_buckets=bucket)
        raw = {k: jax.device_put(v) for k, v in raw.items()}
        P = int(raw["photo_t"].shape[1])
        t, f, e = raw["photo_t"], raw["photo_flux"], raw["photo_err"]
        b, v = raw["photo_band"], raw["photo_valid"]

        segf = jax.jit(partial(seg_ids_pallas, dt_days=0.5))
        sids = np.asarray(segf(jnp.where(v, t, jnp.inf), b, v))

        def merge_with():
            def one(t1, f1, e1, b1, v1, s1):
                return merge_light_curve(
                    t1, f1, e1, b1, v1, dt_days=0.5, assume_sorted=True,
                    seg_ids=s1, flags_impl="scan", compact_impl="rank")
            return jax.jit(jax.vmap(one))

        # oracle: precomputed-pallas-seg-ids merge == scan merge (fetch first)
        full_scan = jax.jit(jax.vmap(partial(
            merge_light_curve, dt_days=0.5, assume_sorted=True,
            flags_impl="scan", compact_impl="rank")))
        ref = jax.tree.map(np.asarray, full_scan(t, f, e, b, v))
        got = jax.tree.map(np.asarray,
                           merge_with()(t, f, e, b, v, jnp.asarray(sids)))
        for a_, b_ in zip(ref, got):
            np.testing.assert_array_equal(a_, b_)

        sids_dev = jax.device_put(jnp.asarray(sids))
        row = {
            "B": bs, "P": P, "device": str(dev),
            "seg_ids_pallas_ms": round(timeit(
                lambda tt, bb, vv: segf(jnp.where(vv, tt, jnp.inf), bb, vv),
                (t, b, v)), 2),
            "tail_given_seg_ids_ms": round(timeit(
                merge_with(), (t, f, e, b, v, sids_dev)), 2),
            "full_merge_scan_ms": round(timeit(full_scan, (t, f, e, b, v)), 2),
        }
        # end-to-end with in-graph pallas seg ids (what the stream runs)
        def e2e(t1, f1, e1, b1, v1):
            s = seg_ids_pallas(jnp.where(v1, t1, jnp.inf), b1, v1, dt_days=0.5)
            def one(t2, f2, e2, b2, v2, s2):
                return merge_light_curve(t2, f2, e2, b2, v2, dt_days=0.5,
                                         assume_sorted=True, seg_ids=s2)
            return jax.vmap(one)(t1, f1, e1, b1, v1, s)
        row["full_merge_pallas_ms"] = round(timeit(jax.jit(e2e), (t, f, e, b, v)), 2)
        rows.append(row)
        print(json.dumps(row), flush=True)
    OUT.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
