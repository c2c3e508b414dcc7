"""A/B the merge compaction impl (rank+scatter vs argsort+gather) at the
production batch, after the round-3 stacked-scatter change.

The auto choice (rank on TPU) was measured at B=256/P=192 BEFORE the
five compaction scatters were stacked into one; standalone stage timing
now shows argsort+gather (4.4 ms) under rank(2.5)+scatter(4.2) at
B=1024/P=257 — this re-times both inside the full fused merge program,
oracle-checked first.

    nohup python -u scripts/tpu_compact_ab.py > /tmp/compact_ab.log 2>&1 &
"""

from __future__ import annotations

import json
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
from applecider_tpu.infer.stream import merge_light_curve, pack_alert_batch  # noqa: E402
from applecider_tpu.ops.merge_scan import seg_ids_pallas  # noqa: E402

OUT = REPO / "tpu_results" / "compact_ab_r3.jsonl"


def timeit(fn, args, iters=24):
    _block(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _block(out)
    return round((time.perf_counter() - t0) / iters * 1e3, 2)


def main() -> None:
    dev = jax.devices()[0]
    rows = []
    for bs, bucket in ((1024, (257,)), (1024, (192,)), (256, (192,))):
        samples = make_stream_samples(bs, seed=1, spectrum_frac=0.0)
        raw = {k: jax.device_put(v)
               for k, v in pack_alert_batch(samples, length_buckets=bucket).items()}
        t, f, e = raw["photo_t"], raw["photo_flux"], raw["photo_err"]
        b, v = raw["photo_band"], raw["photo_valid"]

        def full(compact):
            def fn(t1, f1, e1, b1, v1):
                s = seg_ids_pallas(jnp.where(v1, t1, jnp.inf), b1, v1,
                                   dt_days=0.5)
                def one(t2, f2, e2, b2, v2, s2):
                    return merge_light_curve(
                        t2, f2, e2, b2, v2, dt_days=0.5, assume_sorted=True,
                        seg_ids=s2, compact_impl=compact)
                return jax.vmap(one)(t1, f1, e1, b1, v1, s)
            return jax.jit(fn)

        fr, fa = full("rank"), full("argsort")
        ref = jax.tree.map(np.asarray, fr(t, f, e, b, v))
        got = jax.tree.map(np.asarray, fa(t, f, e, b, v))
        for a_, b_ in zip(ref, got):
            np.testing.assert_array_equal(a_, b_)
        row = {"B": bs, "P": int(raw["photo_t"].shape[1]), "device": str(dev),
               "oracle_ok": True,
               "rank_ms": timeit(fr, (t, f, e, b, v)),
               "argsort_ms": timeit(fa, (t, f, e, b, v))}
        rows.append(row)
        print(json.dumps(row), flush=True)
    OUT.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
