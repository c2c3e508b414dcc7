"""Split the merge tail: stacked segment_sum vs rank compare vs scatter.

Follow-up to tpu_merge_tail_probe.py — times the three tail stages in
isolation at the production shape (B=1024, P=257) to decide where a
fused full-merge Pallas kernel (or a cheaper restructure) would pay.
Relay rules: materialize-to-sync, numeric fetch before timing.

    nohup python -u scripts/tpu_merge_tail_split.py > /tmp/tail_split.log 2>&1 &
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
from applecider_tpu.infer.stream import _rank_compact, pack_alert_batch  # noqa: E402
from applecider_tpu.ops.merge_scan import seg_ids_pallas  # noqa: E402

OUT = REPO / "tpu_results" / "merge_tail_split_r3.jsonl"


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
    bs, bucket = 1024, (257,)
    samples = make_stream_samples(bs, seed=1, spectrum_frac=0.0)
    raw = {k: jax.device_put(v)
           for k, v in pack_alert_batch(samples, length_buckets=bucket).items()}
    P = int(raw["photo_t"].shape[1])
    t, f, e = raw["photo_t"], raw["photo_flux"], raw["photo_err"]
    b, v = raw["photo_band"], raw["photo_valid"]
    sids = jax.jit(partial(seg_ids_pallas, dt_days=0.5))(
        jnp.where(v, t, jnp.inf), b, v)
    sids = jax.device_put(np.asarray(sids))

    eps = 1e-8

    def seg_stage(t, f, e, b, v, s):
        def one(t1, f1, e1, b1, v1, s1):
            w = jnp.where(v1, 1.0 / (e1 + eps), 0.0)
            payload = jnp.stack(
                [w, v1.astype(jnp.float32), w * t1, w * f1, w * e1], axis=1)
            return jax.ops.segment_sum(payload, s1, num_segments=P + 1)
        return jax.vmap(one)(t, f, e, b, v, s)

    segf = jax.jit(seg_stage)
    segs = segf(t, f, e, b, v, sids)
    segs_host = np.asarray(segs)  # fetch-before-timing sanity
    assert np.isfinite(segs_host).all()

    def means_key(segs, b, v):
        def one(sg, b1, v1):
            wsum, cnt = sg[:, 0], sg[:, 1]
            safe = jnp.maximum(wsum, eps)
            t_m = sg[:, 2] / safe
            seg_valid = (cnt > 0) & (jnp.arange(P + 1) < P)
            key = jnp.where(seg_valid, t_m, jnp.inf)
            cols = jnp.stack(
                [t_m, sg[:, 3] / safe, sg[:, 4] / safe,
                 jnp.concatenate([b1.astype(jnp.float32), jnp.zeros(1)]),
                 seg_valid.astype(jnp.float32)], axis=1)
            return key, cols
        return jax.vmap(one)(segs, b, v)

    keyf = jax.jit(means_key)
    key, cols = keyf(segs, b, v)

    rankf = jax.jit(jax.vmap(_rank_compact))
    ranks = rankf(key)

    def scatter_stage(cols, ranks):
        def one(c1, r1):
            return jnp.zeros((P, 5), c1.dtype).at[r1].set(c1, mode="drop")
        return jax.vmap(one)(cols, ranks)

    scatf = jax.jit(scatter_stage)
    _ = np.asarray(scatf(cols, ranks))

    def argsort_stage(cols, key):
        def one(c1, k1):
            return c1[jnp.argsort(k1)[:P]]
        return jax.vmap(one)(cols, key)

    argf = jax.jit(argsort_stage)
    _ = np.asarray(argf(cols, key))

    row = {
        "B": bs, "P": P, "device": str(dev),
        "segment_sum_stacked_ms": timeit(segf, (t, f, e, b, v, sids)),
        "means_key_ms": timeit(keyf, (segs, b, v)),
        "rank_compare_ms": timeit(rankf, (key,)),
        "scatter_compact_ms": timeit(scatf, (cols, ranks)),
        "argsort_gather_compact_ms": timeit(argf, (cols, key)),
    }
    print(json.dumps(row), flush=True)
    OUT.write_text(json.dumps(row) + "\n")
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
