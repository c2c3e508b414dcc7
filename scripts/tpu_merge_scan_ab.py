"""On-chip A/B: Pallas batched merge scan vs the XLA fused scan.

Validation-first (two real XLA/Mosaic TPU miscompiles found this round):
outputs are fetched and oracled BEFORE any timing; sync via one-element
host materialization (relay rule); never chain state.

    nohup python -u scripts/tpu_merge_scan_ab.py > /tmp/merge_scan_ab.log 2>&1 &
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

from applecider_tpu.ops.merge_scan import (  # noqa: E402
    seg_ids_pallas,
    seg_ids_scan_reference,
)

OUT = REPO / "tpu_results" / "merge_scan_ab_r3.jsonl"


def sync(x):
    return float(np.asarray(x[(0,) * x.ndim]))


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    rows = []
    for B, P in ((256, 192), (1024, 192), (1024, 257)):
        rng = np.random.default_rng(0)
        t = np.sort(rng.uniform(0, 30, (B, P)), axis=1).astype(np.float32)
        n_valid = rng.integers(P // 4, P + 1, B)
        valid = np.arange(P)[None, :] < n_valid[:, None]
        t = np.where(valid, t, np.inf).astype(np.float32)
        band = rng.integers(0, 3, (B, P)).astype(np.int32)
        args = (jnp.asarray(t), jnp.asarray(band), jnp.asarray(valid))

        ref_fn = jax.jit(lambda a, b, c: seg_ids_scan_reference(a, b, c, 0.5))
        pal_fn = jax.jit(lambda a, b, c: seg_ids_pallas(a, b, c, dt_days=0.5))

        # ---- oracle FIRST
        want = np.asarray(ref_fn(*args))
        got = np.asarray(pal_fn(*args))
        ok = bool((want == got).all())
        print(f"(B={B}, P={P}) oracle match: {ok}", flush=True)
        if not ok:
            bad = int((want != got).sum())
            rows.append({"B": B, "P": P, "oracle_ok": False, "mismatches": bad})
            continue

        res = {"B": B, "P": P, "oracle_ok": True, "device": str(dev)}
        for label, fn in (("xla_scan", ref_fn), ("pallas", pal_fn)):
            sync(fn(*args))  # warm AND drain before the timer (relay rule)
            iters = 30
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = fn(*args)
            sync(out)
            res[f"{label}_ms"] = round((time.perf_counter() - t0) / iters * 1e3, 3)
        print(res, flush=True)
        rows.append(res)

    # ---- SPMD-rule smoke: the custom_partitioning wrapper on a 1-device
    # TPU mesh must be bit-identical to the direct kernel (>1-shard slicing
    # is CPU-mesh-tested in tests/test_merge_scan.py)
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P_

    from applecider_tpu.ops.merge_scan import _sharded_seg_ids

    rng = np.random.default_rng(1)
    B, P = 256, 192
    t = np.sort(rng.uniform(0, 30, (B, P)), axis=1).astype(np.float32)
    valid = np.arange(P)[None, :] < rng.integers(P // 4, P + 1, B)[:, None]
    t = np.where(valid, t, np.inf).astype(np.float32)
    band = rng.integers(0, 3, (B, P)).astype(np.int32)
    direct = np.asarray(jax.jit(
        lambda a, b, c: seg_ids_pallas(a, b, c, dt_days=0.5))(
            jnp.asarray(t), jnp.asarray(band), jnp.asarray(valid)))
    mesh1 = Mesh(np.array([dev]).reshape(1), ("data",))
    sh = NamedSharding(mesh1, P_("data", None))
    args_m = tuple(jax.device_put(jnp.asarray(x), sh) for x in (t, band, valid))
    got_m = np.asarray(jax.jit(_sharded_seg_ids(0.5, False))(*args_m))
    ok = bool((direct == got_m).all())
    rows.append({"check": "spmd_1dev_mesh_vs_direct", "ok": ok,
                 "mismatches": int((direct != got_m).sum())})
    print("spmd 1-dev mesh smoke ok:", ok, flush=True)

    OUT.parent.mkdir(exist_ok=True)
    with open(OUT, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
