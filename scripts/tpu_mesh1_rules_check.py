"""On-chip Shardy-rule registration check (VERDICT r3 'do this' #4).

The partitioned kernel wrappers (``ops/merge_scan._sharded_seg_ids``,
``ops/flash_attention._sharded_bits`` / ``_sharded_prng``) are gated on
``jax.device_count() > 1`` in production, so on the single-chip rig they
never execute on hardware. This probe calls them DIRECTLY under a
1-device ``jax.sharding.Mesh`` on the TPU: the ``custom_partitioning``
registration, sharding-rule parse, and partitioned lowering all run on
the real backend, and outputs must equal the ungated single-device calls.

    python scripts/tpu_mesh1_rules_check.py   # appends tpu_results/mesh1_rules_r4.jsonl
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

    dev = jax.devices()[0]
    mesh = Mesh(np.array([dev]).reshape(1, 1), ("data", "model"))
    out_path = REPO / "tpu_results" / "mesh1_rules_r4.jsonl"
    results = []

    # ---- merge-scan seg_ids rule
    from applecider_tpu.ops.merge_scan import _seg_ids_impl, _sharded_seg_ids

    rng = np.random.default_rng(0)
    B, Pn = 64, 48
    t = np.sort(rng.uniform(0, 30, (B, Pn)).astype(np.float32), axis=1)
    band = rng.integers(0, 3, (B, Pn)).astype(np.int32)
    valid = rng.random((B, Pn)) < 0.9
    t = np.where(valid, t, np.inf).astype(np.float32)

    sh = NamedSharding(mesh, P("data", None))
    args = tuple(jax.device_put(x, sh) for x in (t, band, valid))
    t0 = time.perf_counter()
    got = jax.jit(_sharded_seg_ids(0.5, False))(*args)
    got = np.asarray(got)
    ref = np.asarray(_seg_ids_impl(
        jnp.asarray(t), jnp.asarray(band), jnp.asarray(valid), 0.5, False))
    ok = bool((got == ref).all())
    results.append({"check": "merge_scan_sharded_mesh1", "ok": ok,
                    "secs": round(time.perf_counter() - t0, 1)})
    print(results[-1], flush=True)

    # ---- flash-attention injected-bits rule (fwd)
    from applecider_tpu.ops.flash_attention import (_bits_call, _drop_consts,
                                                    _fwd_cost,
                                                    _fwd_kernel_bits,
                                                    _sharded_bits)

    B, H, L, hd = 8, 2, 64, 32
    q, k, v = (rng.normal(size=(B, H, L, hd)).astype(np.float32) for _ in range(3))
    mask_i32 = (rng.random((B, 1, L)) < 0.2).astype(np.int32)
    bits = rng.integers(0, 256, (B, H, L, L), dtype=np.uint8)
    rate = 0.25
    scale = 1.0 / np.sqrt(hd)
    thresh, drop_scale = _drop_consts(rate)

    sh4 = NamedSharding(mesh, P("data", None, None, None))
    sh3 = NamedSharding(mesh, P("data", None, None))
    qs, ks, vs, bs = (jax.device_put(x, sh4) for x in (q, k, v, bits))
    ms = jax.device_put(mask_i32, sh3)
    t0 = time.perf_counter()
    got = jax.jit(_sharded_bits("fwd", float(scale), thresh, drop_scale, False))(
        qs, ks, vs, ms, bs)
    got = np.asarray(got)
    import jax as _jax

    ref = np.asarray(_bits_call(
        _fwd_kernel_bits, _jax.numpy.asarray(q), _jax.numpy.asarray(k),
        _jax.numpy.asarray(v), _jax.numpy.asarray(mask_i32),
        _jax.numpy.asarray(bits),
        out_shapes=_jax.ShapeDtypeStruct((B, H, L, hd), np.float32),
        scale=float(scale), thresh=thresh, drop_scale=drop_scale,
        cost=_fwd_cost(B, H, L, hd), interpret=False))
    err = float(np.max(np.abs(got - ref)))
    results.append({"check": "flash_bits_sharded_mesh1", "ok": err < 1e-5,
                    "max_abs_err": err,
                    "secs": round(time.perf_counter() - t0, 1)})
    print(results[-1], flush=True)

    results.append({"device": str(dev)})
    out_path.parent.mkdir(exist_ok=True)
    with out_path.open("a") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")
    assert all(r.get("ok", True) for r in results), results


if __name__ == "__main__":
    main()
