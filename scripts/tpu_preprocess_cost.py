"""Time the device preprocess stages of the alert pipeline in isolation.

Stages: (a) merge_light_curve vmap, (b) featurize_events vmap, (c) the
1-row zero-spectrum resample, at the headline shapes. Uses the relay
measurement rules (materialize-to-sync, N queued dispatches).
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

from bench import BUCKETS, _block, make_stream_samples  # noqa: E402
from applecider_tpu.infer.stream import (  # noqa: E402
    featurize_events, merge_light_curve, pack_alert_batch, resample_spectrum,
)


def timeit(fn, args, iters=24):
    _block(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _block(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    dev = jax.devices()[0]
    bs = int(os.environ.get("PROBE_BS", "256"))
    samples = make_stream_samples(bs, seed=1, spectrum_frac=0.0)
    raw = pack_alert_batch(samples, length_buckets=BUCKETS)
    raw = {k: jax.device_put(v) for k, v in raw.items()}
    P = raw["photo_t"].shape[1]

    margs = (raw["photo_t"], raw["photo_flux"], raw["photo_err"],
             raw["photo_band"], raw["photo_valid"])
    variants = {}
    base_out = None
    for fi in ("doubling", "scan"):
        for ci in ("argsort", "rank"):
            m = jax.jit(jax.vmap(partial(
                merge_light_curve, dt_days=0.5, assume_sorted=True,
                flags_impl=fi, compact_impl=ci)))
            # numeric check BEFORE timing (relay rule: fetch first)
            out = jax.tree.map(np.asarray, m(*margs))
            if base_out is None:
                base_out = out
            else:
                for a, b in zip(base_out, out):
                    np.testing.assert_array_equal(a, b, err_msg=f"{fi}/{ci}")
            variants[f"merge_{fi}_{ci}_ms"] = round(timeit(m, margs) * 1e3, 2)
    merge = jax.jit(jax.vmap(partial(merge_light_curve, dt_days=0.5, assume_sorted=True)))
    t_merge = timeit(merge, margs)
    merged = merge(*margs)

    feat = jax.jit(jax.vmap(featurize_events))
    t_feat = timeit(feat, merged)

    grid = jnp.asarray(np.linspace(4500.0, 7980.0, 3481, dtype=np.float32))
    res1 = jax.jit(jax.vmap(partial(resample_spectrum, grid=grid, assume_sorted=True)))
    z = (jnp.zeros((1, 512)), jnp.zeros((1, 512)), jnp.zeros((1, 512), bool))
    t_res1 = timeit(res1, z)

    both = jax.jit(lambda *a: feat(*merge(*a)))
    t_both = timeit(both, margs)

    print(json.dumps({
        "batch": bs, "photo_len": int(P),
        **variants,
        "merge_auto_ms": round(t_merge * 1e3, 2),
        "merge_ms": round(t_merge * 1e3, 2),
        "featurize_ms": round(t_feat * 1e3, 2),
        "merge_plus_featurize_fused_ms": round(t_both * 1e3, 2),
        "resample_1row_ms": round(t_res1 * 1e3, 2),
        "device": str(dev),
    }), flush=True)


if __name__ == "__main__":
    main()
