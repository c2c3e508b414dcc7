"""In-model A/B of the depthwise-conv implementations (ACDWCONV) on the
full img_meta encoder and full fusion forward at serving batch.

tpu_dw_matmul_ab.py measured the banded-matmul reformulation beating the
grouped conv standalone at every ConvNeXt stage shape (e.g. 1.46 vs
2.54 ms at 15x15x96, B=1024) and the 1x1 center-tap identity exact. But
standalone timings at ~1-2 ms are launch-overhead-heavy; the in-model
number on the jitted encoder decides the `auto` default. Relay
measurement rules (KERNEL_NOTES) throughout.

Run: nohup python -u scripts/tpu_dw_inmodel_ab.py > /tmp/dwi.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

from bench import _block  # noqa: E402


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timeit(fn, *args, iters=24):
    _block(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _block(out)
    return round((time.perf_counter() - t0) / iters * 1e3, 3)


def main() -> None:
    from __graft_entry__ import _fusion_batch, _fusion_task

    dev = jax.devices()[0]
    bs = int(os.environ.get("PROBE_BS", "1024"))
    emit(stage="device", device=str(dev), batch=bs)
    rng = np.random.default_rng(0)

    task = _fusion_task(tiny=False, compute_dtype="bfloat16")
    variables = task.init(jax.random.PRNGKey(0), _fusion_batch(batch_size=8))
    params = jax.device_put(variables["params"])
    module = task.module
    image = jnp.asarray(
        rng.normal(size=(bs, 63, 63, 3)).astype(np.float32), jnp.bfloat16)
    metadata = jnp.asarray(rng.normal(size=(bs, 24)).astype(np.float32))

    outs = {}
    for impl in ("conv", "auto", "matmul", "center"):
        os.environ["ACDWCONV"] = impl

        def img_meta(p, md, im):
            return module.apply(
                {"params": p}, md, im,
                method=lambda mod, m_, i_: mod.img_meta_encoder(
                    m_, i_, deterministic=True))

        f = jax.jit(img_meta)
        outs[impl] = np.asarray(f(params, metadata, image), np.float32)
        rel = float(np.max(np.abs(outs[impl] - outs["conv"]))
                    / (np.max(np.abs(outs["conv"])) + 1e-9))
        emit(impl=impl, img_meta_ms=timeit(f, params, metadata, image),
             rel_err_vs_conv=round(rel, 6))


if __name__ == "__main__":
    main()
