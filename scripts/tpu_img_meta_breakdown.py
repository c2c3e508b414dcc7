"""Inside the img_meta encoder: ConvNeXt backbone vs metadata towers/MoE,
plus a depthwise-conv implementation A/B at each stage's shape.

The stage breakdown (tpu_stage_breakdown.py) showed img_meta at ~16 ms of
the 25 ms bucket-64 serving step (B=1024) — ~10% MFU for a ConvNeXt-tiny
at 63x63. This probe locates the time inside it and A/Bs the 7x7
depthwise conv (conv_general_dilated, feature_group_count=C) against a
shift-and-add unroll (49 rolled elementwise FMAs, pure VPU) at the four
stage shapes. Relay measurement rules throughout.

Run: nohup python -u scripts/tpu_img_meta_breakdown.py > /tmp/imb.log 2>&1 &
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


def dw_conv(x, kernel):
    """7x7 depthwise via conv_general_dilated (the ConvNeXt block path)."""
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=[(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


def dw_shift_add(x, kernel):
    """7x7 depthwise as 49 padded-slice FMAs (no conv op; VPU elementwise).

    kernel: (7, 7, 1, C). Zero-pad H/W by 3 and accumulate shifted windows.
    """
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    acc = jnp.zeros_like(x, dtype=jnp.float32)
    for dh in range(7):
        for dw_ in range(7):
            w = kernel[dh, dw_, 0]  # (C,)
            acc = acc + xp[:, dh:dh + H, dw_:dw_ + W, :].astype(jnp.float32) * w
    return acc.astype(x.dtype)


def main() -> None:
    from __graft_entry__ import _fusion_batch, _fusion_task

    dev = jax.devices()[0]
    bs = int(os.environ.get("PROBE_BS", "1024"))
    emit(stage="device", device=str(dev), batch=bs)
    rng = np.random.default_rng(0)

    # ---- depthwise A/B at the four stage shapes
    for (H, C) in ((15, 96), (7, 192), (3, 384)):
        x = jnp.asarray(rng.normal(size=(bs, H, H, C)).astype(np.float32), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(7, 7, 1, C)).astype(np.float32), jnp.bfloat16)
        f_conv = jax.jit(dw_conv)
        f_shift = jax.jit(dw_shift_add)
        a = np.asarray(f_conv(x, k), np.float32)
        b = np.asarray(f_shift(x, k), np.float32)
        err = float(np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9))
        emit(shape=f"{H}x{H}x{C}", rel_err=round(err, 6),
             conv_ms=timeit(f_conv, x, k), shift_add_ms=timeit(f_shift, x, k))

    # ---- module-level split
    task = _fusion_task(tiny=False, compute_dtype="bfloat16")
    variables = task.init(jax.random.PRNGKey(0), _fusion_batch(batch_size=8))
    params = jax.device_put(variables["params"])
    module = task.module
    image = jnp.asarray(
        rng.normal(size=(bs, 63, 63, 3)).astype(np.float32), jnp.bfloat16)
    metadata = jnp.asarray(rng.normal(size=(bs, 24)).astype(np.float32))

    @jax.jit
    def full(p, md, im):
        return module.apply(
            {"params": p}, md, im,
            method=lambda mod, m_, i_: mod.img_meta_encoder(m_, i_, deterministic=True))

    @jax.jit
    def towers_only(p, md):
        return module.apply(
            {"params": p}, md, None,
            method=lambda mod, m_, i_: mod.img_meta_encoder(m_, i_, deterministic=True))

    @jax.jit
    def backbone_only(p, im):
        def m(mod, i_):
            tower = mod.img_meta_encoder.variables  # noqa: F841 (bind check)
            return mod.img_meta_encoder(
                jnp.zeros((i_.shape[0], 24), jnp.float32), i_, deterministic=True)
        return module.apply({"params": p}, im, method=m)

    emit(img_meta_full_ms=timeit(full, params, metadata, image),
         towers_moe_only_ms=timeit(towers_only, params, metadata),
         backbone_plus_moe_zero_meta_ms=timeit(backbone_only, params, image))


if __name__ == "__main__":
    main()
