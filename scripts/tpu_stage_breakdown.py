"""Stage breakdown of the spectrum-free serving step at the headline batch.

Times, with the relay measurement rules (materialize-to-sync, N queued
dispatches, numeric fetches before timing loops):
  (a) device preprocess: merge + featurize (vmap, TPU-routed impls)
  (b) photometry transformer encoder (BaselineCLS, d=128/8h/4L)
  (c) image+metadata encoder (ConvNeXt-tiny + 8 towers + top-2 MoE)
  (d) 1-row SpectraNet (skip_spectra broadcast)
  (e) the full fused pipeline call
at B and each photometry bucket length. Identifies the next lever after
the round's merge/median/s2d fixes.

Run: nohup python -u scripts/tpu_stage_breakdown.py > /tmp/stage_bd.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

from bench import _block, make_stream_samples  # noqa: E402
from applecider_tpu.infer.stream import (  # noqa: E402
    AlertStreamPipeline, featurize_events, merge_light_curve, pack_alert_batch,
)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timeit(fn, *args, iters=24):
    _block(fn(*args))  # compile + warm
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

    task = _fusion_task(tiny=False, compute_dtype="bfloat16")
    variables = task.init(jax.random.PRNGKey(0), _fusion_batch(batch_size=8))
    params = jax.device_put(variables["params"])
    module = task.module

    for P in (64, 128, 192):
        samples = make_stream_samples(bs, seed=1, spectrum_frac=0.0)
        raw = pack_alert_batch(samples, max_photo=P)
        raw = {k: jax.device_put(v) for k, v in raw.items()}

        pipe = AlertStreamPipeline(task, skip_spectra=True)
        t_full = timeit(lambda p, r: pipe(p, r), params, raw)

        merge = jax.jit(jax.vmap(partial(
            merge_light_curve, dt_days=0.5, assume_sorted=True)))
        margs = (raw["photo_t"], raw["photo_flux"], raw["photo_err"],
                 raw["photo_band"], raw["photo_valid"])
        pre = jax.jit(lambda *a: jax.vmap(featurize_events)(*merge(*a)))
        # numeric sanity fetch BEFORE timing (relay rule)
        feats, pad_mask, ctx = jax.tree.map(np.asarray, pre(*margs))
        assert np.isfinite(feats).all()
        t_pre = timeit(pre, *margs)

        photometry = jax.device_put(feats.astype(np.float32))
        pad_mask_d = jax.device_put(pad_mask)

        @jax.jit
        def photo_enc(p, x, m):
            return module.apply(
                {"params": p}, x, m,
                method=lambda mod, xx, mm: mod.photometry_encoder(
                    xx, mm, deterministic=True),
            )

        t_photo = timeit(photo_enc, params, photometry, pad_mask_d)

        metadata = jnp.concatenate(
            [raw["meta19"], jnp.zeros((bs, 5), jnp.float32)], axis=1)

        @jax.jit
        def img_enc(p, md, im):
            return module.apply(
                {"params": p}, md, im,
                method=lambda mod, m_, i_: mod.img_meta_encoder(
                    m_, i_, deterministic=True),
            )

        t_img = timeit(img_enc, params, metadata, raw["image"])

        zero_spec = jnp.zeros((1, 3481), jnp.float32)

        @jax.jit
        def spec_enc(p, s):
            return module.apply(
                {"params": p}, s,
                method=lambda mod, s_: mod.spectra_encoder(s_, deterministic=True),
            )

        t_spec1 = timeit(spec_enc, params, zero_spec)

        emit(bucket=P, batch=bs, full_ms=t_full, preprocess_ms=t_pre,
             photometry_encoder_ms=t_photo, img_meta_encoder_ms=t_img,
             spectra_1row_ms=t_spec1,
             unaccounted_ms=round(t_full - t_pre - t_photo - t_img - t_spec1, 3),
             alerts_per_sec=round(bs / t_full * 1e3, 1))


if __name__ == "__main__":
    main()
