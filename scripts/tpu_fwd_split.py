"""Decompose the spectrum-free serving step at B=1024, bucket 192.

The no-spectra pipeline runs ~18.6k alerts/s (55 ms/batch) and bounds the
frac-0.3 headline together with the spectra block. This probe times each
stage of the fused program as its own jitted dispatch (honest relay sync:
queue N, fetch one scalar of the last) to rank the remaining levers:

  full        — the production FusedSpectraStream program
  preprocess  — pallas seg-ids + merge + featurize + normalize + meta
  photometry  — BaselineCLS transformer (d=128, 8h, 4L, L=193+1)
  img_meta    — AstroMiNN (ConvNeXt-tiny tower + 8 meta towers + MoE)
  head        — three projections + avg fusion + fc + softmax

Run: nohup python -u scripts/tpu_fwd_split.py > /tmp/fwd_split.log 2>&1 &
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

from bench import _block, _timed_loop, make_stream_samples  # noqa: E402
from __graft_entry__ import _fusion_batch, _fusion_task  # noqa: E402
from applecider_tpu.infer.stream import (  # noqa: E402
    FusedSpectraStream, featurize_events, merge_light_curve,
)
from applecider_tpu.ops.merge_scan import seg_ids_pallas  # noqa: E402

OUT = REPO / "tpu_results" / "fwd_split_r3.jsonl"
B, BUCKET, ITERS = 1024, 192, 16


def timeit(fn, args, iters=ITERS):
    _block(fn(*args))  # warm
    return round(_timed_loop(fn, [args], iters) / iters * 1e3, 2)


def main() -> None:
    dev = jax.devices()[0]
    from ml_dtypes import bfloat16 as np_bf16

    task = _fusion_task(tiny=False, compute_dtype="bfloat16")
    params = task.init(jax.random.PRNGKey(0), _fusion_batch(8))["params"]
    params = jax.device_put(params, dev)
    router = FusedSpectraStream(task)
    samples = make_stream_samples(B, seed=5, spectrum_frac=0.0)
    placed = router.place(samples, length_buckets=(BUCKET,),
                          image_dtype=np_bf16, device=dev)
    rows = []

    def emit(**kw):
        kw["device"] = str(dev)
        rows.append(kw)
        print(json.dumps(kw), flush=True)

    # --- full program
    full = jax.jit(router.pipe._forward)
    emit(stage="full", ms=timeit(full, (params, placed)),
         note=f"B={B} bucket={BUCKET} frac=0.0")

    # --- preprocess: merge + featurize + normalize + metadata concat
    pipe = router.pipe

    @jax.jit
    def preprocess(raw):
        t_sorted = jnp.where(raw["photo_valid"], raw["photo_t"], jnp.inf)
        seg = seg_ids_pallas(t_sorted, raw["photo_band"], raw["photo_valid"],
                             dt_days=pipe.dt_days)
        t_m, f_m, e_m, band_m, valid_m = jax.vmap(
            lambda t_, f_, e_, b_, v_, s_: merge_light_curve(
                t_, f_, e_, b_, v_, dt_days=pipe.dt_days,
                assume_sorted=True, seg_ids=s_)
        )(raw["photo_t"], raw["photo_flux"], raw["photo_err"],
          raw["photo_band"], raw["photo_valid"], seg)
        feats, pad_mask, ctx = jax.vmap(featurize_events)(
            t_m, f_m, e_m, band_m, valid_m)
        cont = (feats[..., :4] - pipe.mean) / (pipe.std + 1e-8)
        photometry = jnp.concatenate([cont, feats[..., 4:]], axis=-1)
        metadata = jnp.concatenate([raw["meta19"], ctx[:, [0, 1, 3, 4, 6]]], axis=1)
        return photometry, pad_mask, metadata

    emit(stage="preprocess", ms=timeit(preprocess, (placed,)))
    photometry, pad_mask, metadata = jax.jit(preprocess)(placed)
    _block((photometry, pad_mask, metadata))

    # --- submodule forwards on device-resident featurized inputs
    mod = task.module
    photo_fn = jax.jit(lambda p, x, m: mod.photometry_encoder.apply(
        {"params": p}, x, m, deterministic=True))
    emit(stage="photometry_encoder",
         ms=timeit(photo_fn, (params["photometry_encoder"], photometry, pad_mask)))

    img = placed["image"]
    im_fn = jax.jit(lambda p, md, im: mod.img_meta_encoder.apply(
        {"params": p}, md, im, deterministic=True))
    emit(stage="img_meta_encoder",
         ms=timeit(im_fn, (params["img_meta_encoder"], metadata, img)))

    # --- head: projections + fusion + fc (on dummy embeddings)
    p_e = jax.jit(photo_fn)(params["photometry_encoder"], photometry, pad_mask)
    im_e = jax.jit(im_fn)(params["img_meta_encoder"], metadata, img)
    _block((p_e, im_e))
    from applecider_tpu.models.fusion import l2_normalize

    @jax.jit
    def head(p, p_emb, im_emb):
        def lin(name, x):
            w, b = p[name]["kernel"], p[name]["bias"]
            return x.astype(w.dtype) @ w + b
        pe = l2_normalize(lin("photometry_proj", p_emb))
        ie = l2_normalize(lin("img_metadata_proj", im_emb))
        emb = (pe + ie + pe) / 3.0
        return jax.nn.softmax(lin("fc", emb).astype(jnp.float32), axis=-1)

    emit(stage="head_approx", ms=timeit(head, (params, p_e, im_e)))

    OUT.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
