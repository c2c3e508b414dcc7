"""A/B the Pallas fused attention kernel inside the SERVING path at b1024.

tpu_results/fwd_split_r3.jsonl showed the photometry transformer is
25.7 ms of the 50.9 ms spectrum-free b1024 program (~2% MFU): the
(B, H, L, L) score tensors' HBM round-trips, not FLOPs. The Pallas kernel
(ops/attention.py) keeps scores in VMEM. Serving runs deterministic, so
the kernel is eligible (training keeps XLA: dropout > 0).

Measures, honest relay sync:
  raw kernel at (1024, 8, 194, 16)
  photometry encoder forward, xla vs pallas
  full fused no-spectra program, xla vs pallas
plus a numeric cross-check (fetched BEFORE timing, relay rule).

Run: nohup python -u scripts/tpu_attn_serving_ab.py > /tmp/attn_ab.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

from bench import _block, _timed_loop, make_stream_samples  # noqa: E402
from __graft_entry__ import _fusion_batch, _fusion_task  # noqa: E402
from applecider_tpu.infer.stream import FusedSpectraStream  # noqa: E402

OUT = REPO / "tpu_results" / "attn_serving_ab_r3.jsonl"
B, BUCKET, ITERS = 1024, 192, 16
rows = []


def emit(**kw):
    rows.append(kw)
    print(json.dumps(kw), flush=True)


def timeit(fn, args, iters=ITERS):
    _block(fn(*args))
    return round(_timed_loop(fn, [args], iters) / iters * 1e3, 2)


def make_task(impl: str):
    from applecider_tpu.config import load_defaults
    from applecider_tpu.models.fusion import AppleCiderTask

    cfg = load_defaults()
    cfg.set("train.compute_dtype", "bfloat16")
    cfg.set("model.BaselineCLS.attention_impl", impl)
    return AppleCiderTask(cfg)


def main() -> None:
    dev = jax.devices()[0]
    from ml_dtypes import bfloat16 as np_bf16

    # --- raw kernel A/B at the serving shape
    import bench_kernels

    bench_kernels.bench_attention(batch=B, heads=8, seq=194, head_dim=16)

    samples = make_stream_samples(B, seed=5, spectrum_frac=0.0)
    base = _fusion_task(tiny=False, compute_dtype="bfloat16")
    params = jax.device_put(
        base.init(jax.random.PRNGKey(0), _fusion_batch(8))["params"], dev)

    outs = {}
    for impl in ("xla", "pallas"):
        task = make_task(impl)
        router = FusedSpectraStream(task)
        placed = router.place(samples, length_buckets=(BUCKET,),
                              image_dtype=np_bf16, device=dev)

        # photometry encoder alone (featurized input from the xla preprocess)
        full = jax.jit(router.pipe._forward)
        probs = np.asarray(full(params, placed))  # fetch BEFORE timing
        outs[impl] = probs
        emit(stage=f"full_frac0_{impl}", ms=timeit(full, (params, placed)),
             batch=B, bucket=BUCKET, device=str(dev))

    diff = float(np.max(np.abs(outs["xla"].astype(np.float32)
                               - outs["pallas"].astype(np.float32))))
    emit(check="probs_max_abs_diff_xla_vs_pallas", value=diff)

    # --- photometry encoder standalone
    from applecider_tpu.infer.stream import featurize_events, merge_light_curve
    from applecider_tpu.ops.merge_scan import seg_ids_pallas
    import jax.numpy as jnp
    from functools import partial

    task = make_task("xla")
    router = FusedSpectraStream(task)
    pipe = router.pipe
    placed = router.place(samples, length_buckets=(BUCKET,),
                          image_dtype=np_bf16, device=dev)

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
        feats, pad_mask, _ = jax.vmap(featurize_events)(
            t_m, f_m, e_m, band_m, valid_m)
        cont = (feats[..., :4] - pipe.mean) / (pipe.std + 1e-8)
        return jnp.concatenate([cont, feats[..., 4:]], axis=-1), pad_mask

    photometry, pad_mask = preprocess(placed)
    _block((photometry, pad_mask))
    for impl in ("xla", "pallas"):
        mod = make_task(impl).module
        fn = jax.jit(lambda p, x, m, mod=mod: mod.photometry_encoder.apply(
            {"params": p}, x, m, deterministic=True))
        emit(stage=f"photometry_encoder_{impl}",
             ms=timeit(fn, (params["photometry_encoder"], photometry, pad_mask)))

    OUT.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
