"""Opt-in int8 PTQ serving: calibrate -> quantized pipeline ~= f32 pipeline."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from applecider_tpu.infer.stream import AlertStreamPipeline, pack_alert_batch
from applecider_tpu.ops.quant import (
    calibrate,
    quant_error_report,
    quantized,
)

GRID = np.linspace(4500, 7980, 128, dtype=np.float32)


def _samples(rng, n, with_spec=True):
    out = []
    for _ in range(n):
        P = int(rng.integers(10, 28))
        s = {
            "photo_t": np.sort(rng.uniform(0, 30, P)).astype(np.float32),
            "photo_flux": rng.uniform(1, 100, P).astype(np.float32),
            "photo_err": rng.uniform(0.1, 2, P).astype(np.float32),
            "photo_band": rng.integers(0, 3, P).astype(np.int32),
            "image": rng.normal(size=(63, 63, 3)).astype(np.float32),
            "meta19": rng.normal(size=19).astype(np.float32),
        }
        if with_spec and rng.random() < 0.5:
            s["spec_wl"] = np.sort(rng.uniform(4000, 8500, 90)).astype(np.float32)
            s["spec_flux"] = rng.normal(size=90).astype(np.float32)
        out.append(s)
    return out


def test_int8_linear_matches_f32_within_quant_error(rng):
    from applecider_tpu.models.layers import Linear

    x = rng.normal(size=(32, 64)).astype(np.float32)
    mod = Linear(48)
    variables = mod.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(mod.apply(variables, x))
    scales = calibrate(lambda b: mod.apply(variables, b), [x])
    assert len(scales) == 1
    with quantized(scales):
        got = np.asarray(mod.apply(variables, x))
    # symmetric 8-bit: error bounded by ~(s_in*s_w)/127 per mac, tiny vs signal
    assert np.max(np.abs(got - ref)) < 0.05 * np.max(np.abs(ref))
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.999


def test_quantized_pipeline_close_to_f32(rng):
    from __graft_entry__ import _fusion_task

    task = _fusion_task(tiny=True, compute_dtype="float32")
    raws = [pack_alert_batch(_samples(rng, 6), max_photo=32, max_spec=128)
            for _ in range(2)]
    variables = task.init(
        jax.random.PRNGKey(0),
        (np.zeros((2, 8, 7), np.float32), np.zeros((2, 8), bool),
         np.zeros((2, 24), np.float32), np.zeros((2, 63, 63, 3), np.float32),
         np.zeros((2, len(GRID)), np.float32), np.zeros(2, np.int64)),
    )
    params = variables["params"]
    f32_pipe = AlertStreamPipeline(task, wave_grid=GRID)
    ref = np.asarray(f32_pipe(params, raws[0]))

    scales = f32_pipe.calibrate(params, raws)
    assert len(scales) > 10  # every Linear/conv saw an input
    q_pipe = AlertStreamPipeline(task, wave_grid=GRID, quantize_scales=scales)
    got = np.asarray(q_pipe(params, raws[0]))

    assert got.shape == ref.shape
    np.testing.assert_allclose(got.sum(axis=1), 1.0, rtol=1e-4)
    rep = quant_error_report(ref, got)
    assert rep["top1_agreement"] >= 5 / 6  # at most one flip on 6 samples
    assert rep["mean_abs_prob_diff"] < 0.03

    # the compiled graph really is int8: i8 tensors + i32 accumulation
    hlo = jax.jit(q_pipe._forward).lower(params, raws[0]).as_text()
    assert "xi8>" in hlo and "xi32>" in hlo, "no int8 ops in the lowered module"
    # and the f32 pipeline has none
    hlo_f32 = jax.jit(f32_pipe._forward).lower(params, raws[0]).as_text()
    assert "xi8>" not in hlo_f32


def test_empty_scales_is_exact_f32(rng):
    from __graft_entry__ import _fusion_task

    task = _fusion_task(tiny=True, compute_dtype="float32")
    raw = pack_alert_batch(_samples(rng, 4), max_photo=32, max_spec=128)
    variables = task.init(
        jax.random.PRNGKey(0),
        (np.zeros((2, 8, 7), np.float32), np.zeros((2, 8), bool),
         np.zeros((2, 24), np.float32), np.zeros((2, 63, 63, 3), np.float32),
         np.zeros((2, len(GRID)), np.float32), np.zeros(2, np.int64)),
    )
    params = variables["params"]
    ref = np.asarray(AlertStreamPipeline(task, wave_grid=GRID)(params, raw))
    # scales present but empty: every layer falls back to the float path
    got = np.asarray(
        AlertStreamPipeline(task, wave_grid=GRID, quantize_scales={"nope": 1.0})(params, raw)
    )
    np.testing.assert_array_equal(got, ref)
