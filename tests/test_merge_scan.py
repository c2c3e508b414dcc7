"""Pallas batched merge scan == the XLA fused-scan path, exactly."""

import numpy as np
import pytest

import jax.numpy as jnp

from applecider_tpu.ops.merge_scan import seg_ids_pallas, seg_ids_scan_reference


def _case(rng, B, P):
    t = np.sort(rng.uniform(0, 30, (B, P)), axis=1).astype(np.float32)
    n_valid = rng.integers(0, P + 1, B)
    valid = np.arange(P)[None, :] < n_valid[:, None]
    t = np.where(valid, t, np.inf).astype(np.float32)
    band = rng.integers(0, 3, (B, P)).astype(np.int32)
    return jnp.asarray(t), jnp.asarray(band), jnp.asarray(valid)


@pytest.mark.parametrize("B,P", [(4, 33), (130, 64), (1, 7), (128, 192)])
def test_pallas_seg_ids_match_scan(rng, B, P):
    t, band, valid = _case(rng, B, P)
    want = np.asarray(seg_ids_scan_reference(t, band, valid, 0.5))
    got = np.asarray(seg_ids_pallas(t, band, valid, dt_days=0.5, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_seg_ids_duplicates_and_empty(rng):
    B, P = 9, 40
    t, band, valid = _case(rng, B, P)
    t = np.asarray(t).copy()
    v = np.asarray(valid).copy()
    t[0, :] = np.inf  # fully-invalid row
    v[0, :] = False
    t[1, 5] = t[1, 4]  # duplicate times
    t = jnp.asarray(t)
    valid = jnp.asarray(v)
    want = np.asarray(seg_ids_scan_reference(t, band, valid, 0.5))
    got = np.asarray(seg_ids_pallas(t, band, valid, dt_days=0.5, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pipeline_with_pallas_merge_matches_default(rng, monkeypatch):
    """ACMERGE=pallas_interpret end-to-end == the default pipeline bitwise."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import jax

    from __graft_entry__ import _fusion_task
    from bench import make_stream_samples

    from applecider_tpu.infer.stream import AlertStreamPipeline, pack_alert_batch

    task = _fusion_task(tiny=True, compute_dtype="float32")
    grid = np.linspace(4500, 7980, 128, dtype=np.float32)
    raw = pack_alert_batch(make_stream_samples(6, seed=4), max_photo=48, max_spec=128)
    variables = task.init(
        jax.random.PRNGKey(0),
        (np.zeros((2, 8, 7), np.float32), np.zeros((2, 8), bool),
         np.zeros((2, 24), np.float32), np.zeros((2, 63, 63, 3), np.float32),
         np.zeros((2, 128), np.float32), np.zeros(2, np.int64)),
    )
    params = variables["params"]
    ref = np.asarray(AlertStreamPipeline(task, wave_grid=grid)(params, raw))
    monkeypatch.setenv("ACMERGE", "pallas_interpret")
    got = np.asarray(AlertStreamPipeline(task, wave_grid=grid)(params, raw))
    np.testing.assert_array_equal(got, ref)


def test_pallas_out_of_range_band_matches_reference(rng):
    t, band, valid = _case(rng, 5, 24)
    band = np.asarray(band).copy()
    band[np.asarray(valid)] = rng.integers(0, 5, int(np.asarray(valid).sum()))
    band = jnp.asarray(band.astype(np.int32))  # bands 3/4 = out of range
    want = np.asarray(seg_ids_scan_reference(t, band, valid, 0.5))
    got = np.asarray(seg_ids_pallas(t, band, valid, dt_days=0.5, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_seg_ids_under_mesh_matches_unsharded(rng):
    """The Shardy custom_partitioning rule: batch-sharded pjit execution ==
    the unsharded kernel, exactly (interpret mode on the CPU mesh)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    t, band, valid = _case(rng, 128, 48)
    ref = np.asarray(seg_ids_pallas(t, band, valid, dt_days=0.5, interpret=True))
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    sh = NamedSharding(mesh, P("data", None))
    ts, bs, vs = (jax.device_put(x, sh) for x in (t, band, valid))
    got = jax.jit(
        lambda a, b, c: seg_ids_pallas(a, b, c, dt_days=0.5, interpret=True)
    )(ts, bs, vs)
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_resolve_acmerge_defaults(monkeypatch):
    """Pallas is the TPU default (single-device AND mesh); env always wins."""
    import applecider_tpu.infer.stream as stream

    monkeypatch.delenv("ACMERGE", raising=False)
    monkeypatch.setattr(stream.jax, "default_backend", lambda: "tpu")
    assert stream._resolve_acmerge(None) == "pallas"
    assert stream._resolve_acmerge(object()) == "pallas"  # mesh: SPMD rule
    monkeypatch.setattr(stream.jax, "default_backend", lambda: "cpu")
    assert stream._resolve_acmerge(None) == ""
    monkeypatch.setenv("ACMERGE", "xla")
    monkeypatch.setattr(stream.jax, "default_backend", lambda: "tpu")
    assert stream._resolve_acmerge(None) == "xla"
    monkeypatch.setenv("ACMERGE", "pallas")
    assert stream._resolve_acmerge(object()) == "pallas"  # forced under mesh
    # eager-on-CPU guard: concrete CPU-placed inputs pick the XLA path even
    # when the process default backend is TPU (the int8 calibration case)
    monkeypatch.delenv("ACMERGE", raising=False)
    import jax as _jax
    import jax.numpy as _jnp

    cpu_raw = {"photo_t": _jax.device_put(_jnp.zeros(4), _jax.devices("cpu")[0])}
    assert stream._resolve_acmerge(None, cpu_raw) == ""
    # tracers / numpy leaves fall through to the backend probe
    import numpy as _np

    assert stream._resolve_acmerge(None, {"x": _np.zeros(4)}) == "pallas"
