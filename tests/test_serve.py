"""Production serve path: raw object dirs -> per-alert causal probabilities.

The serve adapter must (a) honor the causal contract — photometry cut at
each alert's jd, spectrum attached only once taken — and (b) produce
EXACTLY the probabilities of the monolithic ``AlertStreamPipeline`` on the
same samples (binning/fusing only reorder batch membership; reference
per-alert loop ``brew_cider.py:1134-1193``)."""

import json
import numpy as np
import pytest

from applecider_tpu.infer.serve import (
    alert_samples_for_object,
    iter_alert_samples,
    serve_alert_stream,
)
from applecider_tpu.testing import make_corpus

GRID = np.linspace(4500, 7980, 128, dtype=np.float32)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    data_dir, labels_csv = make_corpus(
        root, n_objects=5, seed=7, n_photometry=24, n_alerts=5
    )
    return data_dir


def test_alert_samples_causal(corpus):
    pairs = list(alert_samples_for_object("ZTFSYN0000", corpus))
    assert len(pairs) > 0
    prev_jd, prev_n = -np.inf, 0
    spec_seen = False
    for info, s in pairs:
        assert info["jd"] >= prev_jd
        assert info["n_photometry"] >= prev_n  # causal prefix grows with jd
        prev_jd, prev_n = info["jd"], info["n_photometry"]
        assert s["image"].shape == (63, 63, 3)
        assert s["meta19"].shape == (19,)
        assert len(s["photo_t"]) == info["n_photometry"]
        assert np.all(np.diff(s["photo_t"]) >= 0)
        if spec_seen:  # once available, the spectrum never detaches
            assert info["has_spectrum"]
        spec_seen = spec_seen or info["has_spectrum"]


def test_serve_matches_monolithic_pipeline(corpus):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from __graft_entry__ import _fusion_task

    from applecider_tpu.infer.stream import AlertStreamPipeline, pack_alert_batch

    task = _fusion_task(tiny=True, compute_dtype="float32")
    pairs = list(iter_alert_samples(corpus))
    assert len(pairs) >= 10
    samples = [s for _, s in pairs]
    raw = pack_alert_batch(samples, max_photo=64, max_spec=512)
    import jax

    variables = task.init(
        jax.random.PRNGKey(0),
        (np.zeros((2, 8, 7), np.float32), np.zeros((2, 8), bool),
         np.zeros((2, 24), np.float32), np.zeros((2, 63, 63, 3), np.float32),
         np.zeros((2, len(GRID)), np.float32), np.zeros(2, np.int64)),
    )
    params = variables["params"]
    oracle = np.asarray(AlertStreamPipeline(task, wave_grid=GRID)(params, raw))

    for binned in (True, False):
        summary = serve_alert_stream(
            task, params, iter(pairs), batch_size=4, binned=binned,
            length_buckets=(16, 32, 64), wave_grid=GRID,
        )
        assert summary["n_alerts"] == len(pairs)
        got = np.stack([r["probs"] for r in summary["results"]])
        np.testing.assert_allclose(got, oracle, rtol=2e-5, atol=2e-6)
        for rec, (info, _) in zip(summary["results"], pairs):
            assert rec["object_id"] == info["object_id"]
            assert rec["jd"] == info["jd"]


def test_serve_writes_jsonl(corpus, tmp_path):
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import jax

    from __graft_entry__ import _fusion_task

    task = _fusion_task(tiny=True, compute_dtype="float32")
    pairs = list(iter_alert_samples(corpus, obj_ids=["ZTFSYN0001"]))
    variables = task.init(
        jax.random.PRNGKey(0),
        (np.zeros((2, 8, 7), np.float32), np.zeros((2, 8), bool),
         np.zeros((2, 24), np.float32), np.zeros((2, 63, 63, 3), np.float32),
         np.zeros((2, len(GRID)), np.float32), np.zeros(2, np.int64)),
    )
    out = tmp_path / "alerts.jsonl"
    summary = serve_alert_stream(
        task, variables["params"], iter(pairs), batch_size=4,
        length_buckets=(16, 32, 64), wave_grid=GRID, out_jsonl=out,
    )
    rows = [json.loads(ln) for ln in out.read_text().splitlines()]
    assert len(rows) == summary["n_alerts"] == len(pairs)
    assert all(len(r["probs"]) == 5 for r in rows)
    assert abs(sum(rows[0]["probs"]) - 1.0) < 1e-4


def test_serve_int8_close_to_f32(corpus):
    """serve(int8=True) auto-calibrates on the leading alerts and serves the
    WHOLE stream (incl. those alerts) through the quantized router, close to
    the f32 pipeline's probabilities."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import jax

    from __graft_entry__ import _fusion_task

    from applecider_tpu.ops.quant import quant_error_report

    task = _fusion_task(tiny=True, compute_dtype="float32")
    pairs = list(iter_alert_samples(corpus))
    variables = task.init(
        jax.random.PRNGKey(0),
        (np.zeros((2, 8, 7), np.float32), np.zeros((2, 8), bool),
         np.zeros((2, 24), np.float32), np.zeros((2, 63, 63, 3), np.float32),
         np.zeros((2, len(GRID)), np.float32), np.zeros(2, np.int64)),
    )
    params = variables["params"]
    kw = dict(batch_size=4, length_buckets=(16, 32, 64), wave_grid=GRID)
    ref = serve_alert_stream(task, params, iter(pairs), **kw)
    got = serve_alert_stream(task, params, iter(pairs), int8=True,
                             calib_alerts=8, **kw)
    assert got["n_alerts"] == ref["n_alerts"] == len(pairs)
    rep = quant_error_report(
        np.stack([r["probs"] for r in ref["results"]]),
        np.stack([r["probs"] for r in got["results"]]),
    )
    assert rep["mean_abs_prob_diff"] < 0.02
    assert rep["top1_agreement"] >= 0.9


def test_long_spectrum_decimated_full_range():
    """Spectra longer than the packed width are bin-averaged over the FULL
    wavelength range, never truncated to a blue stub."""
    import pandas as pd

    from applecider_tpu.infer.serve import _raw_spectrum

    wl = np.linspace(3500.0, 9500.0, 2000)
    fx = np.sin(wl / 300.0)
    df = pd.DataFrame({"wavelength": wl, "flux": fx})
    out = _raw_spectrum(df, max_points=512)
    assert out is not None
    w, f = out
    assert w.shape == (512,) and f.shape == (512,)
    assert w[0] < 3520 and w[-1] > 9480  # full range survives
    assert np.all(np.diff(w) > 0)
    # bin means track the underlying signal
    np.testing.assert_allclose(f, np.sin(w / 300.0), atol=0.02)
    # short spectra pass through untouched
    w2, f2 = _raw_spectrum(pd.DataFrame({"wavelength": wl[:100], "flux": fx[:100]}))
    assert w2.shape == (100,)
    np.testing.assert_allclose(f2, fx[:100], rtol=1e-6)


def test_runtime_serve_falls_back_to_dataset_stats(tmp_path, monkeypatch):
    """[serve] without stats_event_path must reuse the fusion dataset's
    training stats — serve and infer normalize identically."""
    import applecider_tpu.infer.serve as serve_mod
    from applecider_tpu.datasets.fusion_dataset import FusionDataset
    from applecider_tpu.train.runtime import AppleCiderRuntime

    stats = tmp_path / "stats.npz"
    np.savez(stats, mean=np.arange(4, dtype=np.float32),
             std=np.full(4, 2.0, np.float32))
    captured = {}

    def fake_serve(task, params, samples, **kw):
        captured.update(kw)
        return {"n_alerts": 0, "seconds": 0.0, "alerts_per_sec": 0.0, "results": []}

    monkeypatch.setattr(serve_mod, "serve_alert_stream", fake_serve)
    rt = AppleCiderRuntime(
        overrides={"model": {"name": "Fusion"},
                   "serve": {"data_location": str(tmp_path)},
                   "data_set": {FusionDataset.SECTION: {"stats_event_path": str(stats)}}},
        workdir=tmp_path / "results",
    )
    rt.serve(params={})
    np.testing.assert_array_equal(captured["stats_mean"], np.arange(4, dtype=np.float32))
    np.testing.assert_array_equal(captured["stats_std"], np.full(4, 2.0))


def test_export_serving_roundtrip(corpus, tmp_path):
    """export_serving serializes the raw-layout serving graph; the
    deserialized program reproduces the live pipeline's probabilities,
    including at a batch size different from export time (symbolic batch)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import jax

    from __graft_entry__ import _fusion_task

    from applecider_tpu.infer.stream import AlertStreamPipeline, pack_alert_batch
    from applecider_tpu.train.runtime import AppleCiderRuntime

    task = _fusion_task(tiny=True, compute_dtype="float32")
    pairs = list(iter_alert_samples(corpus))
    variables = task.init(
        jax.random.PRNGKey(0),
        (np.zeros((2, 8, 7), np.float32), np.zeros((2, 8), bool),
         np.zeros((2, 24), np.float32), np.zeros((2, 63, 63, 3), np.float32),
         np.zeros((2, len(GRID)), np.float32), np.zeros(2, np.int64)),
    )
    params = variables["params"]

    tiny = {
        "model": {"name": "Fusion",
                  "BaselineCLS": {"d_model": 16, "n_heads": 2, "n_layers": 1,
                                  "dropout": 0.0},
                  "SpectraNet": {"channels": [4, 8], "depths": [1, 1],
                                 "kernel_sizes_per_stage": [[3, 7], [3, 5]]},
                  "AstroMiNN": {"backbone_depths": [1, 1],
                                "backbone_dims": [8, 16]}},
        "train": {"compute_dtype": "float32"},
    }
    rt = AppleCiderRuntime(overrides=tiny, workdir=tmp_path / "results")
    out = rt.export_serving(out_path=tmp_path / "exp", length_buckets=(32,),
                            max_spec=128, params=params, wave_grid=GRID)
    assert (out / "serving_P32.stablehlo").exists()

    exported = jax.export.deserialize((out / "serving_P32.stablehlo").read_bytes())
    pipe = AlertStreamPipeline(task, wave_grid=GRID)
    for n in (4, 7):  # two batch sizes — exercises the symbolic dim
        raw = pack_alert_batch([s for _, s in pairs[:n]], max_photo=32, max_spec=128)
        want = np.asarray(pipe(params, raw))
        got = np.asarray(exported.call(params, raw))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_corrupt_object_skipped_not_fatal(corpus, tmp_path):
    """A corrupt alerts.npy must skip that object with a warning, not kill
    the stream (reference skip-and-log, preprocess_multimodal.py:961-962)."""
    import shutil
    import warnings

    bad_dir = tmp_path / "raw"
    shutil.copytree(corpus, bad_dir)
    (bad_dir / "ZTFSYN0001" / "alerts.npy").write_bytes(b"not a pickle")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        pairs = list(iter_alert_samples(bad_dir))
    assert any("ZTFSYN0001" in str(x.message) for x in w)
    assert len(pairs) > 0
    assert all(i["object_id"] != "ZTFSYN0001" for i, _ in pairs)


def test_engine_serving_matches_live_serve(corpus, tmp_path):
    """engine_serving (deserialized artifact, zero model code) reproduces
    the live pipeline's per-alert probabilities over a raw directory."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import jax

    from __graft_entry__ import _fusion_task

    from applecider_tpu.infer.stream import AlertStreamPipeline, pack_alert_batch
    from applecider_tpu.train.runtime import AppleCiderRuntime

    task = _fusion_task(tiny=True, compute_dtype="float32")
    variables = task.init(
        jax.random.PRNGKey(0),
        (np.zeros((2, 8, 7), np.float32), np.zeros((2, 8), bool),
         np.zeros((2, 24), np.float32), np.zeros((2, 63, 63, 3), np.float32),
         np.zeros((2, len(GRID)), np.float32), np.zeros(2, np.int64)),
    )
    params = variables["params"]
    tiny = {
        "model": {"name": "Fusion",
                  "BaselineCLS": {"d_model": 16, "n_heads": 2, "n_layers": 1,
                                  "dropout": 0.0},
                  "SpectraNet": {"channels": [4, 8], "depths": [1, 1],
                                 "kernel_sizes_per_stage": [[3, 7], [3, 5]]},
                  "AstroMiNN": {"backbone_depths": [1, 1],
                                "backbone_dims": [8, 16]}},
        "train": {"compute_dtype": "float32"},
    }
    rt = AppleCiderRuntime(overrides=tiny, workdir=tmp_path / "results")
    exp = rt.export_serving(out_path=tmp_path / "exp", length_buckets=(32,),
                            max_spec=128, params=params, wave_grid=GRID)

    summary = rt.engine_serving(export_dir=exp, raw_path=corpus,
                                batch_size=4, params=params)
    pairs = list(iter_alert_samples(corpus))
    assert summary["n_alerts"] == len(pairs)
    raw = pack_alert_batch([s for _, s in pairs], max_photo=32, max_spec=128)
    want = np.asarray(AlertStreamPipeline(task, wave_grid=GRID)(params, raw))
    got = np.stack([r["probs"] for r in summary["results"]])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_engine_serving_concrete_fallback(corpus, tmp_path, monkeypatch):
    """When a bucket's symbolic lowering fails, export_serving falls back
    to a CONCRETE batch size — engine_serving must pad the tail batch to
    that size (and slice the pad off) instead of crashing on shape
    mismatch."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import jax

    from __graft_entry__ import _fusion_task

    from applecider_tpu.train.runtime import AppleCiderRuntime

    task = _fusion_task(tiny=True, compute_dtype="float32")
    variables = task.init(
        jax.random.PRNGKey(0),
        (np.zeros((2, 8, 7), np.float32), np.zeros((2, 8), bool),
         np.zeros((2, 24), np.float32), np.zeros((2, 63, 63, 3), np.float32),
         np.zeros((2, len(GRID)), np.float32), np.zeros(2, np.int64)),
    )
    params = variables["params"]
    tiny = {
        "model": {"name": "Fusion",
                  "BaselineCLS": {"d_model": 16, "n_heads": 2, "n_layers": 1,
                                  "dropout": 0.0},
                  "SpectraNet": {"channels": [4, 8], "depths": [1, 1],
                                 "kernel_sizes_per_stage": [[3, 7], [3, 5]]},
                  "AstroMiNN": {"backbone_depths": [1, 1],
                                "backbone_dims": [8, 16]}},
        "train": {"compute_dtype": "float32"},
        "serve": {"data_location": str(corpus), "batch_size": 4},
    }
    rt = AppleCiderRuntime(overrides=tiny, workdir=tmp_path / "results")
    # force every bucket onto the concrete-batch fallback path
    monkeypatch.setattr(
        jax.export, "symbolic_shape",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("forced")),
    )
    out = rt.export_serving(out_path=tmp_path / "exp", length_buckets=(32,),
                            max_spec=128, params=params, wave_grid=GRID)
    meta = json.loads((out / "serving_meta.json").read_text())
    assert meta["buckets"]["32"]["symbolic_batch"] is False
    # batch_size 3 < concrete 4 and the stream size isn't divisible either
    summary = rt.engine_serving(export_dir=out, raw_path=corpus,
                                batch_size=3, params=params)
    assert summary["n_alerts"] > 0
    assert all(np.all(np.isfinite(r["probs"])) for r in summary["results"])


def test_warmup_verb_precompiles_bucket_set(tmp_path):
    """``warmup()`` compiles the configured (length-bucket, spectra-frac)
    serving programs without a trained run (compile-only weights) and
    reports per-shape times — the fresh-host deployment story
    (docs/SERVING.md)."""
    from applecider_tpu.train.runtime import AppleCiderRuntime

    overrides = {
        "model": {
            "name": "AppleCider",
            "BaselineCLS": {"d_model": 16, "n_heads": 2, "n_layers": 1,
                            "dropout": 0.0},
            "SpectraNet": {"channels": [4, 8], "depths": [1, 1],
                           "kernel_sizes_per_stage": [[3, 7], [3, 5]]},
            "AstroMiNN": {"backbone_depths": [1, 1],
                          "backbone_dims": [8, 16]},
        },
        "train": {"compute_dtype": "float32"},
        "serve": {"batch_size": 4, "length_buckets": [32, 64]},
    }
    rt = AppleCiderRuntime(overrides=overrides, workdir=tmp_path)
    result = rt.warmup(spectrum_fracs=(0.0, 1.0))
    assert len(result["programs"]) == 4  # 2 buckets x 2 fracs
    assert all(p["seconds"] > 0 for p in result["programs"])
    assert result["total_seconds"] > 0
