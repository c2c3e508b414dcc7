"""OverlappedServingFeeder: overlap machinery returns EXACTLY the serial
router's outputs, thread and process modes, including raw-stamp decode.
"""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from __graft_entry__ import _fusion_batch, _fusion_task  # noqa: E402

from applecider_tpu.infer.feeder import (  # noqa: E402
    OverlappedServingFeeder,
    assemble_samples,
    pipeline_model,
)
from applecider_tpu.infer.stream import FusedSpectraStream  # noqa: E402


@pytest.fixture(scope="module")
def served():
    task = _fusion_task(tiny=True, compute_dtype="float32")
    params = task.init(jax.random.PRNGKey(0),
                       _fusion_batch(4, tiny=True))["params"]
    grid = np.linspace(4500.0, 7980.0, 128).astype(np.float32)
    router = FusedSpectraStream(task, spec_buckets=(0, 2, 4, 8),
                                wave_grid=grid)
    return params, router


def _mk_records(rng, n, with_stamps=True):
    from applecider_tpu.preprocessing.fitsio import write_fits_image

    records = []
    for i in range(n):
        P = int(rng.integers(10, 24))
        r = {
            "photo_t": np.sort(rng.uniform(0, 30, P)).astype(np.float32),
            "photo_flux": rng.uniform(1, 100, P).astype(np.float32),
            "photo_err": rng.uniform(0.1, 2, P).astype(np.float32),
            "photo_band": rng.integers(0, 3, P).astype(np.int32),
            "meta19": rng.normal(size=19).astype(np.float32),
        }
        img = rng.normal(size=(63, 63, 3)).astype(np.float32)
        if with_stamps:
            r["stamps"] = [write_fits_image(img[:, :, c]) for c in range(3)]
        else:
            r["image"] = img
        if rng.random() < 0.4:
            r["spec_wl"] = np.sort(rng.uniform(4000, 8500, 60)).astype(np.float32)
            r["spec_flux"] = rng.normal(size=60).astype(np.float32)
        records.append(r)
    return records


def test_assemble_decodes_stamps(rng):
    records = _mk_records(rng, 3)
    samples = assemble_samples(records)
    assert all("image" in s and "stamps" not in s for s in samples)
    # decode round-trips the pixel values (FITS stores f32 exactly)
    direct = _mk_records(np.random.default_rng(0), 1)
    from applecider_tpu.native import decode_stamps_batch

    imgs, ok = decode_stamps_batch(direct[0]["stamps"])
    assert ok.all()


def test_feeder_thread_matches_serial(rng, served):
    params, router = served
    batches = [_mk_records(rng, 5) for _ in range(4)]
    want = [np.asarray(router(params, assemble_samples(rb),
                              length_buckets=(32,)))
            for rb in batches]

    feeder = OverlappedServingFeeder(router, params, n_workers=2, depth=2,
                                     length_buckets=(32,))
    got = list(feeder.serve(iter(batches)))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=2e-5, atol=2e-6)

    # on_result fires once per batch, in order
    seen = []
    got2 = list(feeder.serve(iter(batches), on_result=lambda a: seen.append(a.shape[0])))
    assert seen == [len(b) for b in batches]
    for g, w in zip(got2, want):
        np.testing.assert_allclose(g, w, rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_feeder_process_matches_serial(rng, served):
    """Process mode: decode + host pack in spawn workers, device_put +
    dispatch on the main process (the multi-core deployment shape)."""
    params, router = served
    batches = [_mk_records(rng, 4) for _ in range(3)]
    want = [np.asarray(router(params, assemble_samples(rb),
                              length_buckets=(32,)))
            for rb in batches]
    feeder = OverlappedServingFeeder(router, params, n_workers=2, depth=2,
                                     mode="process", length_buckets=(32,))
    got = list(feeder.serve(iter(batches)))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=2e-5, atol=2e-6)


def test_pipeline_model_cores_to_saturate():
    m = pipeline_model(host_per_core_alerts_per_sec=6000.0,
                       device_alerts_per_sec=13400.0, n_cores=1)
    assert m["binding_stage"] == "host"
    assert m["projected_alerts_per_sec"] == 6000.0
    assert m["cores_to_saturate"] == 3  # ceil(13400/6000)
    m4 = pipeline_model(6000.0, 13400.0, n_cores=4)
    assert m4["binding_stage"] == "device"
    assert m4["projected_alerts_per_sec"] == 13400.0
    # a slow H2D link binds before the chip
    mh = pipeline_model(6000.0, 13400.0, n_cores=4,
                        h2d_alerts_per_sec=2000.0)
    assert mh["binding_stage"] == "h2d"
    assert mh["cores_to_saturate"] == 1  # ceil(2000/6000)
