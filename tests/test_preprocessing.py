"""Preprocessing golden tests: merge kernel, FITS, events, context, builder."""

import numpy as np
import pandas as pd
import pytest

from applecider_tpu.preprocessing.config import PreprocessConfig
from applecider_tpu.preprocessing.builder import (
    ALERT_META_KEEP,
    META_COLUMNS,
    build_multimodal_for_object,
)
from applecider_tpu.preprocessing.events import (
    EVENT_COLUMNS,
    build_event_features,
    context_features,
    event_matrix,
)
from applecider_tpu.preprocessing.fitsio import decode_stamp, read_fits_image, write_fits_image
from applecider_tpu.preprocessing.photometry import (
    dedup_prefer_first_source,
    mag_to_flux,
    merge_by_filter,
    merge_weighted,
    read_csv_photometry,
)
from applecider_tpu.testing import make_corpus, make_object_dir


# ---------------------------------------------------------------- merge kernel
def _merge_oracle(time, flux, err, dt_days, eps=1e-8):
    """Greedy windowed inverse-error-weighted collapse (reference semantics)."""
    t_out, f_out, e_out = [], [], []
    i, n = 0, len(time)
    while i < n:
        j = i
        while j + 1 < n and time[j + 1] - time[i] <= dt_days:
            j += 1
        w = 1.0 / (err[i : j + 1] + eps)
        w = w / w.sum()
        t_out.append(np.sum(w * time[i : j + 1]))
        f_out.append(np.sum(w * flux[i : j + 1]))
        e_out.append(np.sum(w * err[i : j + 1]))
        i = j + 1
    return np.asarray(t_out), np.asarray(f_out), np.asarray(e_out)


def test_merge_weighted_matches_oracle(rng):
    for _ in range(5):
        n = int(rng.integers(1, 60))
        t = np.sort(rng.uniform(0, 30, size=n))
        f = rng.uniform(1, 100, size=n)
        e = rng.uniform(0.1, 5, size=n)
        ours = merge_weighted(t, f, e, 0.5)
        ref = _merge_oracle(t, f, e, 0.5)
        for a, b in zip(ours, ref):
            np.testing.assert_allclose(a, b, rtol=1e-12)


def test_merge_single_point():
    t, f, e = merge_weighted([1.0], [2.0], [0.1], 0.5)
    assert t[0] == 1.0 and f[0] == 2.0 and e[0] == 0.1


# ---------------------------------------------------------------------- FITS
def test_fits_roundtrip(rng):
    img = rng.normal(size=(63, 63)).astype(np.float32)
    for gz in (True, False):
        decoded = decode_stamp(write_fits_image(img, gzip_compress=gz))
        np.testing.assert_allclose(decoded, img, rtol=1e-6)


def test_fits_int16_bscale():
    img = (np.arange(12, dtype=np.int16).reshape(3, 4) * 10).astype(np.int16)
    # hand-build an int16 FITS with BSCALE/BZERO
    cards = [
        "SIMPLE  =                    T",
        "BITPIX  =                   16",
        "NAXIS   =                    2",
        "NAXIS1  =                    4",
        "NAXIS2  =                    3",
        "BSCALE  =                  2.0",
        "BZERO   =                  1.0",
        "END",
    ]
    header = "".join(c.ljust(80) for c in cards)
    header += " " * (-len(header) % 2880)
    data = img.astype(">i2").tobytes()
    data += b"\x00" * (-len(data) % 2880)
    out = read_fits_image(header.encode() + data)
    np.testing.assert_allclose(out, img.astype(np.float32) * 2.0 + 1.0)


def test_decode_stamp_ndarray_passthrough():
    img = np.ones((4, 4), np.float64)
    assert decode_stamp(img).dtype == np.float32
    assert decode_stamp(b"garbage") is None
    assert decode_stamp(None) is None


# ------------------------------------------------------------------- ingest
def test_mag_to_flux_zeropoint():
    flux, ferr = mag_to_flux(23.9, 0.1)
    assert abs(flux - 1.0) < 1e-12
    np.testing.assert_allclose(ferr, 0.1 / (2.5 / np.log(10)), rtol=1e-12)


def test_dedup_prefers_csv():
    csv_tab = {
        "jd": np.array([1.0]), "mjd": np.array([1.0]), "mag": np.array([18.0]),
        "magerr": np.array([0.1]), "flux": np.array([5.0]), "flux_error": np.array([0.5]),
        "fid": np.array([1], np.int16),
    }
    alert_tab = {
        "jd": np.array([1.0 + 1e-7, 2.0]), "mjd": np.array([1.0, 2.0]),
        "mag": np.array([18.5, 19.0]), "magerr": np.array([0.2, 0.2]),
        "flux": np.array([4.0, 3.0]), "flux_error": np.array([0.4, 0.3]),
        "fid": np.array([1, 1], np.int16),
    }
    out = dedup_prefer_first_source(csv_tab, alert_tab)
    assert len(out["jd"]) == 2  # jd≈1.0 deduped (csv wins), jd=2.0 kept
    assert out["flux"][np.argmin(out["jd"])] == 5.0


# ---------------------------------------------------------------- event feats
def _merged_fixture(rng, n=40):
    mjd = np.sort(rng.uniform(0, 50, size=n))
    return {
        "mjd": mjd,
        "flux": rng.uniform(1, 200, size=n),
        "flux_error": rng.uniform(0.1, 5, size=n),
        "jd": mjd + 2459000.5,
        "fid": rng.integers(1, 4, size=n).astype(np.int16),
    }


def test_event_features_schema(rng):
    events = build_event_features(_merged_fixture(rng))
    mat = event_matrix(events)
    assert mat.shape == (40, len(EVENT_COLUMNS))
    # dt starts at zero and is monotone
    assert events["dt"][0] == 0.0
    assert (np.diff(events["dt"]) >= 0).all()
    # one-hot sums to 1
    oh = mat[:, 5:8]
    np.testing.assert_allclose(oh.sum(axis=1), 1.0)


def test_colors_match_pandas_merge_asof(rng):
    merged = _merged_fixture(rng, n=60)
    events = build_event_features(merged)
    order = np.argsort(merged["mjd"], kind="stable")
    f = np.clip(merged["flux"][order].astype(np.float32), 1e-6, None)
    mag = -2.5 * np.log10(f)
    band = merged["fid"][order] - 1
    mjd = merged["mjd"][order]

    g = pd.DataFrame({"mjd": mjd[band == 0], "m": mag[band == 0]})
    r = pd.DataFrame({"mjd": mjd[band == 1], "m": mag[band == 1]})
    if len(g) and len(r):
        g2r = pd.merge_asof(
            g.sort_values("mjd"), r.sort_values("mjd"), on="mjd",
            direction="nearest", tolerance=1.0, suffixes=("_g", "_r"),
        )
        expected = (g2r["m_g"] - g2r["m_r"]).to_numpy()
        got = events["g_r"][band == 0]
        both = np.isfinite(expected) & np.isfinite(got)
        np.testing.assert_allclose(got[both], expected[both], atol=1e-5)
        # same availability pattern
        np.testing.assert_array_equal(np.isfinite(got), np.isfinite(expected))


def test_context_features_match_bruteforce(rng):
    merged = _merged_fixture(rng, n=30)
    event_jds = np.sort(merged["jd"])
    ctx = context_features(merged, event_jds)
    for i, cut in enumerate(event_jds):
        sel = merged["jd"] <= cut
        flux = merged["flux"][sel]
        jd = merged["jd"][sel]
        mag = -2.5 * np.log10(np.clip(flux, 1e-12, None))
        peak_jd = jd[np.argmax(flux)]
        np.testing.assert_allclose(ctx[i, 0], jd.max() - peak_jd, atol=1e-9)  # days_since_peak
        np.testing.assert_allclose(ctx[i, 1], peak_jd - jd.min(), atol=1e-9)  # days_to_peak
        np.testing.assert_allclose(ctx[i, 3], mag.min(), atol=1e-9)
        np.testing.assert_allclose(ctx[i, 4], mag.max(), atol=1e-9)
        assert ctx[i, 6] == sel.sum()


# ------------------------------------------------------------------- builder
@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    return make_corpus(root, n_objects=6, seed=3, n_photometry=25, n_alerts=6)


def test_build_object_npz_schema(corpus, tmp_path):
    data_dir, labels_csv = corpus
    cfg = PreprocessConfig(data_dir=data_dir, spec_csv=labels_csv, output_root=tmp_path)
    rec = build_multimodal_for_object("ZTFSYN0000", 0, "SN Ia", tmp_path / "all", cfg)
    assert rec is not None and rec["n_events"] > 0
    with np.load(rec["filepath"], allow_pickle=True) as npz:
        keys = set(npz.files)
        assert {
            "images", "event_data", "event_columns", "meta_data", "meta_columns",
            "jd", "fid", "label", "label_str", "provenance", "spectrum",
            "spectrum_wavelength", "spectrum_dt", "spectrum_jd", "has_spectrum",
        } <= keys
        T = npz["images"].shape[0]
        assert npz["images"].shape == (T, 3, 63, 63)
        assert npz["event_data"].shape == (T, len(EVENT_COLUMNS))
        assert npz["meta_data"].shape == (T, len(META_COLUMNS))
        assert list(npz["meta_columns"][: len(ALERT_META_KEEP)]) == list(ALERT_META_KEEP)
        assert int(npz["has_spectrum"]) == 1
        assert npz["spectrum"].shape == (3481,)
        # events sorted by jd, provenance policies recorded
        assert (np.diff(npz["jd"]) >= 0).all()
        policies = {p["select_policy"] for p in npz["provenance"]}
        assert policies <= {
            "in_window_min_sigmapsf", "fallback_last_in_filter", "fallback_nearest_any"
        }
        # ra scaled to [-1, 1], dec to [-1, 1]
        meta = npz["meta_data"]
        ra_col = list(ALERT_META_KEEP).index("ra")
        valid_ra = meta[:, ra_col] != -999.0
        assert (np.abs(meta[valid_ra, ra_col]) <= 1.0 + 1e-6).all()


def test_build_object_no_spectrum(tmp_path, rng):
    data_dir = tmp_path / "raw"
    make_object_dir(data_dir, "ZTFX", rng, with_spectrum=False)
    labels = tmp_path / "labels.csv"
    labels.write_text("object_id,type\nZTFX,AGN\n")
    cfg = PreprocessConfig(data_dir=data_dir, spec_csv=labels, output_root=tmp_path)
    rec = build_multimodal_for_object("ZTFX", 0, "AGN", tmp_path / "all", cfg)
    with np.load(rec["filepath"], allow_pickle=True) as npz:
        assert int(npz["has_spectrum"]) == 0
        assert npz["spectrum"].shape == (0,)
