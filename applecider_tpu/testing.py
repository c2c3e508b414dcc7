"""Synthetic ZTF-like fixtures.

Generates raw per-object directories honoring the reference's on-disk
contract (SURVEY L1): ``<data_dir>/<obj_id>/{photometry.csv, alerts.npy,
spectra.csv}`` plus a labels csv — alert dicts carry ``candidate`` metadata
and gzipped-FITS cutout stamps. Used by golden tests, benchmarks, and the
quickstart example; real ZTF data drops in with no code changes.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from applecider_tpu.preprocessing.fitsio import write_fits_image

CLASS_NAMES = ("SN Ia", "SN II", "Cataclysmic", "AGN", "Tidal Disruption Event")


def make_alert(rng: np.random.Generator, jd: float, fid: int, stamp_hw: int = 63) -> dict:
    mag = float(rng.uniform(16.0, 20.5))
    cand = {
        "jd": jd,
        "fid": fid,
        "magpsf": mag,
        "sigmapsf": float(rng.uniform(0.01, 0.3)),
        "ra": float(rng.uniform(0, 360)),
        "dec": float(rng.uniform(-30, 80)),
        "sgscore1": float(rng.uniform(0, 1)),
        "sgscore2": float(rng.uniform(0, 1)),
        "distpsnr1": float(rng.uniform(0, 10)),
        "distpsnr2": float(rng.uniform(0, 20)),
        "nmtchps": int(rng.integers(0, 10)),
        "sharpnr": float(rng.normal(0, 0.3)),
        "scorr": float(rng.uniform(5, 50)),
        "diffmaglim": float(rng.uniform(19, 21)),
        "sky": float(rng.normal(0, 1)),
        "ndethist": int(rng.integers(1, 100)),
        "ncovhist": int(rng.integers(100, 500)),
        "chinr": float(rng.uniform(0.5, 2.0)),
        "magnr": float(rng.uniform(15, 22)),
        "distnr": float(rng.uniform(0, 5)),
        "classtar": float(rng.uniform(0, 1)),
        "rb": float(rng.uniform(0.5, 1.0)),
        "chipsf": float(rng.uniform(0.5, 3.0)),
        "fwhm": float(rng.uniform(1.5, 4.0)),
    }
    stamps = {}
    for key in ("cutoutScience", "cutoutTemplate", "cutoutDifference"):
        img = rng.normal(size=(stamp_hw, stamp_hw)).astype(np.float32)
        stamps[key] = {"stampData": write_fits_image(img, gzip_compress=True)}
    return {"candidate": cand, **stamps}


def make_object_dir(
    root: Path,
    obj_id: str,
    rng: np.random.Generator,
    n_photometry: int = 30,
    n_alerts: int = 8,
    with_spectrum: bool = True,
    stamp_hw: int = 63,
) -> None:
    obj_dir = Path(root) / obj_id
    obj_dir.mkdir(parents=True, exist_ok=True)

    jd0 = 2459000.5 + float(rng.uniform(0, 100))
    jds = np.sort(jd0 + rng.uniform(0, 60, size=n_photometry))
    fids = rng.integers(1, 3 + 1, size=n_photometry)
    mags = rng.uniform(16, 21, size=n_photometry)
    magerrs = rng.uniform(0.01, 0.3, size=n_photometry)
    lines = ["jd,mag,magerr,fid"]
    lines += [f"{jd:.6f},{m:.4f},{me:.4f},{f}" for jd, m, me, f in zip(jds, mags, magerrs, fids)]
    (obj_dir / "photometry.csv").write_text("\n".join(lines) + "\n")

    alert_jds = np.sort(rng.choice(jds, size=min(n_alerts, n_photometry), replace=False))
    alerts = [make_alert(rng, float(jd), int(rng.integers(1, 4)), stamp_hw) for jd in alert_jds]
    np.save(obj_dir / "alerts.npy", np.asarray(alerts, dtype=object), allow_pickle=True)

    if with_spectrum:
        wl = np.linspace(4000, 8500, 300)
        flux = 1e-16 * (1.0 + 0.3 * np.sin(wl / 200.0)) + rng.normal(0, 1e-18, size=len(wl))
        spec_lines = ["wavelength,flux,mjd"]
        spec_mjd = float(jds.mean() - 2400000.5)
        spec_lines += [f"{w:.2f},{f:.6e},{spec_mjd:.5f}" for w, f in zip(wl, flux)]
        (obj_dir / "spectra.csv").write_text("\n".join(spec_lines) + "\n")


def make_corpus(
    root: Path,
    n_objects: int = 10,
    seed: int = 0,
    classes=CLASS_NAMES,
    **object_kwargs,
) -> tuple[Path, Path]:
    """Create a synthetic raw corpus; returns (data_dir, labels_csv)."""
    rng = np.random.default_rng(seed)
    root = Path(root)
    data_dir = root / "raw"
    data_dir.mkdir(parents=True, exist_ok=True)
    rows = ["object_id,type"]
    for i in range(n_objects):
        obj_id = f"ZTFSYN{i:04d}"
        make_object_dir(data_dir, obj_id, rng, **object_kwargs)
        rows.append(f"{obj_id},{classes[i % len(classes)]}")
    labels_csv = root / "labels.csv"
    labels_csv.write_text("\n".join(rows) + "\n")
    return data_dir, labels_csv
