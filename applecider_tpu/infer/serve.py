"""Production alert-stream serving: raw object dirs -> per-alert probabilities.

This is the reference's production shape (README.md:17-19 ZTF diagram; the
archived per-alert evaluation loop ``_archive/notebooks/brew_cider.py:
1134-1193``): an alert arrives -> causal featurization of its object up to
that alert's jd (``preprocess_multimodal.py:373-396``; ``core/dataset.py:86``)
-> per-modality encoders -> fusion -> class probabilities.

The host side adapts the raw L1 contract
(``<data_dir>/<obj_id>/{photometry.csv, alerts.npy, spectra.csv}``) into the
ragged per-alert sample dicts that ``pack_alert_batch`` consumes; everything
from there on is the measured serving stack (``FusedSpectraStream`` single-
program spectrum routing + ``LengthBinnedFeeder`` homogeneous-length batches
— the configuration that benches 17.3k alerts/s device-resident at the
realistic spectra mix, ``tpu_results/bench_r3_binned.json``). Featurization
(merge/featurize/normalize/resample) runs ON DEVICE inside the jitted
pipeline, not here.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

from applecider_tpu.preprocessing.builder import ALERT_META_KEEP, _meta_vector
from applecider_tpu.preprocessing.config import JD_MJD_OFFSET
from applecider_tpu.preprocessing.fitsio import decode_stamp
from applecider_tpu.preprocessing.photometry import load_photometry
from applecider_tpu.preprocessing.spectra import (
    extract_spectrum_time_mjd,
    read_spectra_csv,
)

CUTOUT_KEYS = ("cutoutScience", "cutoutTemplate", "cutoutDifference")
N_META19 = 19
assert len(ALERT_META_KEEP) >= N_META19


def _fit_hw(plane: np.ndarray, hw: int = 63) -> np.ndarray:
    """Center pad/crop a stamp plane to (hw, hw) — live cutouts at survey
    edges arrive short (legacy ``alert_processor.py:20-33`` pads the same
    way)."""
    h, w = plane.shape
    if h == hw and w == hw:
        return plane
    out = np.zeros((hw, hw), plane.dtype)
    src_y = slice(max(0, (h - hw) // 2), max(0, (h - hw) // 2) + min(h, hw))
    src_x = slice(max(0, (w - hw) // 2), max(0, (w - hw) // 2) + min(w, hw))
    dst_y = slice(max(0, (hw - h) // 2), max(0, (hw - h) // 2) + min(h, hw))
    dst_x = slice(max(0, (hw - w) // 2), max(0, (hw - w) // 2) + min(w, hw))
    out[dst_y, dst_x] = plane[src_y, src_x]
    return out


def _alert_triplet(alert: dict, hw: int = 63) -> Optional[np.ndarray]:
    """Decode THIS alert's three cutouts into an NHWC (hw, hw, 3) image."""
    try:
        planes = [decode_stamp(alert[k]["stampData"]) for k in CUTOUT_KEYS]
    except (KeyError, TypeError, ValueError):
        return None
    if any(p is None for p in planes):
        return None
    return np.stack([_fit_hw(p.astype(np.float32), hw) for p in planes], axis=-1)


def _decode_all_triplets(alerts: list, hw: int = 63) -> list:
    """Batch-decode every alert's cutout triplet -> list of NHWC images/None.

    One call into the native multithreaded decoder (libdeflate gunzip +
    FITS parse, ``native/fits_decoder.cpp`` — measured ~5.1k alerts/s/core
    vs the per-stamp Python ladder) for all 3*n stamps of an object;
    alerts whose stamps are missing, undecodable, or non-(hw, hw) fall
    back to the per-alert ladder (which center-pads/crops)."""
    from applecider_tpu.native import decode_stamps_batch

    blobs: list = []
    for alert in alerts:
        for k in CUTOUT_KEYS:
            try:
                blob = alert[k]["stampData"]
            except (KeyError, TypeError):
                blob = None
            blobs.append(blob if isinstance(blob, (bytes, bytearray, np.ndarray))
                         else b"")
    images, ok = decode_stamps_batch(blobs, hw=hw)
    out = []
    for i, alert in enumerate(alerts):
        if ok[3 * i: 3 * i + 3].all():
            out.append(np.stack(
                [images[3 * i + j] for j in range(3)], axis=-1))
        else:
            out.append(_alert_triplet(alert, hw))  # odd sizes / real failures
    return out


def _raw_spectrum(df, max_points: int = 512) -> Optional[tuple[np.ndarray, np.ndarray]]:
    """Raw (wavelength, flux) columns; interp + MAD happen on device.

    Spectra longer than ``max_points`` (the packed spectra width — real
    instrument exports run to thousands of samples) are bin-averaged down
    to ``max_points`` segments covering the FULL wavelength range: naive
    ``[:max_points]`` truncation would keep only the bluest stub and let
    the device resample extrapolate garbage across most of the grid."""
    from applecider_tpu.infer.stream import decimate_spectrum
    from applecider_tpu.preprocessing.spectra import raw_spectrum_columns

    raw = raw_spectrum_columns(df)
    if raw is None:
        return None
    x, y = decimate_spectrum(*raw, max_points)
    return np.asarray(x, np.float32), np.asarray(y, np.float32)


def alert_samples_for_object(
    obj_id: str,
    data_dir: str | Path,
    causal_spectrum: bool = True,
    hw: int = 63,
) -> Iterator[tuple[dict, dict]]:
    """Yield ``(info, sample)`` per decodable alert of one object.

    ``sample`` follows ``pack_alert_batch``'s contract (raw ragged arrays;
    the device pipeline merges/featurizes). Causal cuts: photometry rows
    with jd <= the alert's jd; the object's spectrum rides along only when
    it was taken on or before the alert (``causal_spectrum=False`` attaches
    it unconditionally, the archived evaluate-everything behavior).

    ``info``: {object_id, jd, fid, n_photometry, has_spectrum}.
    """
    data_dir = Path(data_dir)
    alerts_path = data_dir / obj_id / "alerts.npy"
    if not alerts_path.exists():
        return
    arr = np.load(alerts_path, allow_pickle=True)
    alerts = list(arr) if isinstance(arr, np.ndarray) else arr
    photo = load_photometry(obj_id, data_dir, alerts=alerts)
    if len(photo["jd"]) == 0:
        return

    spec_df = read_spectra_csv(obj_id, data_dir)
    spec = _raw_spectrum(spec_df)
    spec_jd = None
    if spec is not None:
        spec_mjd = extract_spectrum_time_mjd(spec_df)
        spec_jd = None if spec_mjd is None else spec_mjd + JD_MJD_OFFSET

    # photometry columns, time-ascending once; per alert it's a prefix slice
    order = np.argsort(photo["jd"], kind="stable")
    jd_sorted = photo["jd"][order]
    t = photo["mjd"][order].astype(np.float32)  # rebased to first detection
    flux = photo["flux"][order].astype(np.float32)
    err = photo["flux_error"][order].astype(np.float32)
    # load_photometry guarantees fid in {1,2,3}; do NOT clip defensively —
    # an out-of-range band must reach the device merge's in_band guard
    # (stream.py) and stay unmerged, exactly like the training corpus,
    # rather than being silently folded into g-band
    band = photo["fid"][order].astype(np.int32) - 1

    cand_jd = []
    for alert in alerts:
        cand = alert.get("candidate", alert) if isinstance(alert, dict) else {}
        try:
            cand_jd.append(float(cand["jd"]))
        except (KeyError, TypeError, ValueError):
            cand_jd.append(np.nan)
    # batch-decode only the servable (finite-jd) alerts
    finite = [k for k in range(len(alerts)) if np.isfinite(cand_jd[k])]
    triplets = dict(zip(finite, _decode_all_triplets(
        [alerts[k] for k in finite], hw)))
    for k in np.argsort(np.asarray(cand_jd), kind="stable"):
        jd_a = cand_jd[k]
        if not np.isfinite(jd_a):
            continue
        alert = alerts[k]
        image = triplets[k]
        if image is None:
            continue  # reference policy: an alert needs all three cutouts
        n = int(np.searchsorted(jd_sorted, jd_a, side="right"))
        if n == 0:
            continue  # alert precedes every photometry row (clock skew)
        cand = dict(alert.get("candidate", alert))
        sample = {
            "photo_t": t[:n],
            "photo_flux": flux[:n],
            "photo_err": err[:n],
            "photo_band": band[:n],
            "image": image,
            "meta19": _meta_vector(cand)[:N_META19],
        }
        has_spec = spec is not None and (
            not causal_spectrum or (spec_jd is not None and spec_jd <= jd_a)
        )
        if has_spec:
            sample["spec_wl"], sample["spec_flux"] = spec
        yield (
            {
                "object_id": obj_id,
                "jd": jd_a,
                "fid": int(cand.get("fid", 0) or 0),
                "n_photometry": n,
                "has_spectrum": bool(has_spec),
            },
            sample,
        )


def iter_alert_samples(
    data_dir: str | Path,
    obj_ids: Optional[list[str]] = None,
    causal_spectrum: bool = True,
) -> Iterator[tuple[dict, dict]]:
    """Stream ``(info, sample)`` over every object directory under
    ``data_dir`` (or the given ids), alerts in per-object time order."""
    data_dir = Path(data_dir)
    if obj_ids is None:
        obj_ids = sorted(
            p.parent.name for p in data_dir.glob("*/alerts.npy")
        )
    for obj_id in obj_ids:
        try:
            yield from alert_samples_for_object(
                obj_id, data_dir, causal_spectrum=causal_spectrum
            )
        except Exception as e:  # noqa: BLE001 — reference skip-and-log policy
            # one corrupt object must not kill a live stream
            # (preprocess_multimodal.py:961-962 does the same during builds)
            import warnings

            warnings.warn(
                f"skipping object {obj_id}: {type(e).__name__}: {e}",
                stacklevel=2,
            )


def serve_alert_stream(
    task,
    params,
    samples: Iterator[tuple[dict, dict]],
    batch_size: int = 1024,
    length_buckets: tuple[int, ...] = (63, 127, 191, 255, 257),
    binned: bool = True,
    stats_mean=None,
    stats_std=None,
    wave_grid: Optional[np.ndarray] = None,
    image_dtype=np.float32,
    int8: bool = False,
    calib_alerts: int = 64,
    out_jsonl: Optional[str | Path] = None,
    horizon_days: Optional[float] = 100.0,
) -> dict:
    """Classify a stream of per-alert samples; returns a summary dict.

    ``binned=True`` routes through ``LengthBinnedFeeder`` (homogeneous
    length buckets — the measured-fastest steady state); ``False`` packs
    arrival-order batches straight into ``FusedSpectraStream``. Outputs are
    identical either way (binning only reorders batch membership).

    Results are returned as ``summary["results"]`` — a list of the input
    ``info`` dicts extended with ``probs`` (and written as JSONL when
    ``out_jsonl`` is given), in arrival order.
    """
    from applecider_tpu.infer.stream import FusedSpectraStream, LengthBinnedFeeder

    router = FusedSpectraStream(task, stats_mean=stats_mean, stats_std=stats_std,
                                wave_grid=wave_grid, horizon_days=horizon_days)
    if int8:
        # int8 PTQ (ops/quant.py): calibrate activation scales on the
        # stream's own leading alerts (eagerly, on the host CPU backend),
        # then serve the whole stream — including those alerts — through
        # the quantized router. Opt-in: accuracy is workload-dependent.
        import itertools

        import jax

        from applecider_tpu.infer.stream import _has_spectrum

        head = list(itertools.islice(samples, calib_alerts))
        # the causal-spectrum contract makes LEADING alerts systematically
        # spectrum-poor (a spectrum only attaches once taken): if the head
        # has no spectrum-bearing sample, SpectraNet's layers would
        # calibrate on zero activations. Scan ahead (bounded) for a few
        # spectrum carriers so the spectra branch sees real ranges.
        extra: list = []
        if head and not any(_has_spectrum(s) for _, s in head):
            for pair in itertools.islice(samples, 20 * calib_alerts):
                extra.append(pair)
                if sum(_has_spectrum(s) for _, s in extra) >= 4:
                    break
        samples = itertools.chain(head, extra, samples)
        if head:
            calib = head + [p for p in extra if _has_spectrum(p[1])]
            cpu = jax.devices("cpu")[0]
            cpu_params = jax.device_put(params, cpu)
            with jax.default_device(cpu):
                placed = router.place([s for _, s in calib],
                                      length_buckets=length_buckets, device=cpu)
                scales = router.pipe.calibrate(cpu_params, [placed])
            router = FusedSpectraStream(
                task, stats_mean=stats_mean, stats_std=stats_std,
                wave_grid=wave_grid, quantize_scales=scales,
            )
    infos: list[dict] = []
    probs_by_idx: dict[int, np.ndarray] = {}
    pending: list[tuple[list[int], object]] = []

    def drain(ready):
        for indices, resolver in ready:
            pending.append((indices, resolver))
            # resolve all but the newest batch: keeps one batch in flight
            while len(pending) > 1:
                idxs, res = pending.pop(0)
                out = res()
                for j, i in enumerate(idxs):
                    probs_by_idx[i] = out[j]

    t0 = time.perf_counter()
    if binned:
        feeder = LengthBinnedFeeder(
            router, params, flush_bs=batch_size,
            length_buckets=length_buckets, image_dtype=image_dtype,
        )
        for info, sample in samples:
            idx = len(infos)
            infos.append(info)
            drain(feeder.submit([(idx, sample)]))
        drain(feeder.flush())
    else:
        batch: list[tuple[int, dict]] = []

        def flush():
            if not batch:
                return
            idxs = [i for i, _ in batch]
            resolver = router.submit(
                params, [s for _, s in batch],
                length_buckets=length_buckets, image_dtype=image_dtype,
            )
            drain([(idxs, lambda r=resolver: r())])
            batch.clear()

        for info, sample in samples:
            idx = len(infos)
            infos.append(info)
            batch.append((idx, sample))
            if len(batch) >= batch_size:
                flush()
        flush()
    while pending:
        idxs, res = pending.pop(0)
        out = res()
        for j, i in enumerate(idxs):
            probs_by_idx[i] = out[j]
    elapsed = time.perf_counter() - t0

    results = []
    for i, info in enumerate(infos):
        rec = dict(info)
        rec["probs"] = np.asarray(probs_by_idx[i], np.float32)
        results.append(rec)
    if out_jsonl is not None:
        with open(out_jsonl, "w") as f:
            for rec in results:
                row = {k: (v.tolist() if isinstance(v, np.ndarray) else v)
                       for k, v in rec.items()}
                f.write(json.dumps(row) + "\n")
    return {
        "n_alerts": len(infos),
        "seconds": elapsed,
        "alerts_per_sec": len(infos) / elapsed if elapsed > 0 else 0.0,
        "results": results,
    }
