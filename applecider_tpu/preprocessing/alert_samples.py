"""Per-alert sample builder for the image+metadata (AstroMiNN) path.

Equivalent of the reference's legacy pipeline
(``_archive/AppleCider/preprocess/transient_dataset.py:12-263`` +
``alert_processor.py`` + ``data_preprocessor.py``): per matched event emit
a ``.npy`` dict {obj_id, image (3,H,W), metadata (24,), target}. Here the
samples are sliced directly out of the multimodal npz artifacts (one
decode, many consumers) instead of re-reading raw alert files.

The 24-column metadata contract (matching the tower slices the reference
hardcodes, ``astrominn.py:249-261``): columns 0..18 are
``ALERT_META_KEEP[:19]`` (sgscore1..rb, with ra/dec pre-scaled) and columns
19..23 are the light-curve context block [days_since_peak, days_to_peak,
peakmag_so_far, maxmag_so_far, n_photometry_total].
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd

ALERT_META_24_CONTEXT = (
    "days_since_peak", "days_to_peak", "peakmag_so_far", "maxmag_so_far", "n_photometry_total",
)


def metadata24_from_npz(meta_data: np.ndarray, meta_columns) -> np.ndarray:
    """(T, 46) multimodal meta matrix -> (T, 24) AstroMiNN metadata."""
    cols = {c: i for i, c in enumerate(meta_columns)}
    first19 = meta_data[:, :19]
    ctx = np.stack([meta_data[:, cols[c]] for c in ALERT_META_24_CONTEXT], axis=1)
    return np.concatenate([first19, ctx], axis=1).astype(np.float32)


def build_alert_samples(
    manifest_csv: str | Path,
    out_dir: str | Path,
    max_per_object: int = 0,
    seed: int = 42,
) -> pd.DataFrame:
    """Explode multimodal npz files into per-alert sample dicts.

    ``max_per_object > 0`` uniformly subsamples events per object (the
    legacy pipeline caps at 6, ``alert_processor.py:66-92``).
    """
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    manifest = pd.read_csv(manifest_csv)
    rng = np.random.default_rng(seed)
    rows = []
    for rec in manifest.itertuples(index=False):
        with np.load(rec.filepath, allow_pickle=True) as npz:
            images = npz["images"]
            meta24 = metadata24_from_npz(npz["meta_data"], npz["meta_columns"])
            label_str = str(npz["label_str"])
        n = len(images)
        take = np.arange(n)
        if max_per_object and n > max_per_object:
            take = np.sort(rng.choice(n, size=max_per_object, replace=False))
        for t in take:
            sample = {
                "obj_id": rec.object_id,
                "image": images[t],
                "metadata": meta24[t],
                "target": label_str,
            }
            path = out_dir / f"{rec.object_id}_alert{t:03d}.npy"
            np.save(path, np.asarray(sample, dtype=object), allow_pickle=True)
            rows.append({"obj_id": rec.object_id, "alert_index": int(t), "filepath": str(path)})
    index = pd.DataFrame(rows)
    index.to_csv(out_dir / "alert_samples.csv", index=False)
    return index
