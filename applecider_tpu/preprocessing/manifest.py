"""Manifests, train-feature statistics, and stratified splits.

Behavioral contract from the reference
(``preprocess_multimodal.py:830-916, 984-1100``):

* ``built_all.csv`` manifest with (object_id, filepath, label, label_str,
  n_events [, has_spectrum, spectrum_dt]);
* streaming mean/std over event or meta matrices across all npz files ->
  ``feature_stats_{event,meta}.npz`` (columns/mean/std keys);
* splits: filter classes with >= min_per_class (7), stratified 70/15/15 via
  sklearn ``train_test_split`` (seeded-random fallback), write
  ``splits.csv`` + per-split manifests + train-only stats.

Divergence: stats are NaN-aware (per-column finite counts) — the
reference's plain sums poison every statistic once a single color column is
NaN, which its own event schema guarantees.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pandas as pd

MANIFEST_COLUMNS = ["object_id", "filepath", "label", "label_str", "n_events"]


def safe_manifest(rows) -> pd.DataFrame:
    if not len(rows):
        return pd.DataFrame(columns=MANIFEST_COLUMNS)
    df = pd.DataFrame(rows)
    for c in MANIFEST_COLUMNS:
        if c not in df.columns:
            df[c] = np.nan
    ordered = MANIFEST_COLUMNS + [c for c in df.columns if c not in MANIFEST_COLUMNS]
    return df[ordered]


def write_manifest_csv(rows, path: Path, name: str = "") -> pd.DataFrame:
    df = safe_manifest(rows)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    df.to_csv(path, index=False)
    print(f"Wrote {name or path.name} -> {path} (rows={len(df)})")
    return df


def compute_feature_stats(manifest_csv: Path, kind: str, out_dir: Path) -> bool:
    """Streaming per-column mean/std over `{event,meta}_data` matrices."""
    manifest_csv = Path(manifest_csv)
    if not manifest_csv.exists() or os.path.getsize(manifest_csv) == 0:
        print(f"[stats:{kind}] skip -> missing or empty: {manifest_csv}")
        return False
    try:
        manifest = pd.read_csv(manifest_csv)
    except pd.errors.EmptyDataError:
        print(f"[stats:{kind}] skip -> empty manifest")
        return False
    if "filepath" not in manifest.columns or len(manifest) == 0:
        print(f"[stats:{kind}] skip -> no rows")
        return False

    data_key = "event_data" if kind == "event" else "meta_data"
    cols_key = "event_columns" if kind == "event" else "meta_columns"
    total = None
    sum_ = None
    sumsq = None
    columns = None
    for path in manifest["filepath"]:
        if not Path(path).exists():
            continue
        with np.load(path, allow_pickle=True) as npz:
            data = npz[data_key].astype(np.float64)
            if data.size == 0:
                continue
            if columns is None:
                columns = npz[cols_key]
        finite = np.isfinite(data)
        data = np.where(finite, data, 0.0)
        if sum_ is None:
            sum_ = data.sum(axis=0)
            sumsq = (data**2).sum(axis=0)
            total = finite.sum(axis=0).astype(np.float64)
        else:
            sum_ += data.sum(axis=0)
            sumsq += (data**2).sum(axis=0)
            total += finite.sum(axis=0)
    if total is None or (total == 0).all():
        print(f"[stats:{kind}] skip -> no data rows")
        return False
    denom = np.maximum(total, 1.0)
    mean = sum_ / denom
    var = sumsq / denom - mean**2
    std = np.sqrt(np.clip(var, 0, None))
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    np.savez(
        out_dir / f"feature_stats_{kind}.npz",
        columns=np.asarray(columns),
        mean=mean.astype(np.float32),
        std=std.astype(np.float32),
        count=total.astype(np.int64),
    )
    print(f"[stats:{kind}] wrote {out_dir / f'feature_stats_{kind}.npz'}")
    return True


def find_available_ids(spec_csv: Path, data_dir: Path, id_cols=("object_id", "obj_id")) -> pd.DataFrame:
    """Rows of the label csv whose raw object dirs exist locally."""
    spec = pd.read_csv(spec_csv)
    id_col = next((c for c in id_cols if c in spec.columns), None)
    if id_col is None:
        raise ValueError(f"no id column among {id_cols}; have {list(spec.columns)}")
    spec = spec.rename(columns={id_col: "object_id"})
    data_dir = Path(data_dir)
    have = [
        oid
        for oid in spec["object_id"].unique()
        if (data_dir / str(oid) / "photometry.csv").exists()
        and (data_dir / str(oid) / "alerts.npy").exists()
    ]
    return spec[spec["object_id"].isin(have)].copy()


def make_splits_from_manifest(
    built_csv: Path,
    out_root: Path,
    *,
    min_per_class: int = 7,
    train_frac: float = 0.70,
    val_frac: float = 0.15,
    test_frac: float = 0.15,
    seed: int = 42,
    strict_stratify: bool = True,
) -> pd.DataFrame:
    """Filter under-represented classes, stratify 70/15/15, write artifacts."""
    out_root = Path(out_root)
    built = pd.read_csv(built_csv)
    if len(built) == 0:
        raise RuntimeError(f"no rows in {built_csv}")
    if "label_str" not in built.columns:
        raise RuntimeError("manifest must contain label_str")

    counts = built["label_str"].value_counts()
    keep_classes = counts[counts >= min_per_class].index.tolist()
    filtered = built[built["label_str"].isin(keep_classes)].copy()
    print(
        f"Keeping {len(keep_classes)} classes with >= {min_per_class} examples -> "
        f"{filtered['object_id'].nunique()} objects "
        f"(dropped {built['object_id'].nunique() - filtered['object_id'].nunique()})."
    )
    if len(filtered) == 0:
        raise RuntimeError("nothing left after min_per_class filtering")

    ids = filtered["object_id"].to_numpy()
    labels = filtered["label_str"].to_numpy()
    can_stratify = (
        filtered["label_str"].value_counts().min() >= 2 and filtered["label_str"].nunique() >= 2
    )
    if can_stratify:
        from sklearn.model_selection import train_test_split

        try:
            tr, rest = train_test_split(
                ids, train_size=train_frac, stratify=labels, random_state=seed
            )
        except ValueError:
            # corpus too small relative to the class count (sklearn requires
            # each side >= n_classes); degrade to seeded random regardless of
            # strict_stratify — this is a size artifact, not a feasibility one
            can_stratify = False
            strict_stratify = False
    if can_stratify:
        rest_labels = filtered.set_index("object_id").loc[rest, "label_str"]
        remainder = 1.0 - train_frac
        val_share = val_frac / remainder
        if not np.isclose(val_share + test_frac / remainder, 1.0):
            val_share = 0.5
        try:
            va, te = train_test_split(
                rest, train_size=val_share, stratify=rest_labels, random_state=seed
            )
        except ValueError:
            # remainder too small to stratify (classes with a single member);
            # degrade to a seeded random val/test split
            va, te = train_test_split(rest, train_size=val_share, random_state=seed)
    else:
        if strict_stratify:
            raise ValueError(
                "stratified split infeasible; lower min_per_class or set strict_stratify=False"
            )
        rng = np.random.RandomState(seed)
        shuffled = ids.copy()
        rng.shuffle(shuffled)
        n_tr = int(round(train_frac * len(shuffled)))
        remainder = 1.0 - train_frac
        n_va = int(round((val_frac / remainder) * (len(shuffled) - n_tr))) if remainder > 0 else 0
        tr = shuffled[:n_tr]
        va = shuffled[n_tr : n_tr + n_va]
        te = shuffled[n_tr + n_va :]

    rows = [(oid, "train") for oid in tr] + [(oid, "val") for oid in va] + [(oid, "test") for oid in te]
    splits = pd.DataFrame(rows, columns=["object_id", "split"])
    splits = splits.merge(filtered[["object_id", "label_str"]], on="object_id", how="left")
    out_root.mkdir(parents=True, exist_ok=True)
    splits.to_csv(out_root / "splits.csv", index=False)
    print(f"Wrote splits -> {out_root / 'splits.csv'}")

    indexed = filtered.set_index("object_id")
    for split in ("train", "val", "test"):
        split_ids = splits.loc[splits["split"] == split, "object_id"]
        rows_ = [
            {
                "object_id": oid,
                "filepath": indexed.loc[oid, "filepath"],
                "label": int(indexed.loc[oid, "label"]),
                "label_str": indexed.loc[oid, "label_str"],
                "n_events": int(indexed.loc[oid, "n_events"]),
            }
            for oid in split_ids
            if oid in indexed.index
        ]
        write_manifest_csv(rows_, out_root / f"manifest_{split}.csv", name=f"manifest_{split}.csv")

    train_manifest = out_root / "manifest_train.csv"
    if train_manifest.exists() and os.path.getsize(train_manifest) > 0:
        compute_feature_stats(train_manifest, "event", out_root)
        compute_feature_stats(train_manifest, "meta", out_root)
    print("Splitting complete.")
    return splits
