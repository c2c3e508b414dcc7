"""End-to-end preprocessing: corpus build -> manifest -> splits -> stats."""

import numpy as np
import pandas as pd

from applecider_tpu.preprocessing.cli import preprocess_data
from applecider_tpu.testing import make_corpus


def test_full_preprocess_pipeline(tmp_path):
    data_dir, labels_csv = make_corpus(
        tmp_path, n_objects=15, seed=5, n_photometry=20, n_alerts=5,
    )
    out = tmp_path / "out"
    preprocess_data(str(data_dir), str(labels_csv), str(out), min_per_class=2, seed=42)

    built = pd.read_csv(out / "built_all.csv")
    assert len(built) == 15
    assert set(built.columns) >= {"object_id", "filepath", "label", "label_str", "n_events"}

    splits = pd.read_csv(out / "splits.csv")
    assert set(splits["split"]) == {"train", "val", "test"}
    assert len(splits) == 15
    # object-level disjointness
    by_split = {s: set(splits[splits.split == s].object_id) for s in ("train", "val", "test")}
    assert not (by_split["train"] & by_split["val"])
    assert not (by_split["train"] & by_split["test"])

    for split in ("train", "val", "test"):
        manifest = pd.read_csv(out / f"manifest_{split}.csv")
        assert len(manifest) > 0

    for kind in ("event", "meta"):
        with np.load(out / f"feature_stats_{kind}.npz", allow_pickle=True) as st:
            assert np.isfinite(st["mean"]).all()
            assert (st["std"] >= 0).all()
            assert len(st["columns"]) == len(st["mean"])


def test_parallel_build_matches_serial(tmp_path):
    from applecider_tpu.preprocessing.builder import build_all_preprocessed
    from applecider_tpu.preprocessing.config import PreprocessConfig

    data_dir, labels_csv = make_corpus(tmp_path, n_objects=4, seed=9, n_photometry=12, n_alerts=4)
    cfg_serial = PreprocessConfig(data_dir=data_dir, spec_csv=labels_csv,
                                  output_root=tmp_path / "serial")
    cfg_pool = PreprocessConfig(data_dir=data_dir, spec_csv=labels_csv,
                                output_root=tmp_path / "pool", num_workers=2)
    m1 = build_all_preprocessed(cfg_serial)
    m2 = build_all_preprocessed(cfg_pool)
    assert list(m1.object_id) == list(m2.object_id)
    for _, row1 in m1.iterrows():
        row2 = m2[m2.object_id == row1.object_id].iloc[0]
        with np.load(row1.filepath) as a, np.load(row2.filepath) as b:
            np.testing.assert_allclose(a["event_data"], b["event_data"], equal_nan=True)
            np.testing.assert_allclose(a["meta_data"], b["meta_data"])
