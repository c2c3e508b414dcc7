"""Datasets: oversampler semantics, loaders, all four dataset families."""

import numpy as np
import pytest

from applecider_tpu.config import load_defaults
from applecider_tpu.datasets.fusion_dataset import FusionDataset
from applecider_tpu.datasets.image_metadata_dataset import ImageAndMetadataDataset
from applecider_tpu.datasets.loader import DataLoader
from applecider_tpu.datasets.oversampler import Oversampler, oversampling_targets
from applecider_tpu.datasets.photo_dataset import (
    PhotoEventsDataset,
    compute_photo_feature_stats,
)
from applecider_tpu.datasets.spectra_dataset import SpectraDataset
from applecider_tpu.preprocessing.alert_samples import build_alert_samples
from applecider_tpu.preprocessing.cli import preprocess_data
from applecider_tpu.testing import make_corpus


# ------------------------------------------------------------- oversampler
def test_targets_largest_remainder():
    targets = oversampling_targets([0.3, 0.1, 0.1, 0.3, 0.1], [100, 10, 10, 100, 10])
    assert (targets >= np.array([100, 10, 10, 100, 10])).all()
    p = targets / targets.sum()
    ideal = np.array([0.3, 0.1, 0.1, 0.3, 0.1]) / 0.9
    np.testing.assert_allclose(p, ideal, atol=0.02)


def test_oversampler_map_covers_all_and_reproducible():
    labels = np.array([0] * 50 + [1] * 5 + [2] * 5)
    a = Oversampler([0.5, 0.25, 0.25], labels, seed=7)
    b = Oversampler([0.5, 0.25, 0.25], labels, seed=7)
    assert len(a) == len(b)
    np.testing.assert_array_equal(a.index_map, b.index_map)
    # every original index appears at least once
    assert set(a.index_map) == set(range(60))
    resolved = [a.resolve(i) for i in range(len(a))]
    n_oversampled = sum(1 for _, f in resolved if f)
    assert n_oversampled == len(a) - 60


# ------------------------------------------------------- end-to-end fixture
@pytest.fixture(scope="module")
def prepared(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    data_dir, labels_csv = make_corpus(root, n_objects=12, seed=11, n_photometry=20, n_alerts=5)
    out = root / "out"
    preprocess_data(str(data_dir), str(labels_csv), str(out), min_per_class=1, seed=42)
    return out


def test_photo_dataset(prepared):
    cfg = load_defaults()
    sec = f'data_set."{PhotoEventsDataset.SECTION}"'
    cfg.set(f"{sec}.manifest_path", str(prepared / "manifest_train.csv"))
    stats_path = prepared / "photo_stats.npz"
    compute_photo_feature_stats(prepared / "manifest_train.csv", 100.0, stats_path)
    cfg.set(f"{sec}.stats_path", str(stats_path))
    cfg.set(f"{sec}.use_oversampling", True)

    ds = PhotoEventsDataset(cfg)
    assert len(ds) >= len(ds.manifest)
    s = ds.sample(0)
    assert s["photometry"].shape[1] == 7
    assert 0 <= s["label"] < 5

    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=1, drop_last=True)
    batch = next(iter(loader))["data"]
    assert batch["photometry"].shape == (4, 257, 7)
    assert batch["pad_mask"].shape == (4, 257)
    assert batch["pad_mask"].dtype == bool
    # valid rows unmasked, padding masked
    lengths = (~batch["pad_mask"]).sum(axis=1)
    assert (lengths > 0).all()


def test_loader_deterministic(prepared):
    cfg = load_defaults()
    sec = f'data_set."{PhotoEventsDataset.SECTION}"'
    cfg.set(f"{sec}.manifest_path", str(prepared / "manifest_train.csv"))
    cfg.set(f"{sec}.use_oversampling", False)
    ds = PhotoEventsDataset(cfg)
    l1 = DataLoader(ds, batch_size=2, shuffle=True, seed=5, prefetch=0)
    l2 = DataLoader(ds, batch_size=2, shuffle=True, seed=5, prefetch=0)
    b1 = next(iter(l1))["data"]["label"]
    b2 = next(iter(l2))["data"]["label"]
    np.testing.assert_array_equal(b1, b2)


def test_image_metadata_dataset(prepared, tmp_path):
    samples_dir = tmp_path / "alert_samples"
    index = build_alert_samples(prepared / "manifest_train.csv", samples_dir)
    assert len(index) > 0

    cfg = load_defaults()
    sec = f'data_set."{ImageAndMetadataDataset.SECTION}"'
    cfg.set(f"{sec}.use_oversampling", False)
    ds = ImageAndMetadataDataset(cfg, samples_dir)
    assert len(ds) == len(index)
    s = ds.sample(0)
    assert s["image"].shape == (3, 63, 63)
    assert s["metadata"].shape == (24,)
    assert s["target"].shape == (5,) and s["target"].sum() == 1.0
    # fine-grained target
    rt = ds.get_real_target(0)
    assert rt.shape == (9,)

    # center crop
    cfg.set(f"{sec}.cutout_size", 49)
    ds2 = ImageAndMetadataDataset(cfg, samples_dir)
    assert ds2.get_image(0).shape == (3, 49, 49)

    # L2 norm
    cfg.set(f"{sec}.cutout_size", 63)
    cfg.set(f"{sec}.image_norm", "L2")
    ds3 = ImageAndMetadataDataset(cfg, samples_dir)
    np.testing.assert_allclose(np.linalg.norm(ds3.get_image(0)), 1.0, rtol=1e-5)


def test_spectra_dataset(tmp_path, rng):
    n = 10
    flux = rng.normal(size=(n, 64)).astype(np.float32)
    labels = [list({"AGN": 0, "SN Ia": 5}.keys())[i % 2] for i in range(n)]
    np.savez(
        tmp_path / "table.npz",
        flux=flux,
        labels=np.asarray(labels, object),
        redshifts=rng.uniform(0, 2, n).astype(np.float32),
        file_paths=np.asarray([f"f{i}" for i in range(n)], object),
    )
    ds = SpectraDataset(load_defaults(), tmp_path / "table.npz")
    assert len(ds) == n
    assert ds.get_flux(0).shape == (1, 64)
    assert ds.get_label(0) in (0, 5)
    batch = SpectraDataset.collate([ds.sample(i) for i in range(4)])["data"]
    assert batch["flux"].shape == (4, 64)


def test_spectra_dataset_pt_table(tmp_path, rng):
    import torch

    n = 6
    table = {
        "flux": [torch.randn(32) for _ in range(n)],
        "labels": ["AGN"] * n,
        "redshifts": [0.1] * n,
        "file_paths": [f"f{i}" for i in range(n)],
    }
    torch.save(table, tmp_path / "table.pt")
    ds = SpectraDataset(load_defaults(), tmp_path / "table.pt")
    assert len(ds) == n


def test_fusion_dataset(prepared):
    cfg = load_defaults()
    sec = f'data_set."{FusionDataset.SECTION}"'
    cfg.set(f"{sec}.manifest_path", str(prepared / "manifest_train.csv"))
    ds = FusionDataset(cfg)
    s = ds.sample(0)
    assert s["photometry"].shape[1] == 7
    assert s["metadata"].shape == (24,)
    assert s["image"].shape == (3, 63, 63)
    assert s["spectrum"].shape == (3481,)

    loader = DataLoader(ds, batch_size=2, shuffle=False, prefetch=0)
    batch = next(iter(loader))["data"]
    assert batch["photometry"].shape[0] == 2
    assert batch["spectrum"].shape == (2, 3481)

    # per-alert mode yields more rows
    ds2 = FusionDataset(cfg, mode="per_alert")
    assert len(ds2) >= len(ds)


def test_oversampler_skips_absent_classes():
    """A class with zero samples but nonzero ideal mass is dropped and the
    remaining distribution renormalized (the reference crashes here)."""
    from applecider_tpu.datasets.oversampler import Oversampler, oversampling_targets

    targets = oversampling_targets([0.3, 0.1, 0.1, 0.3, 0.2], [10, 0, 5, 7, 0])
    assert targets[1] == 0 and targets[4] == 0
    assert targets[0] >= 10 and targets[2] >= 5 and targets[3] >= 7

    ov = Oversampler([0.3, 0.1, 0.1, 0.3, 0.2], [0, 0, 2, 3, 2, 0, 3], seed=1)
    resolved = [ov.resolve(i)[0] for i in range(len(ov))]
    assert len(ov) >= 7
    assert set(resolved) <= set(range(7))


def test_oversampler_all_absent_returns_identity():
    from applecider_tpu.datasets.oversampler import oversampling_targets

    np.testing.assert_array_equal(
        oversampling_targets([0.0, 1.0], [5, 0]), [5, 0]
    )


def test_load_photo_stats_refuses_raw_event_layout(tmp_path):
    """feature_stats_event.npz carries raw EVENT_COLUMNS stats; slicing
    [:4] would normalize log1p(dt)/logflux channels with raw-dt/band_id
    statistics — the loader must refuse the layout loudly."""
    import pytest

    from applecider_tpu.datasets.photo_dataset import load_photo_stats

    raw = tmp_path / "feature_stats_event.npz"
    np.savez(raw, columns=np.asarray(["dt", "dt_prev", "band_id", "logflux"]),
             mean=np.arange(14.0), std=np.ones(14))
    with pytest.raises(ValueError, match="RAW per-column"):
        load_photo_stats(raw)

    ok = tmp_path / "photo_stats.npz"
    np.savez(ok, mean=np.arange(4.0, dtype=np.float32),
             std=np.full(4, 2.0, np.float32))
    mean, std = load_photo_stats(ok)
    np.testing.assert_array_equal(mean, np.arange(4.0, dtype=np.float32))
    np.testing.assert_array_equal(std, 2.0)


def test_taxonomy_tde_alias():
    from applecider_tpu.datasets.photo_dataset import TAXONOMY_BY_NAME

    assert TAXONOMY_BY_NAME["TDE"] == TAXONOMY_BY_NAME["Tidal Disruption Event"] == 4
    assert TAXONOMY_BY_NAME["CV"] == TAXONOMY_BY_NAME["Cataclysmic"] == 2


def test_spectra_label_variants():
    from applecider_tpu.datasets.spectra_dataset import _label_index

    assert _label_index("SN IIp") == _label_index("SN IIP") == 2
    assert _label_index("TDE") == 8
    import pytest

    with pytest.raises(ValueError, match="unknown spectra label"):
        _label_index("Kilonova")


def test_oversampler_ignores_unknown_class():
    """class -1 (unknown target) rides through once but is never counted
    toward nor replicated for the balance."""
    from applecider_tpu.datasets.oversampler import Oversampler

    classes = np.asarray([0, 0, 0, 0, 1, -1, -1])
    os_with = Oversampler([0.5, 0.5], classes, seed=0)
    os_wo = Oversampler([0.5, 0.5], classes[:5], seed=0)
    # same balancing decision as if the unknowns didn't exist...
    assert len(os_with) - 2 == len(os_wo)
    # ...and no unknown row is ever replicated
    resolved = [os_with.resolve(i) for i in range(len(os_with))]
    unknown_hits = [orig for orig, over in resolved if orig >= 5]
    assert sorted(unknown_hits) == [5, 6]


def test_loader_abandoned_iteration_reaps_producer():
    """`for batch in loader: break` must not leak a producer thread
    blocked on the bounded queue."""
    import threading

    from applecider_tpu.datasets.loader import DataLoader

    class Tiny:
        def __len__(self):
            return 64

        def sample(self, i):
            return {"x": np.full(3, i, np.float32)}

        def collate(self, samples):
            return {"x": np.stack([s["x"] for s in samples])}

    before = threading.active_count()
    loader = DataLoader(Tiny(), batch_size=4, shuffle=False, prefetch=2)
    for _ in range(8):  # repeated abandoned epochs
        for batch in loader:
            break
    # producers must exit promptly once the consumer abandons the epoch
    import time

    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before + 1


def test_fusion_per_alert_object_cache_consistent(tmp_path):
    """the one-object cache must return byte-identical samples on repeat
    access and across object switches."""
    # reuse the corpus the module's other fusion tests build, if present;
    # otherwise build a small one
    from applecider_tpu.preprocessing.cli import preprocess_data
    from applecider_tpu.testing import make_corpus

    data_dir, labels_csv = make_corpus(tmp_path, n_objects=12, seed=3,
                                       n_photometry=12, n_alerts=3)
    out = tmp_path / "out"
    preprocess_data(str(data_dir), str(labels_csv), str(out), min_per_class=1, seed=1)
    from applecider_tpu.config import load_defaults
    from applecider_tpu.datasets.fusion_dataset import FusionDataset

    cfg = load_defaults()
    sec = f'data_set."{FusionDataset.SECTION}"'
    cfg.set(f"{sec}.manifest_path", str(out / "manifest_train.csv"))
    ds = FusionDataset(cfg, mode="per_alert")
    n = min(len(ds), 8)
    first = [ds.sample(i) for i in range(n)]
    again = [ds.sample(i) for i in range(n)]  # warm-cache path
    for a, b in zip(first, again):
        for k in ("photometry", "metadata", "image", "spectrum"):
            np.testing.assert_array_equal(a[k], b[k])
        assert a["label"] == b["label"]
