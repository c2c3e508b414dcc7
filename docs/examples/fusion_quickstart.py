"""End-to-end 4-modality fusion training on a synthetic corpus.

Equivalent of the reference's full-fusion training flow
(``_archive/notebooks/brew_cider.py:1197-1254``: CiderDataset ->
AppleCider -> Trainer -> per-alert evaluation), runnable anywhere:

    python docs/examples/fusion_quickstart.py /tmp/ac_fusion

Steps: synthesize a raw ZTF-shaped corpus -> preprocess to npz ->
FusionDataset (per-alert mode, photometry cut at each alert time) ->
AppleCiderTask (tiny config) -> Trainer.fit with validation ->
per-alert probabilities through the device-compiled alert-stream
pipeline using the trained weights.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main(root: Path):
    import jax
    import numpy as np

    from applecider_tpu.config import load_defaults
    from applecider_tpu.datasets.fusion_dataset import FusionDataset
    from applecider_tpu.datasets.loader import DataLoader
    from applecider_tpu.infer.stream import AlertStreamPipeline, pack_alert_batch
    from applecider_tpu.models.fusion import AppleCiderTask
    from applecider_tpu.preprocessing.cli import preprocess_data
    from applecider_tpu.testing import make_corpus
    from applecider_tpu.train.trainer import Trainer

    root.mkdir(parents=True, exist_ok=True)

    # 1. raw corpus -> npz + manifests + splits + train stats
    data_dir, labels_csv = make_corpus(root, n_objects=16, seed=3, n_photometry=24, n_alerts=3)
    out = root / "out"
    preprocess_data(str(data_dir), str(labels_csv), str(out), min_per_class=1)

    # 2. tiny fusion config (full architecture, small dims)
    cfg = load_defaults()
    for key, val in {
        "model.BaselineCLS.d_model": 16, "model.BaselineCLS.n_heads": 2,
        "model.BaselineCLS.n_layers": 1, "model.BaselineCLS.dropout": 0.0,
        "model.SpectraNet.channels": [4, 8], "model.SpectraNet.depths": [1, 1],
        "model.SpectraNet.kernel_sizes_per_stage": [[3, 7], [3, 5]],
        "model.AstroMiNN.backbone_depths": [1, 1],
        "model.AstroMiNN.backbone_dims": [8, 16],
        "model.AppleCider.fusion": "concat",
        "train.compute_dtype": "float32", "train.epochs": 2,
        "checkpoint.resume": False,
    }.items():
        cfg.set(key, val)
    sec = f'data_set."{FusionDataset.SECTION}"'
    cfg.set(f"{sec}.manifest_path", str(out / "manifest_train.csv"))
    # photo_stats.npz = stats over the TRANSFORMED 4 channels (written by
    # preprocess_data); feature_stats_event.npz is raw per-column stats
    # and load_photo_stats refuses it
    cfg.set(f"{sec}.stats_event_path", str(out / "photo_stats.npz"))
    cfg.set(f"{sec}.max_len", 64)

    # 3. per-alert fusion dataset + trainer (brew_cider Trainer semantics)
    train_ds = FusionDataset(cfg, mode="per_alert")
    cfg_val = cfg.merged_with({})
    cfg_val.set(f"{sec}.manifest_path", str(out / "manifest_val.csv"))
    val_ds = FusionDataset(cfg_val, mode="per_alert")
    task = AppleCiderTask(cfg)
    trainer = Trainer(task, cfg, root / "results")
    results = trainer.fit(
        DataLoader(train_ds, batch_size=8, seed=0),
        DataLoader(val_ds, batch_size=8, seed=0),
    )
    last = results["history"][-1]
    print("train loss:", [round(h["train_loss"], 3) for h in results["history"]])
    print("val:", {k: round(v, 3) for k, v in last.items() if k.startswith("val_")})

    # 4. per-alert streaming inference with the trained weights
    params = results["state"].params
    pipe = AlertStreamPipeline(task, stats_mean=train_ds.mean, stats_std=train_ds.std,
                               wave_grid=np.linspace(4500.0, 7980.0, 3481, dtype=np.float32))
    rng = np.random.default_rng(0)
    raw_alerts = []
    for _ in range(4):
        P = int(rng.integers(10, 20))
        raw_alerts.append({
            "photo_t": np.sort(rng.uniform(0, 40, P)).astype(np.float32),
            "photo_flux": rng.lognormal(2.0, 1.0, P).astype(np.float32),
            "photo_err": rng.uniform(0.5, 2.0, P).astype(np.float32),
            "photo_band": rng.integers(0, 3, P).astype(np.int32),
            "image": rng.normal(size=(63, 63, 3)).astype(np.float32),
            "meta19": rng.normal(size=19).astype(np.float32),
        })
    probs = np.asarray(pipe(params, pack_alert_batch(raw_alerts, max_photo=64)))
    assert probs.shape == (4, 5) and np.allclose(probs.sum(-1), 1.0, atol=1e-4)
    print("stream per-alert probabilities:", np.round(probs[0], 3))


if __name__ == "__main__":
    target = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(tempfile.mkdtemp())
    main(target)
