"""End-to-end quickstart on a synthetic corpus.

Equivalent of the reference's pre-executed example
(``docs/pre_executed/testing/baselineCLS_example.py``: prepare -> MPT
pretrain -> weight surgery -> finetune -> infer), runnable anywhere
(CPU or TPU) because the corpus is synthesized.

    python docs/examples/quickstart.py /tmp/ac_quickstart
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main(root: Path):
    import jax
    import numpy as np

    from applecider_tpu.datasets.loader import DataLoader
    from applecider_tpu.datasets.photo_dataset import (
        PhotoEventsDataset,
        compute_photo_feature_stats,
    )
    from applecider_tpu.models.mpt import MPTTask, warmstart_classifier_params
    from applecider_tpu.preprocessing.cli import preprocess_data
    from applecider_tpu.testing import make_corpus
    from applecider_tpu.train.runtime import AppleCiderRuntime
    from applecider_tpu.train.trainer import Trainer

    root.mkdir(parents=True, exist_ok=True)

    # 1. synthesize a raw corpus and preprocess it
    data_dir, labels_csv = make_corpus(root, n_objects=20, seed=7)
    out = root / "out"
    preprocess_data(str(data_dir), str(labels_csv), str(out), min_per_class=1)
    compute_photo_feature_stats(out / "manifest_train.csv", 100.0, out / "photo_stats.npz")

    # 2. configure a small photometry run
    overrides = {
        "model": {"name": "BaselineCLS", "BaselineCLS": {
            "d_model": 32, "n_heads": 4, "n_layers": 1, "dropout": 0.1}},
        "train": {"epochs": 3, "compute_dtype": "float32"},
        "data_loader": {"batch_size": 8},
        "model_inputs": {
            "train": {"data": {"dataset_class": "PhotoEventsDataset"}},
            "validate": {"data": {"dataset_class": "PhotoEventsDataset"}},
            "infer": {"data": {"dataset_class": "PhotoEventsDataset"}},
        },
    }
    rt = AppleCiderRuntime(overrides=overrides, workdir=root / "results")
    sec = f'data_set."{PhotoEventsDataset.SECTION}"'
    rt.set_config(f"{sec}.manifest_path", str(out / "manifest_train.csv"))
    rt.set_config(f"{sec}.stats_path", str(out / "photo_stats.npz"))
    rt.set_config(f"{sec}.use_oversampling", True)
    rt.prepare()

    # 3. MPT self-supervised pretraining + weight surgery
    mpt_task = MPTTask(rt.config)
    mpt_trainer = Trainer(mpt_task, rt.config, root / "results" / "pretrain")
    loader = DataLoader(rt.datasets["train"], batch_size=8, seed=0)
    pre = mpt_trainer.fit(loader, epochs=2)
    print("pretrain history:", [round(h["train_loss"], 3) for h in pre["history"]])

    # 4. supervised finetune (warm-started), then inference
    results = rt.train()
    print("train history:", [round(h["train_loss"], 3) for h in results["history"]])

    cls_task = rt._task()
    batch0 = cls_task.to_tensor(next(iter(loader)))
    fresh = cls_task.init(jax.random.PRNGKey(0), batch0)["params"]
    warm = warmstart_classifier_params(fresh, pre["state"].params)
    print("warm-start trunk copied:",
          np.allclose(np.asarray(warm["trunk"]["in_proj"]["kernel"]),
                      np.asarray(pre["state"].params["trunk"]["in_proj"]["kernel"])))

    # the reference recipe flips use_probabilities before infer
    # (baselineCLS_example.py:48-52)
    rt.config.set("model.BaselineCLS.use_probabilities", True)
    probs = rt.infer()
    row_sum = float(np.asarray(probs).sum(axis=-1).mean()) if probs.size else float("nan")
    assert abs(row_sum - 1.0) < 1e-4, f"probability rows must sum to 1, got {row_sum}"
    print("inference:", probs.shape, "prob rows sum to", row_sum)

    export_dir = rt.export()
    print("exported:", sorted(p.name for p in export_dir.iterdir()))


if __name__ == "__main__":
    # --smoke (CI): run in a throwaway tempdir; the corpus is tiny either way
    args = [a for a in sys.argv[1:] if a != "--smoke"]
    target = Path(args[0]) if args else Path(tempfile.mkdtemp())
    main(target)
