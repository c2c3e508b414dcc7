"""Trainer + runtime verbs on a synthetic corpus (CPU, tiny model)."""

import numpy as np
import pytest

from applecider_tpu.config import load_defaults
from applecider_tpu.datasets.photo_dataset import PhotoEventsDataset, compute_photo_feature_stats
from applecider_tpu.preprocessing.cli import preprocess_data
from applecider_tpu.testing import make_corpus
from applecider_tpu.train.runtime import AppleCiderRuntime


@pytest.fixture(scope="module")
def prepared(tmp_path_factory):
    root = tmp_path_factory.mktemp("rt")
    data_dir, labels_csv = make_corpus(root, n_objects=12, seed=21, n_photometry=18, n_alerts=4)
    out = root / "out"
    preprocess_data(str(data_dir), str(labels_csv), str(out), min_per_class=1, seed=42)
    compute_photo_feature_stats(out / "manifest_train.csv", 100.0, out / "photo_stats.npz")
    return out


def _runtime(prepared, tmp_path, epochs=2):
    cfg_overrides = {
        "model": {"name": "BaselineCLS", "BaselineCLS": {
            "d_model": 16, "n_heads": 2, "n_layers": 1, "dropout": 0.0}},
        "train": {"epochs": epochs, "compute_dtype": "float32"},
        "data_loader": {"batch_size": 4, "drop_last": False},
        "model_inputs": {
            "train": {"data": {"dataset_class": "PhotoEventsDataset"}},
            "validate": {"data": {"dataset_class": "PhotoEventsDataset"}},
            "infer": {"data": {"dataset_class": "PhotoEventsDataset"}},
        },
    }
    rt = AppleCiderRuntime(overrides=cfg_overrides, workdir=tmp_path / "results")
    sec = f'data_set."{PhotoEventsDataset.SECTION}"'
    rt.set_config(f"{sec}.manifest_path", str(prepared / "manifest_train.csv"))
    rt.set_config(f"{sec}.stats_path", str(prepared / "photo_stats.npz"))
    rt.set_config(f"{sec}.use_oversampling", False)
    return rt


def test_prepare_train_infer(prepared, tmp_path):
    rt = _runtime(prepared, tmp_path)
    datasets = rt.prepare()
    assert "train" in datasets and "infer" in datasets

    results = rt.train()
    assert len(results["history"]) == 2
    assert np.isfinite(results["history"][-1]["train_loss"])
    assert (results["run_dir"] / "checkpoints" / "last").exists()
    assert (results["run_dir"] / "metrics.jsonl").exists()

    preds = rt.infer()
    assert preds.shape[0] == len(datasets["infer"])
    assert preds.shape[1] == 5


def test_checkpoint_resume(prepared, tmp_path):
    rt = _runtime(prepared, tmp_path, epochs=1)
    r1 = rt.train()
    # fresh trainer resumes from the saved state in the same run dir
    from applecider_tpu.train.trainer import Trainer, TrainState
    import jax

    task = rt._task()
    trainer = Trainer(task, rt.config, r1["run_dir"])
    loader = rt._loader(rt.datasets["train"], shuffle=False)
    batch0 = task.to_tensor(next(iter(loader)))
    variables = task.init(jax.random.PRNGKey(0), batch0)
    fresh = TrainState(variables["params"], trainer.tx.init(variables["params"]))
    restored, next_epoch = trainer.restore_checkpoint(fresh)
    assert next_epoch == 1
    assert restored.step > 0
    # restored params differ from fresh init (training moved them)
    moved = np.abs(
        np.asarray(restored.params["trunk"]["in_proj"]["kernel"])
        - np.asarray(fresh.params["trunk"]["in_proj"]["kernel"])
    ).max()
    assert moved > 0


def test_ema_shadow_persisted_and_best_matches_validated(prepared, tmp_path):
    """With eval_with_ema, the 'best' checkpoint must store the EMA shadow
    (the weights that produced the logged val metric) and resume must
    restore the shadow instead of resetting it from raw params."""
    import jax

    from applecider_tpu.train.trainer import Trainer, TrainState

    rt = _runtime(prepared, tmp_path, epochs=1)
    rt.set_config("train.ema_decay", 0.5)
    rt.prepare()
    task = rt._task()
    loader = rt._loader(rt.datasets["train"], shuffle=False)
    wd = tmp_path / "emarun"
    trainer = Trainer(task, rt.config, wd)
    res = trainer.fit(loader, val_loader=loader, epochs=1)

    leaf = lambda p: np.asarray(p["trunk"]["in_proj"]["kernel"])  # noqa: E731
    raw = leaf(res["state"].params)
    shadow = leaf(trainer.ema.shadow)
    assert np.abs(raw - shadow).max() > 0  # EMA lags raw weights

    # best checkpoint == shadow, not raw
    fresh = TrainState(res["state"].params, trainer.tx.init(res["state"].params))
    best, _ = trainer.restore_checkpoint(fresh, tag="best")
    np.testing.assert_allclose(leaf(best.params), shadow, rtol=0, atol=0)

    # resume in a fresh Trainer restores the shadow (no reset to raw)
    task2 = rt._task()
    batch0 = task2.to_tensor(next(iter(loader)))
    variables = task2.init(jax.random.PRNGKey(0), batch0)
    trainer2 = Trainer(task2, rt.config, wd)
    fresh2 = TrainState(variables["params"], trainer2.tx.init(variables["params"]))
    trainer2.restore_checkpoint(fresh2, tag="last")
    assert trainer2.ema.shadow is not None
    np.testing.assert_allclose(leaf(trainer2.ema.shadow), shadow, rtol=0, atol=0)


def test_early_stop_last_checkpoint_records_reached_epoch(prepared, tmp_path):
    """A run stopped at epoch e must stamp e (not epochs-1) into the 'last'
    checkpoint — otherwise a resume with a larger epoch budget skips the
    epochs that never ran."""
    import jax

    from applecider_tpu.train.trainer import Trainer, TrainState

    rt = _runtime(prepared, tmp_path, epochs=5)
    rt.prepare()
    task = rt._task()
    loader = rt._loader(rt.datasets["train"], shuffle=False)
    trainer = Trainer(task, rt.config, tmp_path / "earlystop")

    class StopAtEpoch1:
        def report_and_maybe_prune(self, value, epoch):
            return epoch >= 1

    res = trainer.fit(loader, val_loader=loader, pruning_hook=StopAtEpoch1())
    assert len(res["history"]) == 2  # epochs 0 and 1 ran, 2-4 did not

    task2 = rt._task()
    batch0 = task2.to_tensor(next(iter(loader)))
    variables = task2.init(jax.random.PRNGKey(0), batch0)
    trainer2 = Trainer(task2, rt.config, tmp_path / "earlystop")
    fresh = TrainState(variables["params"], trainer2.tx.init(variables["params"]))
    _, next_epoch = trainer2.restore_checkpoint(fresh)
    assert next_epoch == 2  # resume continues at epoch 2, not epochs(5)


def test_export_engine_roundtrip(prepared, tmp_path):
    rt = _runtime(prepared, tmp_path, epochs=1)
    rt.train()
    export_dir = rt.export()
    assert (export_dir / "model.stablehlo").exists()
    direct = rt.infer()
    via_engine = rt.engine(export_dir)
    np.testing.assert_allclose(via_engine, direct, atol=1e-5)


def test_export_engine_ragged_tail_batch(prepared, tmp_path):
    """Dataset size NOT divisible by batch_size: the final short batch must
    flow through engine() (symbolic batch dim, or pad-and-slice fallback)."""
    import json as _json

    rt = _runtime(prepared, tmp_path, epochs=1)
    rt.set_config("data_loader.batch_size", 5)  # 8 rows -> batches of 5 and 3
    rt.prepare()
    rt.train()
    export_dir = rt.export()
    meta = _json.loads((export_dir / "export_meta.json").read_text())
    assert meta["batch_size"] == 5
    direct = rt.infer()
    via_engine = rt.engine(export_dir)
    assert via_engine.shape == direct.shape  # includes the 3-row tail
    np.testing.assert_allclose(via_engine, direct, atol=1e-5)

def test_rbg_rng_impl_trains(prepared, tmp_path):
    """train.rng_impl="rbg" (the TPU-fast RngBitGenerator dropout path,
    default on TPU via "auto") must train with dropout active and move the
    weights; threefry stays the off-TPU default."""
    rt = _runtime(prepared, tmp_path, epochs=1)
    rt.set_config("model.BaselineCLS.dropout", 0.3)
    rt.set_config("train.rng_impl", "rbg")
    res = rt.train()
    assert np.isfinite(res["history"][-1]["train_loss"])


def test_grad_accum_matches_big_batch(prepared, tmp_path):
    """grad_accum_steps=2 at batch 2 takes the same optimizer path as
    batch 4 (mean gradient over the accumulation window): with SGD-like
    deterministic data order the final params agree."""
    import jax
    import numpy as np

    from applecider_tpu.train.trainer import Trainer

    def run(bs, accum, wd):
        rt = _runtime(prepared, tmp_path / f"cfg{bs}_{accum}", epochs=1)
        rt.set_config("data_loader.batch_size", bs)
        rt.set_config("data_loader.shuffle", False)
        rt.set_config("data_loader.drop_last", True)
        rt.set_config("train.grad_accum_steps", accum)
        rt.prepare()
        task = rt._task()
        trainer = Trainer(task, rt.config, wd)
        loader = rt._loader(rt.datasets["train"], shuffle=False)
        res = trainer.fit(loader, epochs=1)
        return res["state"].params

    p_small = run(2, 2, tmp_path / "accum")
    p_big = run(4, 1, tmp_path / "big")
    a = np.asarray(p_small["trunk"]["in_proj"]["kernel"])
    b = np.asarray(p_big["trunk"]["in_proj"]["kernel"])
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_engine_ignores_serving_export_dirs(prepared, tmp_path):
    """engine() with no export_dir must pick the latest *-export-* run dir
    that is a MODEL export — a newer '*-export-serving-*' dir (per-bucket
    serving programs, no model.stablehlo) must not shadow it."""
    rt = _runtime(prepared, tmp_path, epochs=1)
    rt.prepare(); rt.train(); rt.export()
    # a LATER-sorting serving export dir that engine() must skip
    decoy = rt.workdir / "zzzz-export-serving-Fusion"
    decoy.mkdir(parents=True)
    out = rt.engine()
    assert np.isfinite(out).all()
