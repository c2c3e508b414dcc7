"""Hyperparameter sweep example (optuna-compatible, gated).

The reference drives sweeps with optuna (``brew_cider.py:1270-1306``,
``AstroMiNN.py:1441-1543``). optuna isn't baked into this image, so the
example degrades to a seeded random search over the same space when it's
absent — the ``objective(trial_like)`` signature is optuna-ready.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


class RandomTrial:
    """Minimal optuna.Trial stand-in for offline random search."""

    def __init__(self, rng):
        self.rng = rng
        self.params = {}

    def suggest_float(self, name, low, high, log=False):
        import numpy as np

        if log:
            v = float(np.exp(self.rng.uniform(np.log(low), np.log(high))))
        else:
            v = float(self.rng.uniform(low, high))
        self.params[name] = v
        return v

    def suggest_categorical(self, name, choices):
        v = choices[int(self.rng.integers(len(choices)))]
        self.params[name] = v
        return v

    def report(self, *a, **k):
        pass

    def should_prune(self):
        return False


def objective(trial, root: Path) -> float:
    from applecider_tpu.datasets.photo_dataset import PhotoEventsDataset
    from applecider_tpu.train.runtime import AppleCiderRuntime

    lr = trial.suggest_float("lr", 1e-5, 1e-3, log=True)
    dropout = trial.suggest_float("dropout", 0.0, 0.5)
    d_model = trial.suggest_categorical("d_model", [16, 32])

    overrides = {
        "model": {"name": "BaselineCLS", "BaselineCLS": {
            "d_model": d_model, "n_heads": 4, "n_layers": 1,
            "dropout": dropout, "lr": lr}},
        "train": {"epochs": 2, "compute_dtype": "float32"},
        "data_loader": {"batch_size": 8},
        "model_inputs": {
            "train": {"data": {"dataset_class": "PhotoEventsDataset"}},
            "validate": {"data": {"dataset_class": "PhotoEventsDataset"}},
        },
    }
    rt = AppleCiderRuntime(overrides=overrides, workdir=root / "sweep_results")
    sec = f'data_set."{PhotoEventsDataset.SECTION}"'
    rt.set_config(f"{sec}.manifest_path", str(root / "out" / "manifest_train.csv"))
    rt.set_config(f"{sec}.use_oversampling", False)
    results = rt.train()
    return results["history"][-1].get("val_accuracy", 0.0)


def main(root: Path, n_trials: int = 3):
    import numpy as np

    from applecider_tpu.preprocessing.cli import preprocess_data
    from applecider_tpu.testing import make_corpus

    root.mkdir(parents=True, exist_ok=True)
    data_dir, labels_csv = make_corpus(root, n_objects=15, seed=3)
    preprocess_data(str(data_dir), str(labels_csv), str(root / "out"), min_per_class=1)

    try:
        import optuna

        study = optuna.create_study(direction="maximize")
        study.optimize(lambda t: objective(t, root), n_trials=n_trials)
        print("best:", study.best_params, study.best_value)
    except ImportError:
        rng = np.random.default_rng(0)
        best = (-1.0, None)
        for i in range(n_trials):
            trial = RandomTrial(rng)
            score = objective(trial, root)
            print(f"trial {i}: {trial.params} -> {score:.3f}")
            if score > best[0]:
                best = (score, trial.params)
        print("best:", best[1], best[0])


if __name__ == "__main__":
    target = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(tempfile.mkdtemp())
    main(target)
