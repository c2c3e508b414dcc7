"""Tracing, experiment logging, and statistical runners.

Re-provides the reference's observability surface TPU-natively:

* wandb per-step/epoch logging incl. gradient norms
  (``_archive/AppleCider/core/trainer.py:146-182``) — gated: becomes a
  no-op when wandb isn't installed (it isn't in this image);
* optuna trial pruning hooks (``trainer.py:225-231``) — same gating;
* multi-seed runner with mean±std aggregation
  (``_archive/AppleCider/utils.py:118-205``);
* device-side profiling via ``jax.profiler`` traces — the upgrade over the
  reference's tqdm-only visibility.
"""

from __future__ import annotations

import contextlib
import json
from pathlib import Path
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np


def grad_norm(grads) -> jax.Array:
    """Global L2 norm of a gradient pytree (torch clip_grad_norm_ semantics)."""
    leaves = jax.tree.leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves))


@contextlib.contextmanager
def profile_trace(log_dir: str | Path, enabled: bool = True):
    """jax.profiler trace scope; view with TensorBoard/xprof."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ExperimentLogger:
    """JSONL + optional-wandb logger."""

    def __init__(self, log_dir: str | Path, wandb_project: str | None = None, config: dict | None = None):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._file = self.log_dir / "events.jsonl"
        self._wandb = None
        if wandb_project:
            try:
                import wandb

                self._wandb = wandb.init(project=wandb_project, config=config or {})
            except ImportError:
                print("[logger] wandb not installed; JSONL only")

    def log(self, record: dict, step: int | None = None):
        def norm(v):
            if isinstance(v, (np.integer,)):
                return int(v)
            if isinstance(v, (np.floating,)):
                return float(v)
            if isinstance(v, (np.ndarray, jnp.ndarray)):
                return float(v) if np.ndim(v) == 0 or np.size(v) == 1 else np.asarray(v).tolist()
            return v

        payload = {k: norm(v) for k, v in record.items()}
        if step is not None:
            payload["step"] = step
        with open(self._file, "a") as f:
            f.write(json.dumps(payload, default=str) + "\n")
        if self._wandb is not None:
            self._wandb.log(record, step=step)

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()


class PruningHook:
    """Optuna-style pruning hook; inert when no trial is attached."""

    def __init__(self, trial=None):
        self.trial = trial

    def report_and_maybe_prune(self, value: float, step: int) -> bool:
        """Returns True if the run should stop early."""
        if self.trial is None:
            return False
        self.trial.report(value, step)
        if self.trial.should_prune():
            try:
                import optuna

                raise optuna.TrialPruned()
            except ImportError:
                return True
        return False


def multi_seed_run(run_fn: Callable[[int], dict], seeds: Iterable[int]) -> dict:
    """Run ``run_fn(seed) -> metric dict`` per seed; aggregate mean±std."""
    results = [run_fn(int(seed)) for seed in seeds]
    keys = sorted({k for r in results for k in r if isinstance(r[k], (int, float, np.floating))})
    summary = {}
    for k in keys:
        vals = np.asarray([float(r[k]) for r in results if k in r])
        summary[k] = {"mean": float(vals.mean()), "std": float(vals.std()), "values": vals.tolist()}
    return {"per_seed": results, "summary": summary}
