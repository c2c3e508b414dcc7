"""Training loop: jit-compiled steps, evaluation, checkpointing, early stop.

Re-provides the reference's run orchestration (Hyrax/pytorch-ignite epochs
plus the archived in-repo ``Trainer``,
``_archive/AppleCider/core/trainer.py:15-354``) as a functional TPU loop:

* one jitted ``train_step`` (value_and_grad + optax, grad-clip composed in)
  reused for every batch; the host loop only feeds sharded batches;
* evaluation pass producing the full metric suite
  (``applecider_tpu.ops.metrics.classification_report``);
* early stopping on val loss + best-checkpoint tracking (by val accuracy,
  like the reference), EMA option;
* orbax checkpointing of the FULL train state (params, opt_state, step,
  epoch) with resume — an upgrade over the reference's weights-only
  ``torch.save`` (no optimizer/step resume there).
"""

from __future__ import annotations

import json
import time
from functools import partial
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from applecider_tpu.ops.metrics import classification_report
from applecider_tpu.parallel.mesh import make_mesh, replicate
from applecider_tpu.parallel.multihost import host_local_batch_to_global
from applecider_tpu.train.optim import (
    EMA,
    EarlyStopping,
    ReduceLROnPlateau,
    freeze_subtrees,
    set_plateau_scale,
    with_grad_clip,
    with_plateau_scale,
)


class TrainState:
    """Plain pytree-of-arrays train state (kept simple for orbax)."""

    def __init__(self, params, opt_state, step: int = 0):
        self.params = params
        self.opt_state = opt_state
        self.step = step

    def as_pytree(self) -> dict:
        return {"params": self.params, "opt_state": self.opt_state, "step": self.step}


class Trainer:
    def __init__(self, task, config, workdir: str | Path, mesh=None):
        self.task = task
        self.config = config
        self.workdir = Path(workdir)
        self.workdir.mkdir(parents=True, exist_ok=True)
        # multi-host hook: initialize jax.distributed BEFORE the mesh is
        # built so jax.devices() is the GLOBAL device set (no-op unless
        # parallel.multihost.enable; see parallel/multihost.py)
        from applecider_tpu.parallel.multihost import maybe_initialize

        self.process_index, self.process_count = maybe_initialize(config)
        if mesh is None:
            shape = tuple(config.get_path("parallel.mesh_shape", default=[-1, 1]))
            axes = tuple(config.get_path("parallel.mesh_axes", default=["data", "model"]))
            mesh = make_mesh(shape=shape, axes=axes)
        self.mesh = mesh
        self.tx = with_grad_clip(task.make_optimizer(), task.grad_clip)
        freeze = list(config.get_path("train.freeze_params", default=[]))
        if freeze:
            # reference finetune strategy B (baselineCLS_example notebook):
            # train the head with the pretrained trunk frozen, then unfreeze
            self.tx = freeze_subtrees(self.tx, freeze)
        accum = int(config.get_path("train.grad_accum_steps", default=1))
        if accum > 1:
            # optimizer updates apply every `accum` microbatches with the
            # mean gradient — large effective batches without the HBM cost
            # (no reference counterpart; standard TPU memory/batch trade).
            # Wraps INSIDE plateau scaling below so the plateau multiplier
            # still applies to the emitted (accumulated) update.
            self.tx = optax.MultiSteps(self.tx, every_k_schedule=accum)
        plateau_factor = float(config.get_path("train.plateau_factor", default=0.0))
        self.plateau = None
        if plateau_factor > 0.0:
            self.tx = with_plateau_scale(self.tx)
            self.plateau = ReduceLROnPlateau(
                factor=plateau_factor,
                patience=int(config.get_path("train.plateau_patience", default=5)),
                min_scale=float(config.get_path("train.plateau_min_scale", default=1e-3)),
            )
        self._train_step = None
        self._eval_step = None
        # identity of task.batch_stats at jit-build time: the stats are a
        # trace-time constant inside the cached closures, so replacing them
        # (second fit(), checkpoint import) must invalidate the cached steps
        self._steps_stats_token = object()
        self._log_file = self.workdir / "metrics.jsonl"

        ema_decay = float(config.get_path("train.ema_decay", default=0.0))
        self.ema = EMA(ema_decay) if ema_decay > 0 else None

    # ------------------------------------------------------------- jit steps
    def _invalidate_steps_if_stats_changed(self):
        stats = getattr(self.task, "batch_stats", None)
        if stats is not self._steps_stats_token:
            self._train_step = None
            self._eval_step = None
            self._steps_stats_token = stats

    def _build_train_step(self):
        task, tx = self.task, self.tx
        loss_fn = task.loss_fn
        if bool(self.config.get_path("train.remat", default=False)):
            # rematerialize the forward during backward: activations are
            # recomputed instead of held in HBM (jax.checkpoint). For the
            # reference-scale models this is optional headroom; for larger
            # configs it's the standard TPU memory/FLOP trade.
            loss_fn = jax.checkpoint(loss_fn, static_argnums=(3,))

        # Donate params + opt_state: XLA aliases the update in place instead
        # of holding old and new copies live across the step (~1 GB at the
        # reference scale with Adam in f32). The loop always threads the
        # RETURNED state, so the consumed input buffers are never reused.
        # CPU ignores donation with a warning, so only donate off-CPU.
        try:
            donate = (0, 1) if jax.default_backend() != "cpu" else ()
        except Exception:
            donate = ()

        @partial(jax.jit, donate_argnums=donate)
        def train_step(params, opt_state, batch, rng):
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, rng, True
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics = dict(aux["metrics"])
            from applecider_tpu.utils.observability import grad_norm

            metrics["grad_norm"] = grad_norm(grads)
            return params, opt_state, metrics

        return train_step

    def _build_eval_step(self):
        """Jitted eval: loss + softmax probabilities from the task's own
        logits (``loss_fn`` aux), never from ``task.predict`` — so the
        ``use_probabilities`` config flag can't double-softmax the metrics."""
        task = self.task
        key = jax.random.PRNGKey(0)

        @jax.jit
        def eval_step(params, batch):
            loss, aux = task.loss_fn(params, batch, key, False)
            logits = aux.get("logits")
            probs = (
                jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                if logits is not None else None
            )
            return loss, probs

        return eval_step

    # ---------------------------------------------------------- orbax io
    def _ckpt_dir(self) -> Path:
        return self.workdir / "checkpoints"

    def save_checkpoint(self, state: TrainState, epoch: int, tag: str = "last",
                        params_override=None):
        """``params_override``: store these weights as the checkpoint's
        ``params`` (used for the best checkpoint when validation ran on EMA
        shadow weights — the stored model must be the one that produced the
        logged metric)."""
        import orbax.checkpoint as ocp

        path = (self._ckpt_dir() / f"{tag}").absolute()
        ckptr = ocp.StandardCheckpointer()
        payload = {
            "params": params_override if params_override is not None else state.params,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
            "epoch": np.asarray(epoch),
        }
        if self.ema is not None and self.ema.shadow is not None:
            # the shadow must survive resume: EMA restarted from raw params
            # would need ~1/(1-decay) steps to re-converge, and the 'best'
            # metric was measured on it
            payload["ema"] = self.ema.shadow
        if self.plateau is not None:
            # host-side scheduler state must survive resume, or the reduced
            # LR scale snaps back to 1.0 on the first post-resume epoch
            payload["plateau"] = np.asarray(
                [self.plateau.best, self.plateau.bad_epochs, self.plateau.scale],
                dtype=np.float64,
            )
        batch_stats = getattr(self.task, "batch_stats", None)
        if batch_stats:
            # frozen BN running stats (imported reference checkpoints) ride
            # along so a resumed/exported run keeps its normalization
            payload["batch_stats"] = batch_stats
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()

    def restore_checkpoint(self, init_state: TrainState, tag: str = "last") -> tuple[TrainState, int]:
        import orbax.checkpoint as ocp

        path = (self._ckpt_dir() / f"{tag}").absolute()
        if not path.exists():
            return init_state, 0
        ckptr = ocp.StandardCheckpointer()
        target = {
            "params": init_state.params,
            "opt_state": init_state.opt_state,
            "step": np.asarray(init_state.step),
            "epoch": np.asarray(0),
        }
        if self.plateau is not None:
            target["plateau"] = np.zeros(3, np.float64)
        batch_stats = getattr(self.task, "batch_stats", None)
        if batch_stats:
            target["batch_stats"] = batch_stats
        if self.ema is not None:
            target["ema"] = init_state.params
        optional = [k for k in ("plateau", "batch_stats", "ema") if k in target]
        try:
            restored = ckptr.restore(path, target)
        except Exception as e:
            if not optional:
                raise
            # Retry against the legacy layout (checkpoint written before the
            # optional host-state entries existed). Only a *structure*
            # mismatch justifies the retry; anything else (corrupt file,
            # shape mismatch inside params) must not be silently converted
            # into a fresh-state resume.
            msg = str(e)
            structural = any(
                s in msg for s in ("structure", "Structure", "not found", "No such",
                                   "KeyError", "missing", "Missing", "diff")
            ) or isinstance(e, (KeyError, FileNotFoundError))
            if not structural:
                raise
            import warnings

            warnings.warn(
                f"checkpoint at {path} lacks optional entries {optional} "
                f"(legacy layout?); retrying without them. Original error: "
                f"{type(e).__name__}: {msg[:200]}",
                stacklevel=2,
            )
            for k in optional:
                target.pop(k, None)
            restored = ckptr.restore(path, target)
        if self.plateau is not None and "plateau" in restored:
            best, bad, scale = (float(v) for v in restored["plateau"])
            self.plateau.best = best
            self.plateau.bad_epochs = int(bad)
            self.plateau.scale = scale
        if "batch_stats" in restored:
            self.task.batch_stats = restored["batch_stats"]
        if self.ema is not None and "ema" in restored:
            self.ema.shadow = restored["ema"]
        state = TrainState(restored["params"], restored["opt_state"], int(restored["step"]))
        return state, int(restored["epoch"]) + 1

    # -------------------------------------------------------------- logging
    def _log(self, record: dict):
        if jax.process_index() != 0:
            # every process computes identical metrics (allgathered); only
            # one may append to the shared metrics.jsonl or lines duplicate
            return
        record = {k: (float(v) if isinstance(v, (int, float, np.floating)) else v)
                  for k, v in record.items()}
        with open(self._log_file, "a") as f:
            f.write(json.dumps(record) + "\n")

    # ------------------------------------------------------------------ fit
    def fit(self, train_loader, val_loader=None, epochs: Optional[int] = None,
            pruning_hook=None, init_params=None) -> dict:
        """``init_params``: start from these weights instead of a fresh
        init — the MPT weight-surgery warm start
        (``models.mpt.warmstart_classifier_params``; reference
        baselineCLS_example.py:31-39). A checkpoint resume still wins over
        ``init_params`` (resume means continue THAT run)."""
        cfg = self.config
        epochs = epochs or int(cfg.get_path("train.epochs", default=10))
        seed = int(cfg.get_path("train.seed", default=42))
        patience = int(cfg.get_path("train.early_stop_patience", default=30))

        # dropout-bit generation dominates nothing on CPU but is a real TPU
        # cost: the default threefry PRNG compiles to scalar-heavy code,
        # measured +14.6 ms on the 52.9 ms fusion train step (batch 64,
        # tpu_results/train_step_r3.jsonl value_and_grad vs _nodropout).
        # "rbg" lowers to the TPU-native RngBitGenerator. Still deterministic
        # per (key, shape) on a fixed backend; threefry remains the default
        # off-TPU and available everywhere via train.rng_impl.
        impl = str(cfg.get_path("train.rng_impl", default="auto"))
        if impl == "auto":
            impl = "rbg" if jax.default_backend() == "tpu" else "threefry2x32"
        rng = jax.random.key(seed, impl=impl)
        first = next(iter(train_loader))
        batch0 = self.task.to_tensor(first)
        rng, init_rng = jax.random.split(rng)
        variables = self.task.init(init_rng, batch0)
        params0 = variables["params"]
        if init_params is not None:
            params0 = jax.tree.map(jnp.asarray, init_params)
        state = TrainState(params0, self.tx.init(params0))

        start_epoch = 0
        if bool(cfg.get_path("checkpoint.resume", default=True)):
            state, start_epoch = self.restore_checkpoint(state)

        state.params = replicate(state.params, self.mesh)
        state.opt_state = replicate(state.opt_state, self.mesh)
        self._invalidate_steps_if_stats_changed()
        if self._train_step is None:
            self._train_step = self._build_train_step()
        if self.ema is not None:
            if self.ema.shadow is None:  # a resumed shadow must NOT be reset
                self.ema.init(state.params)
            else:
                self.ema.shadow = replicate(self.ema.shadow, self.mesh)

        stopper = EarlyStopping(patience)
        best_metric = -np.inf
        history = []
        last_epoch = start_epoch - 1
        for epoch in range(start_epoch, epochs):
            last_epoch = epoch
            train_loader.set_epoch(epoch)
            t0 = time.time()
            losses = []
            for host_batch in train_loader:
                batch = host_local_batch_to_global(self.task.to_tensor(host_batch), self.mesh)
                rng, step_rng = jax.random.split(rng)
                state.params, state.opt_state, metrics = self._train_step(
                    state.params, state.opt_state, batch, step_rng
                )
                state.step += 1
                losses.append(metrics["loss"])
                if self.ema is not None:
                    self.ema.update(state.params)
            train_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")

            record = {
                "epoch": epoch,
                "train_loss": train_loss,
                "steps": state.step,
                "epoch_seconds": time.time() - t0,
            }
            if losses:
                record["last_grad_norm"] = float(metrics.get("grad_norm", np.nan))
            if val_loader is not None:
                # reference EMA recipe (train_utils.py:17-45 apply_shadow):
                # validate with the shadow weights when EMA is enabled
                ema_eval = self.ema is not None and bool(
                    self.config.get_path("train.eval_with_ema", default=True)
                )
                eval_params = self.ema.params() if ema_eval else state.params
                val = self.evaluate(eval_params, val_loader)
                record.update({f"val_{k}": v for k, v in val.items()
                               if isinstance(v, (int, float, np.floating))})
                monitor = val.get("accuracy", -val.get("loss", 0.0))
                if monitor > best_metric:
                    best_metric = monitor
                    # the best checkpoint stores the weights that PRODUCED the
                    # monitored metric — the EMA shadow when it was validated
                    self.save_checkpoint(
                        state, epoch, tag="best",
                        params_override=eval_params if ema_eval else None,
                    )
                should_stop = stopper.step(val.get("loss", train_loss))
                if self.plateau is not None:
                    scale = self.plateau.step(val.get("loss", train_loss))
                    state.opt_state = set_plateau_scale(state.opt_state, scale)
                    record["lr_scale"] = scale
                if pruning_hook is not None and pruning_hook.report_and_maybe_prune(
                    val.get("loss", train_loss), epoch
                ):
                    should_stop = True
            else:
                should_stop = False
            self._log(record)
            history.append(record)
            if epoch % int(self.config.get_path("checkpoint.save_every_epochs", default=1)) == 0:
                self.save_checkpoint(state, epoch, tag="last")
            if should_stop:
                break
        # record the epoch actually reached — after an early stop, stamping
        # epochs-1 here would make a resume with a larger epoch budget skip
        # the epochs that never ran
        self.save_checkpoint(state, last_epoch, tag="last")
        return {"state": state, "history": history, "best_metric": best_metric}

    # ------------------------------------------------------------- evaluate
    def evaluate(self, params, loader) -> dict:
        params = replicate(params, self.mesh)
        self._invalidate_steps_if_stats_changed()
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        from applecider_tpu.parallel.multihost import (allgather_host_rows,
                                                       local_rows)

        probs, labels, losses, sizes = [], [], [], []
        for host_batch in loader:
            tensors = self.task.to_tensor(host_batch)
            # labels come from the HOST-LOCAL tensors (pre-sharding):
            # np.asarray on a pod-global array spanning other hosts'
            # devices raises; the loss scalar is replicated so it is safe
            raw_labels = np.asarray(tensors[-1])
            batch = host_local_batch_to_global(tensors, self.mesh)
            loss, p = self._eval_step(params, batch)
            losses.append(float(loss))
            sizes.append(len(raw_labels))
            if p is not None:
                probs.append(local_rows(p)[: len(raw_labels)])
            labels.append(raw_labels.argmax(-1) if raw_labels.ndim > 1 else raw_labels)
        sizes = np.asarray(sizes, np.float64)
        mean_loss = float(np.average(np.asarray(losses), weights=sizes))
        if not probs:  # regression / pretraining tasks expose no logits
            return {"loss": mean_loss}
        # all-gather across hosts: every process computes IDENTICAL metrics,
        # so early-stop / plateau / best-checkpoint control flow cannot
        # diverge (a single divergent epoch loop deadlocks the pod)
        report = classification_report(
            allgather_host_rows(np.concatenate(probs)),
            allgather_host_rows(np.concatenate(labels)))
        report = {k: v for k, v in report.items() if not isinstance(v, (dict, np.ndarray))}
        report["loss"] = mean_loss
        return report

    def predict(self, params, loader) -> np.ndarray:
        """Per-sample predictions over ``loader``'s dataset, in DATASET ROW
        ORDER when the loader is strided (multi-host).

        Multi-host, the naive gather would return [host0's strided samples,
        host1's, ...] and silently drop the common-truncation/drop_last
        tail — consumers align ``predictions.npy`` with dataset rows, so
        that ordering is wrong (ADVICE r4). The strided plan is
        deterministic (``DataLoader.shard_emit_plan``): invert it, and
        recompute the dropped tail replicated on every host."""
        from applecider_tpu.parallel.multihost import (allgather_host_rows,
                                                       local_rows)

        params = replicate(params, self.mesh)
        # engage only when the final all-gather really spans the shards:
        # single-process tests fake num_shards>1, where rows covers just
        # this shard and inverting the full plan would misalign
        multi = (int(getattr(loader, "num_shards", 1)) > 1
                 and jax.process_count() == int(loader.num_shards))
        plan = loader.shard_emit_plan() if multi else None
        out = []
        for host_batch in loader:
            tensors = self.task.to_tensor(host_batch)
            n_local = len(np.asarray(tensors[-1]))
            batch = host_local_batch_to_global(tensors, self.mesh)
            out.append(local_rows(self.task.predict(params, batch))[:n_local])
        rows = allgather_host_rows(np.concatenate(out))
        if plan is None:
            return rows
        order = np.concatenate(plan["per_shard"])
        leftover = plan["leftover"]
        full = np.empty((order.size + leftover.size, *rows.shape[1:]), rows.dtype)
        full[order] = rows
        if leftover.size:
            full[leftover] = self._predict_replicated(
                params, loader.dataset, leftover)
        return full

    def _predict_replicated(self, params, dataset, indices) -> np.ndarray:
        """Predict ``indices`` with every host feeding the SAME rows.

        Per-sample outputs mean every host's local block holds identical
        values, so no gather is needed; rows pad to a multiple of the data
        axis so the global batch shards evenly (pad rows sliced off)."""
        from applecider_tpu.parallel.multihost import local_rows

        n_axis = int(self.mesh.shape.get("data", 1))
        idx = [int(i) for i in indices]
        pad = (-len(idx)) % max(n_axis, 1)
        samples = [dataset.sample(i) for i in idx] + \
                  [dataset.sample(idx[0])] * pad
        tensors = self.task.to_tensor(dataset.collate(samples))
        batch = host_local_batch_to_global(tensors, self.mesh)
        return local_rows(self.task.predict(params, batch))[: len(idx)]
