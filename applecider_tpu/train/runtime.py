"""Config-driven run verbs: prepare / train / infer / export / engine.

Re-provides the Hyrax runtime surface the reference depends on
(``Hyrax(config_file).prepare()/train()/infer()/to_onnx()/engine()``, cf.
``docs/pre_executed/testing/baselineCLS_example.py``) without Hyrax:

* TOML-driven model + per-phase dataset binding
  (``[model_inputs.<phase>.data]`` with dataset_class / data_location);
* programmatic overrides via ``set_config("model.X.key", value)``;
* timestamped output directories; ``infer`` resolves the most recently
  trained run's weights, like Hyrax;
* ``export``/``engine``: the ONNX story is replaced by jax.export
  (serialized StableHLO + orbax params) — portable, runtime-loadable,
  and exactly what a TPU/any-XLA serving stack consumes. ``to_onnx`` is
  aliased to ``export`` for API familiarity.
"""

from __future__ import annotations

import datetime as _dt
import json
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from applecider_tpu.config import Config, load_config
from applecider_tpu.datasets.loader import DataLoader
from applecider_tpu.registry import get_dataset_class, get_model
from applecider_tpu.train.trainer import Trainer


class AppleCiderRuntime:
    def __init__(self, config_file=None, overrides=None, workdir: str | Path | None = None):
        self.config: Config = load_config(config_file, overrides)
        self.workdir = Path(workdir or self.config.get_path("run.output_dir", default="./results"))
        self.datasets: dict = {}
        self._run_dir: Optional[Path] = None

    # Hyrax-compatible config mutation
    def set_config(self, path: str, value):
        self.config.set(path, value)

    # ----------------------------------------------------------- components
    def _task(self):
        name = self.config.get_path("model.name", default="BaselineCLS")
        return get_model(name)(self.config)

    def _dataset(self, phase: str):
        section = self.config.section("model_inputs", phase, "data")
        cls_name = section.get("dataset_class")
        if not cls_name:
            raise KeyError(f"[model_inputs.{phase}.data].dataset_class not set")
        ds_cls = get_dataset_class(cls_name)
        location = section.get("data_location") or None
        return ds_cls(self.config, location) if location else ds_cls(self.config)

    def _loader(self, dataset, shuffle: bool) -> DataLoader:
        dl = self.config.section("data_loader")
        # multi-host: each process reads its stride of the epoch
        # (parallel/multihost.py; no-op at process_count 1)
        from applecider_tpu.parallel.multihost import maybe_initialize

        pid, pcount = maybe_initialize(self.config)
        return DataLoader(
            dataset,
            batch_size=int(dl.get("batch_size", 32)),
            shuffle=shuffle and bool(dl.get("shuffle", True)),
            seed=int(dl.get("seed", 42)),
            drop_last=bool(dl.get("drop_last", False)),
            num_shards=pcount,
            shard_index=pid,
        )

    # ---------------------------------------------------------------- verbs
    def prepare(self) -> dict:
        """Instantiate the datasets bound to each configured phase."""
        for phase in ("train", "validate", "infer"):
            section = self.config.section("model_inputs", phase, "data")
            if section.get("dataset_class"):
                self.datasets[phase] = self._dataset(phase)
        return self.datasets

    def _new_run_dir(self, verb: str) -> Path:
        stamp = _dt.datetime.now().strftime("%Y%m%d-%H%M%S-%f")
        # multi-host: every process must use ONE run dir (orbax's save is
        # a cross-process collective on a shared path) — process 0's
        # microsecond stamp wins; no-op at one process
        from applecider_tpu.parallel.multihost import broadcast_str

        stamp = broadcast_str(stamp)
        name = str(self.config.get_path("model.name", default="model")).split(".")[-1]
        run_dir = self.workdir / f"{stamp}-{verb}-{name}"
        run_dir.mkdir(parents=True, exist_ok=True)
        if jax.process_index() == 0:  # shared dir: one writer
            (run_dir / "run.json").write_text(
                json.dumps({"verb": verb, "model": name, "timestamp": stamp})
            )
        return run_dir

    def _latest_run_dir(self) -> Path:
        candidates = sorted(
            d for d in self.workdir.glob("*-train-*") if (d / "checkpoints").exists()
        )
        if not candidates:
            raise FileNotFoundError(f"no trained run under {self.workdir}")
        return candidates[-1]

    def train(self) -> dict:
        if "train" not in self.datasets:
            self.prepare()
        task = self._task()
        self._run_dir = self._new_run_dir("train")
        trainer = Trainer(task, self.config, self._run_dir)
        train_loader = self._loader(self.datasets["train"], shuffle=True)
        val_loader = (
            self._loader(self.datasets["validate"], shuffle=False)
            if "validate" in self.datasets
            else None
        )
        results = trainer.fit(train_loader, val_loader)
        results["run_dir"] = self._run_dir
        return results

    def _restore_latest_params(self, task):
        run_dir = self._run_dir or self._latest_run_dir()
        trainer = Trainer(task, self.config, run_dir)
        # rebuild abstract state from a fresh init to restore against
        ds = self.datasets.get("infer") or self.datasets.get("train")
        loader = self._loader(ds, shuffle=False)
        batch0 = task.to_tensor(next(iter(loader)))
        variables = task.init(jax.random.PRNGKey(0), batch0)
        from applecider_tpu.train.trainer import TrainState

        state = TrainState(variables["params"], trainer.tx.init(variables["params"]))
        tag = "best" if (run_dir / "checkpoints" / "best").exists() else "last"
        state, _ = trainer.restore_checkpoint(state, tag=tag)
        return state.params, trainer, loader

    def infer(self) -> np.ndarray:
        """Run inference with the most recently trained weights."""
        if not self.datasets:
            self.prepare()
        task = self._task()
        params, trainer, loader = self._restore_latest_params(task)
        out_dir = self._new_run_dir("infer")
        preds = trainer.predict(params, loader)
        if jax.process_index() == 0:  # every process holds identical rows
            np.save(out_dir / "predictions.npy", preds)
        return preds

    # ------------------------------------------------------------- export
    def export(self, out_path: str | Path | None = None) -> Path:
        """Serialize the jitted inference function (StableHLO) + params."""
        if not self.datasets:
            self.prepare()
        task = self._task()
        params, trainer, loader = self._restore_latest_params(task)
        out_path = Path(out_path) if out_path else self._new_run_dir("export")
        out_path.mkdir(parents=True, exist_ok=True)

        batch0 = task.to_tensor(next(iter(loader)))

        def infer_fn(params, *batch):
            return task.predict(params, batch)

        # Prefer a SYMBOLIC batch dimension: the exported artifact then
        # serves any batch size (in particular a dataset tail that isn't
        # divisible by batch_size). Models whose lowering can't be made
        # batch-polymorphic fall back to concrete shapes; engine() pads
        # the tail batch for those (export_meta.json records which).
        arrs = [np.asarray(b) for b in batch0]
        meta = {"batch_size": int(arrs[0].shape[0])}
        try:
            scope = jax.export.SymbolicScope()
            sym_args = [
                jax.ShapeDtypeStruct(
                    jax.export.symbolic_shape(
                        ", ".join(["b"] + [str(d) for d in a.shape[1:]]), scope=scope
                    ),
                    a.dtype,
                )
                for a in arrs
            ]
            exported = jax.export.export(jax.jit(infer_fn))(params, *sym_args)
            meta["symbolic_batch"] = True
        except Exception as e:  # noqa: BLE001 — fall back to concrete shapes
            exported = jax.export.export(jax.jit(infer_fn))(
                params, *[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrs]
            )
            meta["symbolic_batch"] = False
            meta["symbolic_error"] = f"{type(e).__name__}: {e}"
        (out_path / "export_meta.json").write_text(json.dumps(meta))
        (out_path / "model.stablehlo").write_bytes(exported.serialize())

        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save((out_path / "params").absolute(), params, force=True)
        ckptr.wait_until_finished()
        return out_path

    # keep the reference verb name alive
    to_onnx = export

    def _serve_stats(self):
        """(mean, std) photometry normalization from [serve].stats_event_path,
        falling back to the fusion dataset's training stats (the model was
        trained with these; serve/export_serving must normalize identically)."""
        sec = self.config.section("serve")
        stats_path = sec.get("stats_event_path", "")
        if not stats_path:
            from applecider_tpu.datasets.fusion_dataset import FusionDataset

            stats_path = self.config.section(
                "data_set", FusionDataset.SECTION
            ).get("stats_event_path", "")
        if not stats_path:
            return None, None
        from applecider_tpu.datasets.photo_dataset import load_photo_stats

        return load_photo_stats(stats_path)

    def _serve_horizon(self):
        """Horizon cut (days) for the serving featurization: the training
        datasets drop merged events past ``data_set.*.horizon`` (default
        100), so serving must cut identically. ``[serve].horizon_days``
        overrides; the fusion dataset's own value is the default."""
        sec = self.config.section("serve")
        if "horizon_days" in sec:
            v = sec.get("horizon_days")
            return None if v in ("", "none", None) else float(v)
        from applecider_tpu.datasets.fusion_dataset import FusionDataset

        return float(self.config.section(
            "data_set", FusionDataset.SECTION
        ).get("horizon", 100.0))

    @staticmethod
    def _export_with_symbolic_batch(fn, params, make_struct, concrete_b: int):
        """jax.export with a symbolic batch dim; concrete fallback.

        ``make_struct(b)`` builds the (pytree of) ShapeDtypeStructs for a
        batch-size expression ``b``. Returns (exported, meta_dict)."""
        meta = {"batch_size": int(concrete_b)}
        try:
            scope = jax.export.SymbolicScope()
            b = jax.export.symbolic_shape("b", scope=scope)[0]
            exported = jax.export.export(jax.jit(fn))(params, make_struct(b))
            meta["symbolic_batch"] = True
        except Exception as e:  # noqa: BLE001 — fall back to concrete shapes
            exported = jax.export.export(jax.jit(fn))(params, make_struct(concrete_b))
            meta["symbolic_batch"] = False
            meta["symbolic_error"] = f"{type(e).__name__}: {e}"
        return exported, meta

    def export_serving(self, out_path: str | Path | None = None,
                       length_buckets: tuple | None = None,
                       max_spec: int = 512, params=None,
                       wave_grid=None) -> Path:
        """Serialize the FULL serving graph (device preprocess + fusion
        forward + softmax) as StableHLO, one program per photometry-length
        bucket, each with a symbolic batch dim when the lowering allows.

        Unlike ``export()`` (the model's ``predict`` on featurized
        batches), this artifact consumes ``pack_alert_batch``'s raw layout
        — merge/featurize/normalize/resample ride inside the program — so
        any XLA runtime can serve alerts with no Python feature code.
        """
        from applecider_tpu.infer.stream import AlertStreamPipeline

        task = self._task()
        if params is None:
            if not self.datasets:
                self.prepare()
            params, _, _ = self._restore_latest_params(task)
        if length_buckets is None:  # same buckets the serve() feeder packs to
            length_buckets = tuple(self.config.get_path(
                "serve.length_buckets", default=(63, 127, 191, 255, 257)))
        mean, std = self._serve_stats()  # bake the TRAINING normalization in
        pipe = AlertStreamPipeline(task, stats_mean=mean, stats_std=std,
                                   wave_grid=wave_grid,
                                   horizon_days=self._serve_horizon())
        out_path = Path(out_path) if out_path else self._new_run_dir("export-serving")
        out_path.mkdir(parents=True, exist_ok=True)

        def raw_struct(P, b):
            f32, i32 = np.float32, np.int32
            dims = {
                "photo_t": ((b, P), f32), "photo_flux": ((b, P), f32),
                "photo_err": ((b, P), f32), "photo_band": ((b, P), i32),
                "photo_valid": ((b, P), bool),
                "image": ((b, 63, 63, 3), f32),
                "meta19": ((b, 19), f32),
                "spec_wl": ((b, max_spec), f32), "spec_flux": ((b, max_spec), f32),
                "spec_valid": ((b, max_spec), bool),
                "has_spectrum": ((b,), bool),
            }
            return {k: jax.ShapeDtypeStruct(shape, dtype)
                    for k, (shape, dtype) in dims.items()}

        meta = {"length_buckets": list(length_buckets), "max_spec": max_spec,
                "stats_baked_in": mean is not None, "buckets": {}}
        concrete_b = int(self.config.get_path("serve.batch_size", default=1024))
        for P in length_buckets:
            exported, bmeta = self._export_with_symbolic_batch(
                pipe._forward, params, lambda b, P=P: raw_struct(P, b), concrete_b
            )
            (out_path / f"serving_P{P}.stablehlo").write_bytes(exported.serialize())
            meta["buckets"][str(P)] = bmeta
        (out_path / "serving_meta.json").write_text(json.dumps(meta))

        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save((out_path / "params").absolute(), params, force=True)
        ckptr.wait_until_finished()
        return out_path

    def engine_serving(self, export_dir: str | Path | None = None,
                       raw_path: str | Path | None = None,
                       batch_size: int = 256, params=None) -> dict:
        """Serve a raw-data directory from an ``export_serving`` artifact.

        The deployment-side counterpart of ``engine()``: deserializes the
        per-bucket StableHLO programs + orbax params and classifies every
        alert with NO model code — only ``pack_alert_batch``'s host packing
        runs in Python. Returns the same summary shape as ``serve()``.
        """
        from applecider_tpu.infer.serve import iter_alert_samples
        from applecider_tpu.infer.stream import pack_alert_batch

        sec = self.config.section("serve")
        raw_path = raw_path or sec.get("data_location")
        if not raw_path:
            raise KeyError("[serve].data_location not set and no raw_path given")
        export_dir = (Path(export_dir) if export_dir
                      else sorted(self.workdir.glob("*-export-serving-*"))[-1])
        meta = json.loads((export_dir / "serving_meta.json").read_text())
        buckets = tuple(meta["length_buckets"])
        max_spec = int(meta["max_spec"])
        programs = {
            P: jax.export.deserialize(
                (export_dir / f"serving_P{P}.stablehlo").read_bytes())
            for P in buckets
        }
        if params is None:
            task = self._task()
            if not self.datasets:
                self.prepare()
            init_params, _, _ = self._restore_latest_params(task)
            import orbax.checkpoint as ocp

            params = ocp.StandardCheckpointer().restore(
                (export_dir / "params").absolute(), init_params)

        import time as _time

        infos, probs = [], []
        batch: list = []
        t0 = _time.perf_counter()

        def flush():
            if not batch:
                return
            raw = pack_alert_batch([s for _, s in batch],
                                   length_buckets=buckets, max_spec=max_spec)
            P = raw["photo_t"].shape[1]
            bmeta = meta.get("buckets", {}).get(str(P), {})
            n = len(batch)
            if not bmeta.get("symbolic_batch", True):
                # this bucket's program was exported at a CONCRETE batch
                # size (symbolic lowering failed — export() docs promise
                # the tail pads for those): repeat the last row to fill,
                # slice padding off below
                cb = int(bmeta.get("batch_size", n))
                if n > cb:
                    raise ValueError(
                        f"batch of {n} exceeds bucket P={P}'s concrete "
                        f"exported batch size {cb}; lower batch_size or "
                        f"re-export with a symbolic batch")
                if n < cb:
                    raw = {k: np.concatenate(
                        [v, np.repeat(v[-1:], cb - n, axis=0)])
                        for k, v in raw.items()}
            out = np.asarray(programs[P].call(params, raw))
            for j, (info, _) in enumerate(batch):
                infos.append(info)
                probs.append(out[j])
            batch.clear()

        for pair in iter_alert_samples(
            raw_path, causal_spectrum=bool(sec.get("causal_spectrum", True))
        ):
            batch.append(pair)
            if len(batch) >= batch_size:
                flush()
        flush()
        elapsed = _time.perf_counter() - t0
        results = [dict(info, probs=np.asarray(p, np.float32))
                   for info, p in zip(infos, probs)]
        return {"n_alerts": len(results), "seconds": elapsed,
                "alerts_per_sec": len(results) / elapsed if elapsed else 0.0,
                "results": results}

    def serve(self, raw_path: str | Path | None = None,
              params=None) -> dict:
        """Classify every alert of a raw-data directory, per-alert causal.

        The production shape (reference README.md:17-19;
        ``brew_cider.py:1134-1193`` evaluate-per-alert): raw L1 object
        dirs -> ragged per-alert samples -> the measured serving stack
        (``FusedSpectraStream`` + ``LengthBinnedFeeder``). Config under
        ``[serve]``: ``data_location`` (raw dir; overridable by the
        ``raw_path`` arg), ``batch_size``, ``binned``, ``causal_spectrum``,
        ``stats_event_path``. Weights come from the most recent trained
        run unless ``params`` is given. Writes ``alerts.jsonl`` +
        ``serve.json`` into a timestamped run dir; returns the summary.
        """
        from applecider_tpu.infer.serve import iter_alert_samples, serve_alert_stream

        sec = self.config.section("serve")
        raw_path = raw_path or sec.get("data_location")
        if not raw_path:
            raise KeyError("[serve].data_location not set and no raw_path given")
        task = self._task()
        if params is None:
            if not self.datasets:
                self.prepare()
            params, _, _ = self._restore_latest_params(task)
        mean, std = self._serve_stats()
        out_dir = self._new_run_dir("serve")
        summary = serve_alert_stream(
            task,
            params,
            iter_alert_samples(
                raw_path,
                causal_spectrum=bool(sec.get("causal_spectrum", True)),
            ),
            batch_size=int(sec.get("batch_size", 1024)),
            binned=bool(sec.get("binned", True)),
            length_buckets=tuple(sec.get("length_buckets", (63, 127, 191, 255, 257))),
            stats_mean=mean,
            stats_std=std,
            int8=bool(sec.get("int8", False)),
            out_jsonl=out_dir / "alerts.jsonl",
            horizon_days=self._serve_horizon(),
        )
        (out_dir / "serve.json").write_text(json.dumps(
            {k: v for k, v in summary.items() if k != "results"}
        ))
        summary["run_dir"] = out_dir
        return summary

    def warmup(self, params=None, batch_size: int | None = None,
               spectrum_fracs=(0.0, 0.1, 0.3)) -> dict:
        """Precompile the serving bucket set (VERDICT r4 #7).

        A fresh deployment host pays ~2 minutes of XLA compiles the first
        time each (length-bucket, spectra-bucket, batch) shape is served
        (measured: BENCH_r04 compile_seconds 125.7). This verb compiles
        the configured set up front — and, with the persistent compile
        cache (``jax.config jax_compilation_cache_dir``), persists them so
        every later process on the host starts warm. Weight VALUES don't
        matter for compilation, so a random init serves when no trained
        run exists (``params=None`` tries the latest run first).

        Returns ``{"programs": [...], "total_seconds": float}`` with
        per-shape compile+first-run times; re-running reports the warm
        (cache-hit) times — the cold/warm story in docs/SERVING.md.
        """
        import time as _time

        from applecider_tpu.infer.stream import FusedSpectraStream

        task = self._task()
        sec = self.config.section("serve")
        if params is None:
            try:
                if not self.datasets:
                    self.prepare()
                params, _, _ = self._restore_latest_params(task)
            except Exception:
                # no trained run / no datasets bound: weight VALUES are
                # irrelevant to compilation — init compile-only weights
                from applecider_tpu.models.fusion import AppleCiderTask

                if not isinstance(task, AppleCiderTask):
                    raise FileNotFoundError(
                        "warmup needs a trained run (or explicit params) "
                        f"for model {type(task).__name__}") from None
                r0 = np.random.default_rng(0)
                b = (r0.normal(size=(2, 257, 7)).astype(np.float32),
                     np.zeros((2, 257), bool),
                     r0.normal(size=(2, 24)).astype(np.float32),
                     r0.normal(size=(2, 63, 63, 3)).astype(np.float32),
                     r0.normal(size=(2, 3481)).astype(np.float32),
                     np.zeros(2, np.int64))
                params = jax.jit(lambda r: task.init(r, b)["params"])(
                    jax.random.PRNGKey(0))
        bs = int(batch_size or sec.get("batch_size", 1024))
        buckets = tuple(sec.get("length_buckets", (63, 127, 191, 255, 257)))
        mean, std = self._serve_stats()
        router = FusedSpectraStream(task, stats_mean=mean, stats_std=std,
                                    horizon_days=self._serve_horizon())
        rng = np.random.default_rng(0)

        def mk_samples(n, P, frac):
            out = []
            for i in range(n):
                L = max(2, min(P, int(rng.integers(max(2, P // 2), P + 1))))
                s = {
                    "photo_t": np.sort(rng.uniform(0, 60, L)).astype(np.float32),
                    "photo_flux": rng.lognormal(2.0, 1.0, L).astype(np.float32),
                    "photo_err": rng.uniform(0.1, 2.0, L).astype(np.float32),
                    "photo_band": rng.integers(0, 3, L).astype(np.int32),
                    "image": rng.normal(size=(63, 63, 3)).astype(np.float32),
                    "meta19": rng.normal(size=19).astype(np.float32),
                }
                if rng.random() < frac:
                    m = int(rng.integers(200, 500))
                    s["spec_wl"] = np.linspace(4000.0, 8500.0, m).astype(np.float32)
                    s["spec_flux"] = rng.normal(1.0, 0.3, m).astype(np.float32)
                out.append(s)
            return out

        t_all = _time.perf_counter()
        programs = []
        for P in buckets:
            for frac in spectrum_fracs:
                t0 = _time.perf_counter()
                samples = mk_samples(bs, P, frac)
                placed = router.place(samples, length_buckets=(P,))
                out = router.run_placed(params, placed)()
                assert np.isfinite(out).all()
                programs.append({"length_bucket": int(P),
                                 "spectrum_frac": float(frac),
                                 "batch": bs,
                                 "seconds": round(_time.perf_counter() - t0, 2)})
        result = {"programs": programs,
                  "total_seconds": round(_time.perf_counter() - t_all, 1)}
        return result

    def engine(self, export_dir: str | Path | None = None) -> np.ndarray:
        """Load an exported artifact and run it over the infer dataset."""
        if not self.datasets:
            self.prepare()
        task = self._task()
        if export_dir:
            export_dir = Path(export_dir)
        else:
            # '*-export-*' would also match '*-export-serving-*' run dirs
            # (which hold per-bucket serving programs, no model.stablehlo)
            dirs = [p for p in self.workdir.glob("*-export-*")
                    if "-export-serving-" not in p.name]
            export_dir = sorted(dirs)[-1]
        exported = jax.export.deserialize((export_dir / "model.stablehlo").read_bytes())

        import orbax.checkpoint as ocp

        loader = self._loader(self.datasets.get("infer") or self.datasets.get("train"), shuffle=False)
        batch0 = task.to_tensor(next(iter(loader)))
        variables = task.init(jax.random.PRNGKey(0), batch0)
        ckptr = ocp.StandardCheckpointer()
        params = ckptr.restore((export_dir / "params").absolute(), variables["params"])

        meta_file = export_dir / "export_meta.json"
        meta = json.loads(meta_file.read_text()) if meta_file.exists() else {}
        symbolic = bool(meta.get("symbolic_batch", False))
        export_bs = meta.get("batch_size")

        def _pad_to(x: np.ndarray, n: int) -> np.ndarray:
            # repeat the last row to fill — padding rows are sliced off below
            reps = np.repeat(x[-1:], n - x.shape[0], axis=0)
            return np.concatenate([x, reps], axis=0)

        outs = []
        for b in loader:
            batch = tuple(np.asarray(x) for x in task.to_tensor(b))
            n = batch[0].shape[0]
            if not symbolic and export_bs and n != export_bs:
                if n > export_bs:
                    raise ValueError(
                        f"batch of {n} exceeds the exported concrete batch size "
                        f"{export_bs}; re-export or lower data_loader.batch_size"
                    )
                padded = tuple(_pad_to(x, export_bs) for x in batch)
                outs.append(np.asarray(exported.call(params, *padded))[:n])
            else:
                outs.append(np.asarray(exported.call(params, *batch)))
        return np.concatenate(outs)
