"""Multi-device sharding on the virtual 8-CPU mesh (conftest provisions it).

Validates the pieces the driver's ``dryrun_multichip`` exercises, as
pytest-level coverage:
* ``shard_batch`` dim-0 sharding + ragged-tail replication fallback;
* ``expert_sharding_rules`` actually placing expert leaves on the model axis;
* ``Trainer.fit`` on a (2, 4) data x model mesh produces losses equal to the
  single-device run (same seeds, same batches).
"""

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from applecider_tpu.parallel.mesh import (
    batch_sharding,
    expert_sharding_rules,
    make_mesh,
    replicate,
    shard_batch,
)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


@needs_8
def test_shard_batch_divisible_and_ragged():
    mesh = make_mesh(shape=(4, 2))
    batch = {
        "x": np.arange(8 * 3, dtype=np.float32).reshape(8, 3),  # divisible by 4
        "ragged": np.ones((7, 2), np.float32),  # 7 % 4 != 0 -> replicated
        "stats": np.ones((4,), np.float32),  # divisible, 1-D: sharded on dim 0
        "scalar": np.float32(3.0),
    }
    out = shard_batch(batch, mesh)
    assert out["x"].sharding.spec == P("data", None)
    # each data-axis shard holds 2 rows on 2 model-replicated devices
    shard_shapes = {s.data.shape for s in out["x"].addressable_shards}
    assert shard_shapes == {(2, 3)}
    assert out["ragged"].sharding.spec == P()
    assert out["ragged"].addressable_shards[0].data.shape == (7, 2)
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])


@needs_8
def test_expert_sharding_rules_place_expert_leaves():
    from applecider_tpu.config import load_defaults
    from applecider_tpu.models.astrominn import AstroMiNNTask

    cfg = load_defaults()
    cfg.set("model.AstroMiNN.backbone_depths", [1, 1])
    cfg.set("model.AstroMiNN.backbone_dims", [8, 16])
    cfg.set("train.compute_dtype", "float32")
    task = AstroMiNNTask(cfg)
    rng = np.random.default_rng(0)
    batch = (
        rng.normal(size=(4, 24)).astype(np.float32),
        rng.normal(size=(4, 63, 63, 3)).astype(np.float32),
        rng.integers(0, 5, size=4).astype(np.int64),
    )
    params = task.init(jax.random.PRNGKey(0), batch)["params"]

    mesh = make_mesh(shape=(2, 4))
    rules = expert_sharding_rules(params, mesh)
    placed = jax.tree.map(jax.device_put, params, rules)

    # start kernel: (fusion_dims, fusion_hidden=128) — last dim splits 4 ways
    # (main_fc's out dim is num_classes=5, not divisible, stays replicated)
    kernel = placed["expert_0"]["start"]["kernel"]
    assert kernel.sharding.spec[-1] == "model"
    full = np.asarray(params["expert_0"]["start"]["kernel"])
    assert kernel.addressable_shards[0].data.shape[-1] == full.shape[-1] // 4
    # non-expert leaves replicated
    assert placed["router_fc1"]["kernel"].sharding.spec == P()
    # values unchanged by placement
    np.testing.assert_array_equal(np.asarray(kernel), full)


@needs_8
def test_trainer_fit_mesh_matches_single_device(tmp_path):
    """Same data + seeds on a (2,4) mesh vs a (1,1) mesh -> same losses."""
    from applecider_tpu.config import load_defaults
    from applecider_tpu.models.baseline_cls import BaselineCLSTask
    from applecider_tpu.train.trainer import Trainer

    rng = np.random.default_rng(3)
    n, L = 16, 32

    class Loader:
        def __iter__(self):
            for i in range(2):
                sl = slice(i * 8, (i + 1) * 8)
                yield {"data": {
                    "photometry": photometry[sl], "pad_mask": pad[sl],
                    "label": labels[sl], "mean": mean, "std": std,
                }}

        def set_epoch(self, epoch):
            pass

    photometry = rng.normal(size=(n, L, 7)).astype(np.float32)
    pad = np.zeros((n, L), bool)
    pad[:, 24:] = True
    labels = rng.integers(0, 5, size=n).astype(np.int64)
    mean = np.zeros(4, np.float32)
    std = np.ones(4, np.float32)

    def run(mesh_shape, workdir):
        cfg = load_defaults()
        cfg.set("model.BaselineCLS.d_model", 16)
        cfg.set("model.BaselineCLS.n_heads", 2)
        cfg.set("model.BaselineCLS.n_layers", 1)
        cfg.set("model.BaselineCLS.dropout", 0.0)
        cfg.set("train.compute_dtype", "float32")
        cfg.set("train.seed", 11)
        cfg.set("checkpoint.resume", False)
        cfg.set("parallel.mesh_shape", list(mesh_shape))
        trainer = Trainer(BaselineCLSTask(cfg), cfg, workdir)
        out = trainer.fit(Loader(), epochs=2)
        return [h["train_loss"] for h in out["history"]]

    losses_mesh = run((2, 4), tmp_path / "mesh")
    losses_single = run((1, 1), tmp_path / "single")
    assert np.isfinite(losses_mesh).all()
    np.testing.assert_allclose(losses_mesh, losses_single, rtol=2e-4, atol=1e-5)


@needs_8
def test_stream_pipeline_sharded_matches_single(tmp_path):
    """AlertStreamPipeline over an 8-device data mesh: outputs equal the
    unsharded pipeline, and the packed batch actually shards dim 0."""
    from applecider_tpu.infer.stream import AlertStreamPipeline, pack_alert_batch

    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
    from __graft_entry__ import _fusion_batch, _fusion_task
    from bench import make_stream_samples

    task = _fusion_task(tiny=True, compute_dtype="float32")
    batch = _fusion_batch(8, tiny=True)
    params = task.init(jax.random.PRNGKey(0), batch)["params"]

    raw = pack_alert_batch(make_stream_samples(8, seed=2), max_photo=32, max_spec=64)
    grid = np.linspace(4500.0, 7980.0, 128).astype(np.float32)

    plain = AlertStreamPipeline(task, wave_grid=grid)
    probs_plain = np.asarray(plain(params, raw))

    mesh = make_mesh(shape=(8, 1))
    sharded = AlertStreamPipeline(task, wave_grid=grid, mesh=mesh)
    out = sharded(params, raw)
    assert len({s.device for s in out.addressable_shards}) == 8
    np.testing.assert_allclose(np.asarray(out), probs_plain, rtol=2e-5, atol=2e-6)


def test_routed_stream_sharded_matches_single():
    """RoutedAlertStream composes with a data mesh: both sub-pipelines
    shard their sub-batches over the mesh and the routed results equal the
    unsharded router's, in input order."""
    from applecider_tpu.infer.stream import RoutedAlertStream

    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
    from __graft_entry__ import _fusion_batch, _fusion_task

    rng = np.random.default_rng(5)
    task = _fusion_task(tiny=True, compute_dtype="float32")
    params = task.init(jax.random.PRNGKey(0), _fusion_batch(4, tiny=True))["params"]
    grid = np.linspace(4500.0, 7980.0, 128).astype(np.float32)

    samples = []
    for i in range(12):
        t = np.sort(rng.uniform(0, 30, 20)).astype(np.float32)
        s = {
            "photo_t": t,
            "photo_flux": rng.uniform(1, 100, 20).astype(np.float32),
            "photo_err": rng.uniform(0.1, 2, 20).astype(np.float32),
            "photo_band": rng.integers(0, 3, 20).astype(np.int32),
            "image": rng.normal(size=(63, 63, 3)).astype(np.float32),
            "meta19": rng.normal(size=19).astype(np.float32),
        }
        if i % 3 == 0:  # 4 of 12 carry spectra -> sub-batches of 4 and 8
            s["spec_wl"] = np.sort(rng.uniform(4000, 8500, 60)).astype(np.float32)
            s["spec_flux"] = rng.normal(size=60).astype(np.float32)
        samples.append(s)

    plain = RoutedAlertStream(task, batch_buckets=(4, 8), wave_grid=grid)
    want = plain(params, samples)

    mesh = make_mesh(shape=(4, 1))
    routed = RoutedAlertStream(task, batch_buckets=(4, 8), wave_grid=grid, mesh=mesh)
    got = routed(params, samples)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@needs_8
def test_fused_stream_sharded_matches_single():
    """FusedSpectraStream composes with a data mesh: batch tensors shard
    dim 0, the compact spectra block replicates (every shard gathers from
    the full block), outputs equal the unsharded router's."""
    from applecider_tpu.infer.stream import FusedSpectraStream

    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
    from __graft_entry__ import _fusion_batch, _fusion_task
    from bench import make_stream_samples

    task = _fusion_task(tiny=True, compute_dtype="float32")
    params = task.init(jax.random.PRNGKey(0), _fusion_batch(4, tiny=True))["params"]
    grid = np.linspace(4500.0, 7980.0, 128).astype(np.float32)
    samples = make_stream_samples(16, seed=9, spectrum_frac=0.4)

    plain = FusedSpectraStream(task, wave_grid=grid)
    ref = plain(params, samples, length_buckets=(32, 64))

    mesh = make_mesh(shape=(8, 1))
    fused = FusedSpectraStream(task, wave_grid=grid, mesh=mesh)
    placed = fused.place(samples, length_buckets=(32, 64))
    # batch tensors shard 8-way; the compact spectra block replicates
    assert len({s.device for s in placed["image"].addressable_shards}) == 8
    assert placed["spec_wl"].sharding.is_fully_replicated
    got = fused.run_placed(params, placed)()
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_fused_stream_mesh_pallas_interpret(monkeypatch):
    """VERDICT r3 #4: force the PALLAS merge kernel (interpret mode) through
    FusedSpectraStream on the 8-CPU mesh, so the kernel's Shardy
    custom_partitioning rule executes inside the full serving program — not
    only in the kernel-level unit test. Outputs must equal the XLA path."""
    from applecider_tpu.infer.stream import FusedSpectraStream

    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
    from __graft_entry__ import _fusion_batch, _fusion_task
    from bench import make_stream_samples

    task = _fusion_task(tiny=True, compute_dtype="float32")
    params = task.init(jax.random.PRNGKey(0), _fusion_batch(4, tiny=True))["params"]
    grid = np.linspace(4500.0, 7980.0, 128).astype(np.float32)
    samples = make_stream_samples(16, seed=11, spectrum_frac=0.4)

    monkeypatch.delenv("ACMERGE", raising=False)
    ref = FusedSpectraStream(task, wave_grid=grid)(
        params, samples, length_buckets=(32, 64))

    monkeypatch.setenv("ACMERGE", "pallas_interpret")
    mesh = make_mesh(shape=(8, 1))
    fused = FusedSpectraStream(task, wave_grid=grid, mesh=mesh)
    got = fused(params, samples, length_buckets=(32, 64))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)
