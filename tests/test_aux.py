"""Aux subsystems: plots, augmentation, class weights, observability, experimental."""

import jax
import jax.numpy as jnp
import numpy as np

from applecider_tpu.datasets.spectra_dataset import augment_edge_crop
from applecider_tpu.models.experimental import (
    CNNTower,
    PositionEmbedding,
    position_embedding_sine,
    soft_centroid,
)
from applecider_tpu.ops.losses import power_class_weights
from applecider_tpu.utils.observability import grad_norm, multi_seed_run
from applecider_tpu.utils.plots import (
    plot_confusion_matrix,
    plot_pr_curves,
    plot_redshift_scatter,
    plot_roc_curves,
)

CLASSES = ["SN I", "SN II", "CV", "AGN", "TDE"]


def test_plots_write_files(tmp_path, rng):
    labels = rng.integers(0, 5, size=100)
    logits = rng.normal(size=(100, 5)) + 2.0 * np.eye(5)[labels]
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    preds = probs.argmax(1)
    plot_confusion_matrix(preds, labels, CLASSES, save_path=tmp_path / "cm.png")
    plot_roc_curves(probs, labels, CLASSES, save_path=tmp_path / "roc.png")
    plot_pr_curves(probs, labels, CLASSES, save_path=tmp_path / "pr.png")
    plot_redshift_scatter(rng.uniform(0, 1, 50), rng.uniform(0, 1, 50), save_path=tmp_path / "z.png")
    for f in ("cm.png", "roc.png", "pr.png", "z.png"):
        assert (tmp_path / f).stat().st_size > 0


def test_edge_crop_augment(rng):
    flux = np.ones(100, np.float32)
    out = augment_edge_crop(flux, np.random.default_rng(0), max_frac=0.25)
    assert out.shape == flux.shape
    # zeros only at the edges; center untouched
    assert (out[30:70] == 1.0).all()
    assert flux.sum() >= out.sum()


def test_power_class_weights():
    w = power_class_weights([100, 10], exponent=1.0)
    assert w[1] / w[0] == 10.0
    w2 = power_class_weights([100, 10], exponent=0.5)
    assert w2[1] / w2[0] < 10.0


def test_grad_norm_matches_torch_semantics(rng):
    import torch

    g1 = rng.normal(size=(3, 4)).astype(np.float32)
    g2 = rng.normal(size=(7,)).astype(np.float32)
    ours = float(grad_norm({"a": jnp.asarray(g1), "b": jnp.asarray(g2)}))
    ref = float(torch.linalg.vector_norm(
        torch.cat([torch.tensor(g1).flatten(), torch.tensor(g2).flatten()])))
    assert abs(ours - ref) < 1e-5


def test_multi_seed_run():
    out = multi_seed_run(lambda seed: {"acc": 0.5 + seed * 0.01}, [0, 1, 2])
    assert abs(out["summary"]["acc"]["mean"] - 0.51) < 1e-9
    assert out["summary"]["acc"]["std"] > 0


def test_position_embedding_variants(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    for kind in ("sine", "learned", "fourier"):
        mod = PositionEmbedding(16, kind)
        params = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(params, x)
        assert out.shape == x.shape
    pe = position_embedding_sine(8, 8, 16)
    assert pe.shape == (8, 8, 16)
    assert np.isfinite(np.asarray(pe)).all()


def test_soft_centroid_peak():
    attn = np.full((1, 9, 9), -10.0, np.float32)
    attn[0, 2, 6] = 20.0
    c = np.asarray(soft_centroid(jnp.asarray(attn)))
    np.testing.assert_allclose(c[0], [2.0, 6.0], atol=0.05)


def test_cnn_tower(rng):
    m = CNNTower(channels=8, depth=2, outdims=16, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    out = m.apply({"params": params}, x)
    assert out.shape == (2, 16)


def test_taxonomy_mappings():
    from applecider_tpu.datasets.taxonomy import (
        downsample_per_class,
        map_labels,
        to_coarse4,
        to_coarse5,
        to_fine10,
    )

    assert to_coarse5("SN Ia") == 0 and to_coarse5("SN IIn") == 1
    assert to_coarse5("Tidal Disruption Event") == 4
    assert to_coarse4("SN IIb") == 0 and to_coarse4("AGN") == 2
    assert to_fine10("SN Ic") == 1
    labels = map_labels(["AGN", "SN Ia", "Cataclysmic"], "coarse5")
    assert labels.tolist() == [3, 0, 2]

    y = np.array([0] * 50 + [1] * 5)
    keep = downsample_per_class(y, max_samples=10, seed=0)
    assert (y[keep] == 0).sum() == 10 and (y[keep] == 1).sum() == 5


def test_logit_sequence_dataset(tmp_path, rng):
    from applecider_tpu.config import load_defaults
    from applecider_tpu.datasets.logit_sequence_dataset import LogitSequenceDataset

    seqs = [rng.normal(size=(int(rng.integers(2, 12)), 12)).astype(np.float32) for _ in range(6)]
    np.savez(tmp_path / "t.npz",
             sequences=np.asarray(seqs, object),
             labels=np.arange(6) % 5)
    ds = LogitSequenceDataset(load_defaults(), tmp_path / "t.npz")
    assert len(ds) == 6
    batch = ds.collate([ds.sample(i) for i in range(4)])["data"]
    assert batch["sequence"].shape == (4, 10, 12)
    assert batch["pad_mask"].shape == (4, 10)


def _photo_loader(seed: int, n: int = 8, L: int = 16):
    """Single-batch loader + tiny-BaselineCLS config used by the Trainer tests."""
    rng_np = np.random.default_rng(seed)
    photometry = rng_np.normal(size=(n, L, 7)).astype(np.float32)
    pad = np.zeros((n, L), bool)
    labels = rng_np.integers(0, 5, n).astype(np.int64)

    class Loader:
        def __iter__(self):
            yield {"data": {"photometry": photometry, "pad_mask": pad, "label": labels,
                            "mean": np.zeros(4, np.float32), "std": np.ones(4, np.float32)}}

        def set_epoch(self, epoch):
            pass

    return Loader


def _tiny_cls_config():
    from applecider_tpu.config import load_defaults

    cfg = load_defaults()
    cfg.set("model.BaselineCLS.d_model", 16)
    cfg.set("model.BaselineCLS.n_heads", 2)
    cfg.set("model.BaselineCLS.n_layers", 1)
    cfg.set("model.BaselineCLS.dropout", 0.0)
    cfg.set("train.compute_dtype", "float32")
    cfg.set("checkpoint.resume", False)
    return cfg


def test_plateau_scale_halves_updates():
    """with_plateau_scale: host-set multiplier scales optimizer updates
    without rebuilding the transformation."""
    import jax.numpy as jnp
    import optax

    from applecider_tpu.train.optim import set_plateau_scale, with_plateau_scale

    tx = with_plateau_scale(optax.sgd(1.0))
    params = {"w": jnp.ones(3)}
    grads = {"w": jnp.full(3, 2.0)}
    state = tx.init(params)
    up1, state = tx.update(grads, state, params)
    state = set_plateau_scale(state, 0.5)
    up2, _ = tx.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(up2["w"]), np.asarray(up1["w"]) * 0.5)


def test_trainer_plateau_lowers_lr_scale(tmp_path):
    """plateau_factor>0: non-improving val loss lowers the logged lr_scale."""
    import jax

    from applecider_tpu.config import load_defaults
    from applecider_tpu.models.baseline_cls import BaselineCLSTask
    from applecider_tpu.train.trainer import Trainer

    Loader = _photo_loader(seed=0)

    cfg = _tiny_cls_config()
    cfg.set("model.BaselineCLS.lr", 0.0)  # loss cannot improve -> plateau fires
    cfg.set("train.compute_dtype", "float32")
    cfg.set("train.plateau_factor", 0.5)
    cfg.set("train.plateau_patience", 0)
    cfg.set("checkpoint.resume", False)
    trainer = Trainer(BaselineCLSTask(cfg), cfg, tmp_path)
    out = trainer.fit(Loader(), Loader(), epochs=4)
    scales = [h.get("lr_scale") for h in out["history"]]
    assert scales[0] == 1.0 or scales[1] < 1.0  # first epoch sets best
    assert scales[-1] < 1.0
    assert min(s for s in scales if s) >= 1e-3


def test_remat_training_matches_exact(tmp_path):
    """train.remat=true reproduces the exact loss trajectory (recompute,
    not approximation)."""
    import jax

    from applecider_tpu.config import load_defaults
    from applecider_tpu.models.baseline_cls import BaselineCLSTask
    from applecider_tpu.train.trainer import Trainer

    Loader = _photo_loader(seed=4)

    def run(remat, workdir):
        cfg = _tiny_cls_config()
        cfg.set("train.remat", remat)
        cfg.set("checkpoint.resume", False)
        trainer = Trainer(BaselineCLSTask(cfg), cfg, workdir)
        return [h["train_loss"] for h in trainer.fit(Loader(), epochs=3)["history"]]

    np.testing.assert_allclose(
        run(True, tmp_path / "remat"), run(False, tmp_path / "exact"), rtol=1e-6
    )


def test_plateau_state_survives_resume(tmp_path):
    """Resuming from a checkpoint keeps the reduced LR scale (it must not
    snap back to 1.0 on the first post-resume epoch)."""
    import jax

    from applecider_tpu.config import load_defaults
    from applecider_tpu.models.baseline_cls import BaselineCLSTask
    from applecider_tpu.train.trainer import Trainer

    Loader = _photo_loader(seed=1)

    def cfg_():
        cfg = _tiny_cls_config()
        cfg.set("model.BaselineCLS.lr", 0.0)
        cfg.set("train.plateau_factor", 0.5)
        cfg.set("train.plateau_patience", 0)
        cfg.set("checkpoint.resume", True)  # this test is about resuming
        return cfg

    t1 = Trainer(BaselineCLSTask(cfg_()), cfg_(), tmp_path)
    out1 = t1.fit(Loader(), Loader(), epochs=3)
    assert t1.plateau.scale < 1.0

    t2 = Trainer(BaselineCLSTask(cfg_()), cfg_(), tmp_path)
    out2 = t2.fit(Loader(), Loader(), epochs=4)
    scales = [h.get("lr_scale") for h in out2["history"]]
    # first post-resume epoch continues from the reduced scale
    assert scales[0] is not None and scales[0] <= t1.plateau.scale


def test_freeze_params_keeps_trunk_fixed(tmp_path):
    """train.freeze_params=['trunk'] trains the head only (strategy B)."""
    import jax

    from applecider_tpu.config import load_defaults
    from applecider_tpu.models.baseline_cls import BaselineCLSTask
    from applecider_tpu.train.trainer import Trainer

    Loader = _photo_loader(seed=2)

    cfg = _tiny_cls_config()
    cfg.set("train.freeze_params", ["trunk"])
    cfg.set("checkpoint.resume", False)
    task = BaselineCLSTask(cfg)
    trainer = Trainer(task, cfg, tmp_path)

    batch0 = task.to_tensor(next(iter(Loader())))
    # reproduce fit's init key derivation (PRNGKey(train.seed) -> split)
    _, init_rng = jax.random.split(jax.random.PRNGKey(42))
    init = task.init(init_rng, batch0)["params"]
    out = trainer.fit(Loader(), epochs=2)
    final = out["state"].params
    trunk_moved = np.abs(
        np.asarray(final["trunk"]["in_proj"]["kernel"])
        - np.asarray(init["trunk"]["in_proj"]["kernel"])
    ).max()
    # same seed => same init; trunk must be untouched, head must move
    assert trunk_moved == 0.0
    head_moved = np.abs(
        np.asarray(final["fc"]["kernel"]) - np.asarray(init["fc"]["kernel"])
    ).max()
    assert head_moved > 0.0


def test_eval_with_ema_uses_shadow_weights(tmp_path):
    """With EMA enabled, validation runs on the shadow weights (reference
    apply_shadow recipe): high decay keeps the shadow near init, so val loss
    differs from a raw-params evaluation."""
    import jax

    from applecider_tpu.config import load_defaults
    from applecider_tpu.models.baseline_cls import BaselineCLSTask
    from applecider_tpu.train.trainer import Trainer

    Loader = _photo_loader(seed=6)

    def run(eval_with_ema, workdir):
        cfg = _tiny_cls_config()
        cfg.set("model.BaselineCLS.lr", 0.05)  # big steps so params move far
        cfg.set("train.compute_dtype", "float32")
        cfg.set("train.ema_decay", 0.999)
        cfg.set("train.eval_with_ema", eval_with_ema)
        cfg.set("checkpoint.resume", False)
        trainer = Trainer(BaselineCLSTask(cfg), cfg, workdir)
        out = trainer.fit(Loader(), Loader(), epochs=2)
        return out["history"][-1]["val_loss"]

    ema_loss = run(True, tmp_path / "ema")
    raw_loss = run(False, tmp_path / "raw")
    assert abs(ema_loss - raw_loss) > 1e-6
