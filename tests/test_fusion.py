"""AppleCider fusion: shapes, l2-norm semantics, train step, to_tensor."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch

from applecider_tpu.config import load_defaults
from applecider_tpu.models.fusion import AppleCiderTask, l2_normalize


def _tiny_cfg():
    cfg = load_defaults()
    cfg.set("model.BaselineCLS.d_model", 16)
    cfg.set("model.BaselineCLS.n_heads", 2)
    cfg.set("model.BaselineCLS.n_layers", 1)
    cfg.set("model.BaselineCLS.dropout", 0.0)
    cfg.set("model.SpectraNet.channels", [4, 8])
    cfg.set("model.SpectraNet.depths", [1, 1])
    cfg.set("model.SpectraNet.kernel_sizes_per_stage", [[3, 7], [3, 5]])
    cfg.set("model.AstroMiNN.backbone_depths", [1, 1])
    cfg.set("model.AstroMiNN.backbone_dims", [8, 16])
    cfg.set("train.compute_dtype", "float32")
    return cfg


def _batch(rng, B=4):
    photo = rng.normal(size=(B, 20, 7)).astype(np.float32)
    pad = np.zeros((B, 20), bool)
    meta = rng.normal(size=(B, 24)).astype(np.float32)
    img = rng.normal(size=(B, 63, 63, 3)).astype(np.float32)
    spec = rng.normal(size=(B, 128)).astype(np.float32)
    labels = rng.integers(0, 5, size=B)
    return (jnp.asarray(photo), jnp.asarray(pad), jnp.asarray(meta),
            jnp.asarray(img), jnp.asarray(spec), jnp.asarray(labels))


def test_l2_normalize_matches_torch(rng):
    x = rng.normal(size=(4, 5)).astype(np.float32)
    ours = np.asarray(l2_normalize(jnp.asarray(x)))
    t = torch.tensor(x)
    ref = (t / t.norm(dim=-1, keepdim=True)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_fusion_forward_and_train(rng):
    cfg = _tiny_cfg()
    task = AppleCiderTask(cfg)
    batch = _batch(rng)
    variables = task.init(jax.random.PRNGKey(0), batch)
    params = variables["params"]

    logits = task.predict(params, batch)
    assert logits.shape == (4, 5)

    tx = task.make_optimizer()
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        (loss, aux), grads = jax.value_and_grad(task.loss_fn, has_aux=True)(params, batch, rng, True)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(5):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_fusion_concat_mode(rng):
    cfg = _tiny_cfg()
    cfg.set("model.AppleCider.fusion", "concat")
    task = AppleCiderTask(cfg)
    batch = _batch(rng)
    variables = task.init(jax.random.PRNGKey(0), batch)
    assert task.predict(variables["params"], batch).shape == (4, 5)


def test_embeddings_are_unit_norm(rng):
    cfg = _tiny_cfg()
    task = AppleCiderTask(cfg)
    batch = _batch(rng)
    variables = task.init(jax.random.PRNGKey(0), batch)
    p, im, s = task.module.apply(
        {"params": variables["params"]}, *batch[:5], deterministic=True, return_embeddings=True
    )
    for emb in (p, im, s):
        np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0, rtol=1e-4)


def test_to_tensor_fusion():
    data = {
        "data": {
            "photometry": np.ones((2, 8, 7), np.float32),
            "pad_mask": np.zeros((2, 8), bool),
            "metadata": np.zeros((2, 24), np.float32),
            "image": np.zeros((2, 3, 63, 63), np.float32),
            "spectrum": np.zeros((2, 64), np.float32),
            "label": [0, 3],
            "mean": np.zeros(4, np.float32),
            "std": np.ones(4, np.float32),
        }
    }
    out = AppleCiderTask.to_tensor(data)
    assert out[3].shape == (2, 63, 63, 3)
    assert out[5].tolist() == [0, 3]


def test_fusion_with_tripool_encoder_trains(tmp_path, rng):
    """model.AppleCider.spectra_encoder='tripool' (LN mode) trains end-to-end
    through the Trainer."""
    from applecider_tpu.config import load_defaults
    from applecider_tpu.models.fusion import AppleCiderTask
    from applecider_tpu.train.trainer import Trainer

    cfg = load_defaults()
    for k, v in {
        "model.BaselineCLS.d_model": 16, "model.BaselineCLS.n_heads": 2,
        "model.BaselineCLS.n_layers": 1, "model.BaselineCLS.dropout": 0.0,
        "model.AppleCider.spectra_encoder": "tripool",
        "model.SpectraNetTriPool.channels": [4, 8],
        "model.SpectraNetTriPool.depths": [1, 1],
        "model.AstroMiNN.backbone_depths": [1, 1],
        "model.AstroMiNN.backbone_dims": [8, 16],
        "train.compute_dtype": "float32",
        "checkpoint.resume": False,
    }.items():
        cfg.set(k, v)
    task = AppleCiderTask(cfg)
    task.module = task.module.copy(
        spectra_encoder=task.module.spectra_encoder.copy(
            kernel_sizes_per_stage=((3, 7, 15), (3, 5, 7))
        )
    )

    n = 8
    batch_data = {
        "photometry": rng.normal(size=(n, 24, 7)).astype(np.float32),
        "pad_mask": np.zeros((n, 24), bool),
        "metadata": rng.normal(size=(n, 24)).astype(np.float32),
        "image": rng.normal(size=(n, 63, 63, 3)).astype(np.float32),
        "spectrum": rng.normal(size=(n, 256)).astype(np.float32),
        "label": rng.integers(0, 5, n).astype(np.int64),
        "mean": np.zeros(4, np.float32), "std": np.ones(4, np.float32),
    }

    class Loader:
        def __iter__(self):
            yield {"data": batch_data}

        def set_epoch(self, epoch):
            pass

    out = Trainer(task, cfg, tmp_path).fit(Loader(), epochs=2)
    losses = [h["train_loss"] for h in out["history"]]
    assert np.isfinite(losses).all() and losses[1] < losses[0]
