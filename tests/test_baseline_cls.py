"""BaselineCLS: torch parity (1e-4), jit/grad sanity, task wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from applecider_tpu.config import load_defaults
from applecider_tpu.models.baseline_cls import BaselineCLSModule, BaselineCLSTask
from applecider_tpu.utils.torch_port import baseline_cls_params
from tests.torch_refs import TorchBaselineCLS, state_dict_numpy


def _random_batch(rng, B=4, L=37):
    x = rng.normal(size=(B, L, 7)).astype(np.float32)
    x[..., 4:] = 0.0
    bands = rng.integers(0, 3, size=(B, L))
    x[np.arange(B)[:, None], np.arange(L)[None, :], 4 + bands] = 1.0
    lengths = rng.integers(5, L + 1, size=B)
    pad = np.arange(L)[None, :] >= lengths[:, None]
    return x, pad


def test_parity_vs_torch(rng):
    torch.manual_seed(0)
    tm = TorchBaselineCLS(d_model=64, n_heads=4, n_layers=2, num_classes=5, dropout=0.3)
    tm.eval()
    x, pad = _random_batch(rng)
    with torch.no_grad():
        ref = tm(torch.tensor(x), torch.tensor(pad)).numpy()

    module = BaselineCLSModule(d_model=64, n_heads=4, n_layers=2, num_classes=5,
                               dropout=0.3, dtype=jnp.float32)
    params = baseline_cls_params(state_dict_numpy(tm), n_layers=2)
    ours = module.apply({"params": params}, jnp.asarray(x), jnp.asarray(pad), deterministic=True)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_embedding_mode_parity(rng):
    """Fusion mode: output is the normalized CLS embedding (no fc)."""
    torch.manual_seed(1)
    tm = TorchBaselineCLS(d_model=32, n_heads=4, n_layers=1, dropout=0.0, classification=False)
    tm.eval()
    x, pad = _random_batch(rng, B=3, L=11)
    with torch.no_grad():
        ref = tm(torch.tensor(x), torch.tensor(pad)).numpy()
    module = BaselineCLSModule(d_model=32, n_heads=4, n_layers=1, dropout=0.0,
                               classification=False, dtype=jnp.float32)
    params = baseline_cls_params(state_dict_numpy(tm), n_layers=1, classification=False)
    ours = module.apply({"params": params}, jnp.asarray(x), jnp.asarray(pad), deterministic=True)
    assert ours.shape == (3, 32)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_task_train_step_decreases_loss(rng):
    cfg = load_defaults()
    cfg.set("model.BaselineCLS.d_model", 32)
    cfg.set("model.BaselineCLS.n_heads", 4)
    cfg.set("model.BaselineCLS.n_layers", 1)
    cfg.set("model.BaselineCLS.dropout", 0.0)
    cfg.set("train.compute_dtype", "float32")
    task = BaselineCLSTask(cfg)

    x, pad = _random_batch(rng, B=8, L=16)
    labels = rng.integers(0, 5, size=8)
    batch = (jnp.asarray(x), jnp.asarray(pad), jnp.asarray(labels))

    key = jax.random.PRNGKey(0)
    variables = task.init(key, batch)
    params = variables["params"]
    tx = task.make_optimizer()
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        (loss, aux), grads = jax.value_and_grad(task.loss_fn, has_aux=True)(params, batch, rng, True)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax_apply(params, updates), opt_state, loss

    import optax

    def optax_apply(params, updates):
        return optax.apply_updates(params, updates)

    loss0 = None
    for i in range(8):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        if loss0 is None:
            loss0 = float(loss)
    assert float(loss) < loss0


def test_to_tensor_normalizes():
    photo = np.ones((2, 5, 7), dtype=np.float32)
    data = {
        "data": {
            "photometry": photo,
            "label": [1, 2],
            "mean": np.full(4, 0.5, np.float32),
            "std": np.full(4, 2.0, np.float32),
            "pad_mask": np.zeros((2, 5), bool),
        }
    }
    x, pad, labels = BaselineCLSTask.to_tensor(data)
    np.testing.assert_allclose(x[..., :4], (1.0 - 0.5) / (2.0 + 1e-8), rtol=1e-5)
    np.testing.assert_allclose(x[..., 4:], 1.0)
    assert labels.tolist() == [1, 2]


def test_remat_matches_plain_loss_and_grads(rng):
    """model.*.remat rematerializes encoder layers in the backward; the
    lifted remat replays the same dropout RNG, so the loss must be
    bit-identical and grads equal to reassociation-level noise (~1e-8 f32:
    XLA fuses the recompute differently than the saved-forward graph)."""
    x, pad = _random_batch(rng, B=4, L=12)
    labels = rng.integers(0, 5, size=4)
    batch = (jnp.asarray(x), jnp.asarray(pad), jnp.asarray(labels))
    outs = {}
    for remat in (False, True, "attn"):
        cfg = load_defaults()
        cfg.set("model.BaselineCLS.d_model", 32)
        cfg.set("model.BaselineCLS.n_heads", 4)
        cfg.set("model.BaselineCLS.n_layers", 2)
        cfg.set("model.BaselineCLS.dropout", 0.4)
        cfg.set("model.BaselineCLS.remat", remat)
        cfg.set("train.compute_dtype", "float32")
        task = BaselineCLSTask(cfg)
        params = task.init(jax.random.PRNGKey(0), batch)["params"]
        (loss, _), grads = jax.jit(
            jax.value_and_grad(task.loss_fn, has_aux=True), static_argnums=3
        )(params, batch, jax.random.PRNGKey(7), True)
        outs[remat] = (float(loss), jax.tree_util.tree_map(np.asarray, grads))
    for variant in (True, "attn"):
        assert outs[False][0] == outs[variant][0]
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
            outs[False][1], outs[variant][1])
