"""AstroMiNN: torch parity (dense dispatch == masked-loop), optimizer groups."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch

from applecider_tpu.config import load_defaults
from applecider_tpu.models.astrominn import (
    AstroMiNNModule,
    AstroMiNNTask,
    ResidualTowerBlock,
    param_group_label,
)
from applecider_tpu.utils.torch_port import astrominn_params, residual_tower_params
from tests.torch_refs import TorchAstroMiNN, TorchResidualTower, state_dict_numpy


def test_residual_tower_parity(rng):
    torch.manual_seed(21)
    tm = TorchResidualTower(7, 16, 32)
    tm.eval()
    x = rng.normal(size=(5, 7)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    mod = ResidualTowerBlock(16, 32, dtype=jnp.float32)
    sd = {f"t.{k}": v for k, v in state_dict_numpy(tm).items()}
    params = residual_tower_params(sd, "t", has_skip=True)
    ours = mod.apply({"params": params}, jnp.asarray(x), deterministic=True)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_astrominn_full_parity(rng):
    torch.manual_seed(22)
    tm = TorchAstroMiNN(backbone_dims=(8, 16), backbone_depths=(1, 1))
    tm.eval()
    B = 6
    meta = rng.normal(size=(B, 24)).astype(np.float32)
    img = rng.normal(size=(B, 3, 63, 63)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(meta), torch.tensor(img)).numpy()

    module = AstroMiNNModule(
        backbone_depths=(1, 1), backbone_dims=(8, 16), dtype=jnp.float32
    )
    params = astrominn_params(state_dict_numpy(tm), (1, 1))
    ours = module.apply(
        {"params": params}, jnp.asarray(meta),
        jnp.asarray(np.transpose(img, (0, 2, 3, 1))), deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_param_group_labels():
    assert param_group_label("expert_3") == "expert"
    assert param_group_label("router_fc1") == "router"
    assert param_group_label("image_tower") == "image_tower"


def test_task_train_step(rng):
    cfg = load_defaults()
    cfg.set("model.AstroMiNN.backbone_depths", [1, 1])
    cfg.set("model.AstroMiNN.backbone_dims", [8, 16])
    cfg.set("train.compute_dtype", "float32")
    task = AstroMiNNTask(cfg)

    B = 8
    meta = rng.normal(size=(B, 24)).astype(np.float32)
    img = rng.normal(size=(B, 63, 63, 3)).astype(np.float32)
    labels = rng.integers(0, 5, size=B)
    targets = np.eye(5, dtype=np.float32)[labels]
    batch = (jnp.asarray(meta), jnp.asarray(img), jnp.asarray(targets))

    variables = task.init(jax.random.PRNGKey(0), batch)
    params = variables["params"]
    tx = task.make_optimizer()
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        (loss, aux), grads = jax.value_and_grad(task.loss_fn, has_aux=True)(params, batch, rng, True)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(6):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_to_tensor_nchw_conversion():
    data = {
        "data": {
            "metadata": np.zeros((2, 24), np.float32),
            "image": np.zeros((2, 3, 63, 63), np.float32),
            "target": np.eye(5, dtype=np.float32)[[0, 1]],
        }
    }
    meta, img, tgt = AstroMiNNTask.to_tensor(data)
    assert img.shape == (2, 63, 63, 3)
    assert tgt.shape == (2, 5)
