"""MPT: masking semantics, torch trunk parity, pretrain step, weight surgery."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from applecider_tpu.config import load_defaults
from applecider_tpu.models.baseline_cls import BaselineCLSTask
from applecider_tpu.models.mpt import (
    MPTModule,
    MPTTask,
    apply_event_mask,
    band_stratified_mask,
    warmstart_classifier_params,
)
from applecider_tpu.utils.torch_port import mpt_params
from tests.torch_refs import TorchMPT, state_dict_numpy


def _batch(rng, B=6, L=40):
    x = rng.normal(size=(B, L, 7)).astype(np.float32)
    x[..., 4:] = 0.0
    bands = rng.integers(0, 3, size=(B, L))
    x[np.arange(B)[:, None], np.arange(L)[None, :], 4 + bands] = 1.0
    lengths = rng.integers(min(12, L), L + 1, size=B)
    pad = np.arange(L)[None, :] >= lengths[:, None]
    return x, pad, bands, lengths


def test_mask_counts_and_stratification(rng):
    x, pad, bands, lengths = _batch(rng)
    key = jax.random.PRNGKey(0)
    mask = np.asarray(band_stratified_mask(key, jnp.asarray(bands), jnp.asarray(pad), 0.30))
    # never masks padding
    assert not (mask & pad).any()
    for b in range(len(lengths)):
        n_valid = int(lengths[b])
        k = max(int(n_valid * 0.30), 3)
        num_each = k // 3
        extras = k - 3 * num_each
        # per-band quota: min(count_band, num_each); extras fill from the rest
        expected = 0
        for band in range(3):
            count_b = int(((bands[b] == band) & ~pad[b]).sum())
            expected += min(count_b, num_each)
        expected += min(extras, n_valid - expected)
        assert mask[b].sum() == expected


def test_apply_event_mask_zeroes_channels(rng):
    x, pad, bands, _ = _batch(rng, B=2, L=10)
    mask = np.zeros((2, 10), bool)
    mask[0, 3] = True
    out = np.asarray(apply_event_mask(jnp.asarray(x), jnp.asarray(mask)))
    np.testing.assert_allclose(out[0, 3, 2:], 0.0)
    np.testing.assert_allclose(out[0, 3, :2], x[0, 3, :2])  # dt channels survive
    np.testing.assert_allclose(out[1], x[1])


def test_trunk_parity_vs_torch(rng):
    torch.manual_seed(3)
    tm = TorchMPT(d_model=32, n_heads=4, n_layers=2, dropout=0.0)
    tm.eval()
    x, pad, _, _ = _batch(rng, B=3, L=15)
    with torch.no_grad():
        f_ref, b_ref, dt_ref = tm(torch.tensor(x), torch.tensor(pad))
    module = MPTModule(d_model=32, n_heads=4, n_layers=2, dropout=0.0, dtype=jnp.float32)
    params = mpt_params(state_dict_numpy(tm), n_layers=2)
    f, b, dt = module.apply({"params": params}, jnp.asarray(x), jnp.asarray(pad), deterministic=True)
    # only valid (non-padded) positions are meaningful: torch's nested-tensor
    # fast path leaves padded positions undefined, and the MPT loss reads
    # valid tokens only.
    valid = ~pad
    np.testing.assert_allclose(np.asarray(f)[valid], f_ref.numpy()[..., 0][valid], atol=1e-4)
    np.testing.assert_allclose(np.asarray(b)[valid], b_ref.numpy()[valid], atol=1e-4)
    np.testing.assert_allclose(np.asarray(dt)[valid], dt_ref.numpy()[..., 0][valid], atol=1e-4)


def test_pretrain_step_and_weight_surgery(rng):
    cfg = load_defaults()
    for k, v in [("d_model", 32), ("n_heads", 4), ("n_layers", 1), ("dropout", 0.0)]:
        cfg.set(f"model.BaselineCLS.{k}", v)
    cfg.set("train.compute_dtype", "float32")

    task = MPTTask(cfg)
    x, pad, _, _ = _batch(rng, B=8, L=20)
    batch = (jnp.asarray(x), jnp.asarray(pad))
    key = jax.random.PRNGKey(0)
    variables = task.init(key, batch)
    params = variables["params"]

    import optax

    tx = task.make_optimizer()
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        (loss, aux), grads = jax.value_and_grad(task.loss_fn, has_aux=True)(params, batch, rng, True)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(10):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0]

    # weight surgery: trunk copied, head fresh
    cls_task = BaselineCLSTask(cfg)
    cls_vars = cls_task.init(jax.random.PRNGKey(1), (x, pad, np.zeros(8, np.int64)))
    warm = warmstart_classifier_params(cls_vars["params"], params)
    got = np.asarray(warm["trunk"]["in_proj"]["kernel"])
    np.testing.assert_allclose(got, np.asarray(params["trunk"]["in_proj"]["kernel"]))
    assert "fc" in warm and "norm" in warm
