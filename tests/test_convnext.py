"""ConvNeXt backbone: torch parity and shape contract."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from applecider_tpu.models.convnext import ConvNeXt, convnext_tiny
from applecider_tpu.utils.torch_port import convnext_params
from tests.torch_refs import TorchConvNeXt, state_dict_numpy


def test_parity_vs_torch_small(rng):
    torch.manual_seed(11)
    depths, dims = (2, 2), (16, 32)
    tm = TorchConvNeXt(depths=depths, dims=dims, in_chans=3)
    tm.eval()
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    module = ConvNeXt(depths=depths, dims=dims, dtype=jnp.float32)
    params = convnext_params(state_dict_numpy(tm), depths)
    ours = module.apply({"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_parity_63px_input(rng):
    """The reference feeds 63x63 cutouts; stem stride 4 floors to 15x15."""
    torch.manual_seed(12)
    depths, dims = (1, 1), (8, 16)
    tm = TorchConvNeXt(depths=depths, dims=dims, in_chans=3)
    tm.eval()
    x = rng.normal(size=(2, 3, 63, 63)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    module = ConvNeXt(depths=depths, dims=dims, dtype=jnp.float32)
    params = convnext_params(state_dict_numpy(tm), depths)
    ours = module.apply({"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_tiny_output_dim():
    module = convnext_tiny(dtype=jnp.float32)
    x = jnp.zeros((1, 63, 63, 3))
    params = module.init(jax.random.PRNGKey(0), x)["params"]
    out = module.apply({"params": params}, x)
    assert out.shape == (1, 768)


def _dw_apply(h, c, impl, monkeypatch):
    """Run a depthwise Conv2dTorch under a forced ACDWCONV impl."""
    from applecider_tpu.models.convnext import Conv2dTorch

    monkeypatch.setenv("ACDWCONV", impl)
    module = Conv2dTorch(c, 7, padding=3, groups=c, dtype=jnp.float32)
    gen = np.random.default_rng(h * 100 + c)
    x = jnp.asarray(gen.normal(size=(2, h, h, c)).astype(np.float32))
    params = module.init(jax.random.PRNGKey(3), x)["params"]

    def loss(p, xx):
        return jnp.sum(jnp.square(module.apply({"params": p}, xx)))

    y = module.apply({"params": params}, x)
    g = jax.grad(loss)(params, x)
    return np.asarray(y), jax.tree_util.tree_map(np.asarray, g)


def test_depthwise_matmul_matches_conv(monkeypatch):
    """Banded-matmul depthwise == grouped conv (values AND grads, f32)."""
    for h, c in ((15, 8), (7, 12), (3, 16)):
        y0, g0 = _dw_apply(h, c, "conv", monkeypatch)
        y1, g1 = _dw_apply(h, c, "matmul", monkeypatch)
        np.testing.assert_allclose(y1, y0, atol=2e-5, rtol=2e-5)
        for k in g0:
            np.testing.assert_allclose(g1[k], g0[k], atol=2e-4, rtol=2e-4)


def test_depthwise_center_tap_exact(monkeypatch):
    """At 1x1 spatial the center-tap identity is exact (not approximate)."""
    y0, g0 = _dw_apply(1, 24, "conv", monkeypatch)
    y1, g1 = _dw_apply(1, 24, "center", monkeypatch)
    np.testing.assert_array_equal(y1, y0)
    # non-center kernel taps only ever multiply zero padding: grad == 0 there
    np.testing.assert_allclose(g1["kernel"], g0["kernel"], atol=1e-6)
    np.testing.assert_allclose(g1["bias"], g0["bias"], atol=0)
