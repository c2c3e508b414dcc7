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
