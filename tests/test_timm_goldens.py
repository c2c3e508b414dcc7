"""Golden-file hook closing the timm link in the parity chain.

The AstroMiNN parity tests stub timm with the repo's TorchConvNeXt oracle
(timm is absent on this image), leaving the timm <-> oracle link untested.
``scripts/make_timm_goldens.py``, run on any machine WITH timm, writes
self-verified goldens (input, timm output, renamed state_dict) into
``tests/goldens/``; this module checks BOTH remaining links against them:

* timm <-> oracle: the golden state_dict loaded into TorchConvNeXt must
  reproduce the recorded timm output;
* timm <-> flax: the same state_dict converted through
  ``utils.torch_port.convnext_params`` into the flax ConvNeXt must too.

Skipped (not failed) when no goldens are present.
"""

from pathlib import Path

import numpy as np
import pytest

GOLDEN_DIR = Path(__file__).parent / "goldens"
GOLDENS = sorted(GOLDEN_DIR.glob("convnext_tiny_in*.npz"))
DEPTHS, DIMS = (3, 3, 9, 3), (96, 192, 384, 768)


@pytest.mark.skipif(
    not GOLDENS,
    reason="no timm goldens in tests/goldens/ — generate with "
    "scripts/make_timm_goldens.py on a machine that has timm",
)
@pytest.mark.parametrize("path", GOLDENS, ids=lambda p: p.stem)
def test_convnext_matches_timm_golden(path):
    import jax.numpy as jnp
    import torch

    from applecider_tpu.models.convnext import ConvNeXt
    from applecider_tpu.utils.torch_port import convnext_params
    from tests.torch_refs import TorchConvNeXt

    z = np.load(path)
    x, want = z["input"], z["output"]
    sd = {k[3:]: z[k] for k in z.files if k.startswith("sd:")}
    in_chans = x.shape[1]

    # link 1: timm <-> oracle
    oracle = TorchConvNeXt(depths=DEPTHS, dims=DIMS, in_chans=in_chans)
    oracle.load_state_dict({k: torch.tensor(v) for k, v in sd.items()}, strict=True)
    oracle.eval()
    with torch.no_grad():
        got = oracle(torch.tensor(x)).numpy()
    assert float(np.max(np.abs(got - want))) < 1e-4

    # link 2: timm <-> flax
    params = convnext_params(sd, DEPTHS)
    m = ConvNeXt(DEPTHS, DIMS, dtype=jnp.float32)
    out = m.apply({"params": params}, jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)))
    assert float(np.max(np.abs(np.asarray(out) - want))) < 1e-4
