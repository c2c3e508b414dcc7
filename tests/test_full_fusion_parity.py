"""END-TO-END parity: full 4-modality fusion logits vs the torch oracle.

This is the BASELINE.json contract in miniature: identical weights ->
identical class logits (1e-4) across all four modality encoders, the
projections, L2 normalization, fusion, and the classifier head.
"""

import jax.numpy as jnp
import numpy as np
import torch

from applecider_tpu.models.astrominn import AstroMiNNModule
from applecider_tpu.models.baseline_cls import BaselineCLSModule
from applecider_tpu.models.fusion import AppleCiderModule
from applecider_tpu.models.spectranet import SpectraNetModule
from applecider_tpu.utils.torch_port import fusion_params
from tests.torch_refs import (
    TorchAppleCider,
    TorchAstroMiNN,
    TorchBaselineCLS,
    TorchSpectraNet,
    state_dict_numpy,
)

SPEC_CHANNELS = [8, 16]
SPEC_DEPTHS = [1, 1]
SPEC_KERNELS = [[3, 31], [3, 15]]
SPEC_HIDDEN = 24
BACKBONE = dict(depths=(1, 1), dims=(8, 16))


def _torch_fusion(fusion_mode):
    torch.manual_seed(33)
    photometry = TorchBaselineCLS(d_model=32, n_heads=4, n_layers=2, dropout=0.0,
                                  classification=False)
    spectra = TorchSpectraNet(SPEC_CHANNELS, SPEC_DEPTHS, SPEC_KERNELS, num_classes=9,
                              head_hidden=SPEC_HIDDEN, embedding=True)
    img_meta = TorchAstroMiNN(backbone_dims=BACKBONE["dims"],
                              backbone_depths=BACKBONE["depths"])
    model = TorchAppleCider(photometry, spectra, img_meta, spectra_hidden=SPEC_HIDDEN,
                            hidden_dim=5, fusion=fusion_mode)
    model.eval()
    return model


def _flax_fusion(fusion_mode):
    photometry = BaselineCLSModule(d_model=32, n_heads=4, n_layers=2, dropout=0.0,
                                   classification=False, dtype=jnp.float32,
                                   name="photometry_encoder")
    spectra = SpectraNetModule(channels=SPEC_CHANNELS, depths=SPEC_DEPTHS,
                               kernel_sizes_per_stage=SPEC_KERNELS,
                               head_hidden=SPEC_HIDDEN, embedding=True,
                               conv_mode="direct", dtype=jnp.float32,
                               name="spectra_encoder")
    img_meta = AstroMiNNModule(backbone_depths=BACKBONE["depths"],
                               backbone_dims=BACKBONE["dims"], dtype=jnp.float32,
                               name="img_meta_encoder")
    return AppleCiderModule(photometry_encoder=photometry, spectra_encoder=spectra,
                            img_meta_encoder=img_meta, hidden_dim=5,
                            fusion=fusion_mode, num_classes=5)


def _batch(rng, B=3):
    photometry = rng.normal(size=(B, 20, 7)).astype(np.float32)
    lengths = rng.integers(8, 21, size=B)
    pad = np.arange(20)[None, :] >= lengths[:, None]
    metadata = rng.normal(size=(B, 24)).astype(np.float32)
    images = rng.normal(size=(B, 3, 63, 63)).astype(np.float32)
    spectra = rng.normal(size=(B, 128)).astype(np.float32)
    return photometry, pad, metadata, images, spectra


def test_full_fusion_logits_parity_avg(rng):
    tm = _torch_fusion("avg")
    photometry, pad, metadata, images, spectra = _batch(rng)
    with torch.no_grad():
        ref = tm(torch.tensor(photometry), torch.tensor(pad), torch.tensor(metadata),
                 torch.tensor(images), torch.tensor(spectra)).numpy()

    module = _flax_fusion("avg")
    params = fusion_params(
        state_dict_numpy(tm),
        photometry_layers=2,
        spectranet_depths=SPEC_DEPTHS,
        spectranet_kernels_per_stage=[len(k) for k in SPEC_KERNELS],
        astrominn_backbone_depths=BACKBONE["depths"],
    )
    ours = module.apply(
        {"params": params},
        jnp.asarray(photometry), jnp.asarray(pad), jnp.asarray(metadata),
        jnp.asarray(np.transpose(images, (0, 2, 3, 1))), jnp.asarray(spectra),
        deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_full_fusion_logits_parity_concat(rng):
    tm = _torch_fusion("concat")
    photometry, pad, metadata, images, spectra = _batch(rng)
    with torch.no_grad():
        ref = tm(torch.tensor(photometry), torch.tensor(pad), torch.tensor(metadata),
                 torch.tensor(images), torch.tensor(spectra)).numpy()
    module = _flax_fusion("concat")
    params = fusion_params(
        state_dict_numpy(tm),
        photometry_layers=2,
        spectranet_depths=SPEC_DEPTHS,
        spectranet_kernels_per_stage=[len(k) for k in SPEC_KERNELS],
        astrominn_backbone_depths=BACKBONE["depths"],
    )
    ours = module.apply(
        {"params": params},
        jnp.asarray(photometry), jnp.asarray(pad), jnp.asarray(metadata),
        jnp.asarray(np.transpose(images, (0, 2, 3, 1))), jnp.asarray(spectra),
        deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)
