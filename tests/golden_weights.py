"""Deterministic ConvNeXt state-dict builder for the HF golden files.

The timm<->oracle link in the parity chain (the reference's image tower is
``timm.create_model("convnext_tiny")``,
/root/reference/src/applecider/models/astrominn.py:25-33) is validated
against **HuggingFace transformers' independent ConvNeXt implementation**
(this image has no timm/torchvision; transformers ships its own from-paper
ConvNeXt). Committing a full convnext_tiny state dict would cost ~110 MB
per golden, so the goldens instead record only (input, HF output) and the
weights are REGENERATED here from a seeded ``np.random.default_rng`` stream
— NumPy guarantees bit-stable streams for a given BitGenerator, so
generator (scripts/make_hf_goldens.py) and test (tests/test_timm_goldens.py)
reconstruct byte-identical weights.

Keys follow the tests/torch_refs.TorchConvNeXt oracle layout.
"""

from __future__ import annotations

import numpy as np


def convnext_random_sd(depths, dims, in_chans: int, seed: int) -> dict:
    """Oracle-layout state dict with stable pseudo-random weights.

    Scales keep activations bounded through the 18-block residual chain:
    conv/linear N(0, .02), biases N(0, .01), LN weight U(.9, 1.1),
    LN bias N(0, .02), layer-scale gamma N(0, .2).
    """
    rng = np.random.default_rng(seed)
    sd: dict[str, np.ndarray] = {}

    def w(shape, scale=0.02):
        return rng.normal(0.0, scale, size=shape).astype(np.float32)

    def ln(prefix, dim):
        sd[f"{prefix}.weight"] = rng.uniform(0.9, 1.1, size=dim).astype(np.float32)
        sd[f"{prefix}.bias"] = w((dim,), 0.02)

    sd["stem_conv.weight"] = w((dims[0], in_chans, 4, 4))
    sd["stem_conv.bias"] = w((dims[0],), 0.01)
    ln("stem_norm", dims[0])
    for s, (depth, dim) in enumerate(zip(depths, dims)):
        if s > 0:
            ln(f"downsamples.{s - 1}.norm", dims[s - 1])
            sd[f"downsamples.{s - 1}.conv.weight"] = w((dim, dims[s - 1], 2, 2))
            sd[f"downsamples.{s - 1}.conv.bias"] = w((dim,), 0.01)
        for b in range(depth):
            p = f"stages.{s}.{b}"
            sd[f"{p}.dwconv.weight"] = w((dim, 1, 7, 7))
            sd[f"{p}.dwconv.bias"] = w((dim,), 0.01)
            ln(f"{p}.norm", dim)
            sd[f"{p}.pwconv1.weight"] = w((4 * dim, dim))
            sd[f"{p}.pwconv1.bias"] = w((4 * dim,), 0.01)
            sd[f"{p}.pwconv2.weight"] = w((dim, 4 * dim))
            sd[f"{p}.pwconv2.bias"] = w((dim,), 0.01)
            sd[f"{p}.gamma"] = w((dim,), 0.2)
    ln("head_norm", dims[-1])
    return sd


def oracle_sd_to_hf(sd: dict) -> dict:
    """Oracle-layout keys -> transformers ConvNextModel keys."""
    import re

    out = {}
    for k, v in sd.items():
        nk = k
        nk = nk.replace("stem_conv.", "embeddings.patch_embeddings.")
        nk = nk.replace("stem_norm.", "embeddings.layernorm.")
        m = re.match(r"downsamples\.(\d+)\.(norm|conv)\.(.*)", nk)
        if m:
            s, kind, rest = int(m.group(1)), m.group(2), m.group(3)
            idx = 0 if kind == "norm" else 1
            nk = f"encoder.stages.{s + 1}.downsampling_layer.{idx}.{rest}"
        m = re.match(r"stages\.(\d+)\.(\d+)\.(.*)", nk)
        if m:
            s, b, rest = m.group(1), m.group(2), m.group(3)
            rest = rest.replace("norm.", "layernorm.") if rest.startswith("norm.") else rest
            rest = rest.replace("gamma", "layer_scale_parameter")
            nk = f"encoder.stages.{s}.layers.{b}.{rest}"
        nk = nk.replace("head_norm.", "layernorm.") if nk.startswith("head_norm.") else nk
        out[nk] = v
    return out
