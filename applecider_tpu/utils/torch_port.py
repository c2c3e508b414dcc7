"""Convert torch state_dicts of the reference architectures into flax params.

Enables (a) numeric parity tests against torch-built equivalents and
(b) migrating reference-trained checkpoints into this framework (the
BASELINE target: logits match the PyTorch reference to 1e-4).

All inputs are plain ``{name: np.ndarray}`` dicts (call ``.numpy()`` on
torch tensors first); no torch import happens here.
"""

from __future__ import annotations

import numpy as np


def _lin(sd: dict, prefix: str) -> dict:
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _ln(sd: dict, prefix: str) -> dict:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _encoder_layer(sd: dict, prefix: str) -> dict:
    """torch nn.TransformerEncoderLayer -> our TransformerEncoderLayer params."""
    return {
        "self_attn": {
            "in_proj": {
                "kernel": np.ascontiguousarray(sd[f"{prefix}.self_attn.in_proj_weight"].T),
                "bias": sd[f"{prefix}.self_attn.in_proj_bias"],
            },
            "out_proj": _lin(sd, f"{prefix}.self_attn.out_proj"),
        },
        "linear1": _lin(sd, f"{prefix}.linear1"),
        "linear2": _lin(sd, f"{prefix}.linear2"),
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "norm2": _ln(sd, f"{prefix}.norm2"),
    }


def transformer_encoder_params(sd: dict, prefix: str, n_layers: int) -> dict:
    return {f"layer_{i}": _encoder_layer(sd, f"{prefix}.layers.{i}") for i in range(n_layers)}


def time2vec_params(sd: dict, prefix: str) -> dict:
    return {k: sd[f"{prefix}.{k}"] for k in ("w0", "b0", "w", "b")}


def baseline_cls_trunk_params(sd: dict, n_layers: int, prefix: str = "") -> dict:
    """Trunk shared by BaselineCLS and MPT (in_proj/cls_tok/time2vec/encoder)."""
    p = prefix
    return {
        "in_proj": _lin(sd, f"{p}in_proj"),
        "cls_tok": sd[f"{p}cls_tok"],
        "time2vec": time2vec_params(sd, f"{p}time2vec"),
        "encoder": transformer_encoder_params(sd, f"{p}encoder", n_layers),
    }


def baseline_cls_params(sd: dict, n_layers: int, classification: bool = True) -> dict:
    """Full BaselineCLS torch state_dict -> flax params tree."""
    params = {
        "trunk": baseline_cls_trunk_params(sd, n_layers),
        "norm": _ln(sd, "norm"),
    }
    if classification and "fc.weight" in sd:
        params["fc"] = _lin(sd, "fc")
    return params


def mpt_params(sd: dict, n_layers: int) -> dict:
    """MPT pretrainer state_dict -> flax params tree."""
    return {
        "trunk": baseline_cls_trunk_params(sd, n_layers),
        "head_flux": _lin(sd, "head_flux"),
        "head_band": _lin(sd, "head_band"),
        "head_dt": _lin(sd, "head_dt"),
    }


def conv1d_params(sd: dict, prefix: str) -> dict:
    """torch Conv1d weight (O, I, K) -> lax conv kernel stored as (K, I, O)."""
    w = sd[f"{prefix}.weight"]
    out = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 1, 0)))}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def conv2d_params(sd: dict, prefix: str) -> dict:
    """torch Conv2d weight (O, I, kH, kW) -> flax kernel (kH, kW, I, O)."""
    w = sd[f"{prefix}.weight"]
    out = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def spectranet_params(sd: dict, depths, n_kernels_per_stage) -> dict:
    """SpectraNet torch state_dict -> flax params.

    Expects torch module names ``stages.{s}.{d}.convs.{i}`` /
    ``stages.{s}.{d}.norm`` / ``stages.{s}.{d}.downsample`` and head
    ``classifier.{0,1,4}`` (fc1, LN, fc2) — the layout of the torch oracle
    in tests/torch_refs.py, mirroring the reference architecture.
    """
    params: dict = {}
    n_stages = len(depths)
    for s in range(n_stages):
        for d in range(int(depths[s])):
            prefix = f"stages.{s}.{d}"
            block = {
                f"conv_{i}": conv1d_params(sd, f"{prefix}.convs.{i}")
                for i in range(n_kernels_per_stage[s])
            }
            block["norm"] = _ln(sd, f"{prefix}.norm")
            if f"{prefix}.downsample.weight" in sd:
                block["downsample"] = conv1d_params(sd, f"{prefix}.downsample")
            params[f"stage{s}_block{d}"] = block
    params["head_fc1"] = _lin(sd, "classifier.0")
    params["head_norm"] = _ln(sd, "classifier.1")
    params["head_fc2"] = _lin(sd, "classifier.4")
    return params


def convnext_params(sd: dict, depths, prefix: str = "") -> dict:
    """ConvNeXt torch state_dict (tests/torch_refs.py layout) -> flax params.

    Depthwise Conv2d weight (C, 1, k, k) maps to flax kernel (k, k, 1, C)
    like any conv — feature_group_count handles the grouping.
    """
    p = prefix
    params = {
        "stem_conv": conv2d_params(sd, f"{p}stem_conv"),
        "stem_norm": _ln(sd, f"{p}stem_norm"),
        "head_norm": _ln(sd, f"{p}head_norm"),
    }
    for s in range(len(depths)):
        if s > 0:
            params[f"downsample{s}_norm"] = _ln(sd, f"{p}downsamples.{s-1}.norm")
            params[f"downsample{s}_conv"] = conv2d_params(sd, f"{p}downsamples.{s-1}.conv")
        for b in range(int(depths[s])):
            bp = f"{p}stages.{s}.{b}"
            params[f"stage{s}_block{b}"] = {
                "dwconv": conv2d_params(sd, f"{bp}.dwconv"),
                "norm": _ln(sd, f"{bp}.norm"),
                "pwconv1": _lin(sd, f"{bp}.pwconv1"),
                "pwconv2": _lin(sd, f"{bp}.pwconv2"),
                "gamma": sd[f"{bp}.gamma"],
            }
    return params


def residual_tower_params(sd: dict, prefix: str, has_skip: bool) -> dict:
    out = {
        "start": _lin(sd, f"{prefix}.start"),
        "gate_norm": _ln(sd, f"{prefix}.gate_norm"),
        "gate_fc": _lin(sd, f"{prefix}.gate_fc"),
        "main_norm": _ln(sd, f"{prefix}.main_norm"),
        "main_fc": _lin(sd, f"{prefix}.main_fc"),
    }
    if has_skip:
        out["skip"] = _lin(sd, f"{prefix}.skip")
    return out


def astrominn_params(sd: dict, backbone_depths, num_experts: int = 4) -> dict:
    """AstroMiNN torch state_dict (tests/torch_refs.py layout) -> flax params."""
    params: dict = {}
    for tower in (
        "nst1_tower", "nst2_tower", "spatial_tower", "psf_tower",
        "mag_tower", "coord_tower", "mega_tower", "lc_tower",
    ):
        params[tower] = residual_tower_params(sd, tower, has_skip=f"{tower}.skip.weight" in sd)
    params["image_tower"] = {
        "backbone": convnext_params(sd, backbone_depths, prefix="image_tower.backbone."),
        "main_norm": _ln(sd, "image_tower.main_norm"),
        "main_fc1": _lin(sd, "image_tower.main_fc1"),
        "main_fc2": _lin(sd, "image_tower.main_fc2"),
        "main_fc3": _lin(sd, "image_tower.main_fc3"),
        "aux_norm": _ln(sd, "image_tower.aux_norm"),
        "aux_fc": _lin(sd, "image_tower.aux_fc"),
    }
    params["router_fc1"] = _lin(sd, "router_fc1")
    params["router_fc2"] = _lin(sd, "router_fc2")
    for i in range(num_experts):
        params[f"expert_{i}"] = residual_tower_params(
            sd, f"experts.{i}", has_skip=f"experts.{i}.skip.weight" in sd
        )
    return params


def _sub(sd: dict, prefix: str) -> dict:
    """Slice a state_dict to the keys under ``prefix.``, stripping it."""
    plen = len(prefix) + 1
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix + ".")}


def fusion_params(
    sd: dict,
    *,
    photometry_layers: int,
    spectranet_depths,
    spectranet_kernels_per_stage,
    astrominn_backbone_depths,
    num_experts: int = 4,
) -> dict:
    """Full AppleCider fusion torch state_dict -> flax params.

    Torch oracle layout (tests/torch_refs.py TorchAppleCider):
    photometry_encoder.* / spectra_encoder.* / img_meta_encoder.* +
    photometry_proj / spectra_proj / img_metadata_proj / fc.
    """
    return {
        "photometry_encoder": baseline_cls_params(
            _sub(sd, "photometry_encoder"), photometry_layers, classification=False
        ),
        "spectra_encoder": spectranet_params(
            _sub(sd, "spectra_encoder"), spectranet_depths, spectranet_kernels_per_stage
        ),
        "img_meta_encoder": astrominn_params(
            _sub(sd, "img_meta_encoder"), astrominn_backbone_depths, num_experts
        ),
        "photometry_proj": _lin(sd, "photometry_proj"),
        "spectra_proj": _lin(sd, "spectra_proj"),
        "img_metadata_proj": _lin(sd, "img_metadata_proj"),
        "fc": _lin(sd, "fc"),
    }


def spectranet_tripool_params(sd: dict, depths, use_ln_stages) -> tuple[dict, dict]:
    """brew_cider tri-pool SpectraNet state_dict -> (flax params, batch_stats).

    Torch layout (``_archive/notebooks/brew_cider.py:585-708``):
    ``stage{k}.{d}.{convs.{i},norm,proj}`` + head ``class_model.{0,1,4,5}``
    (+ optional ``fc``). BatchNorm stages contribute running_mean/var to the
    ``batch_stats`` collection (scale/bias to params).
    """
    params: dict = {}
    stats: dict = {}
    for s in range(len(depths)):
        for d in range(int(depths[s])):
            prefix = f"stage{s + 1}.{d}"
            block = {
                f"conv_{i}": conv1d_params(sd, f"{prefix}.convs.{i}")
                for i in range(3)
            }
            block["proj"] = conv1d_params(sd, f"{prefix}.proj")
            block["norm"] = _ln(sd, f"{prefix}.norm")
            params[f"stage{s}_block{d}"] = block
            if not use_ln_stages[s]:
                stats[f"stage{s}_block{d}"] = {"norm": {
                    "mean": sd[f"{prefix}.norm.running_mean"],
                    "var": sd[f"{prefix}.norm.running_var"],
                }}
    params["head_fc1"] = _lin(sd, "class_model.0")
    params["head_norm1"] = _ln(sd, "class_model.1")
    params["head_fc2"] = _lin(sd, "class_model.4")
    params["head_norm2"] = _ln(sd, "class_model.5")
    if "fc.weight" in sd:
        params["fc"] = _lin(sd, "fc")
    return params, stats


# --------------------------------------------------------------------------
# Real reference-module state_dict adapters.
#
# The converters above consume the canonical layout used by our torch
# oracles. The *actual* reference modules use nn.Sequential index names;
# these adapters rename a real reference state_dict into the canonical
# layout so reference-trained checkpoints can be migrated directly.


def rename_reference_spectranet_sd(sd: dict) -> dict:
    """``stage{k}.{d}.*`` (build_spec_model, SpectraNet.py:9-114) ->
    ``stages.{k-1}.{d}.*``; conv/norm/downsample/classifier names already
    align."""
    out = {}
    for k, v in sd.items():
        if k.startswith("stage") and k[5].isdigit():
            stage_no, rest = k[5:].split(".", 1)
            out[f"stages.{int(stage_no) - 1}.{rest}"] = v
        else:
            out[k] = v
    return out


def _rename_tower(key_rest: str) -> str:
    """ResidualTowerBlock Sequential names -> canonical tower names."""
    table = {
        "start_path.0": "start",
        "activation.0": "gate_norm",
        "activation.2": "gate_fc",
        "main_path.0": "main_norm",
        "main_path.2": "main_fc",
        "skip_path": "skip",
    }
    for src, dst in table.items():
        if key_rest.startswith(src + "."):
            return dst + key_rest[len(src):]
    return key_rest


def rename_reference_astrominn_sd(sd: dict) -> dict:
    """Real AstroMiNN/XastroMiNN state_dict (src astrominn.py:67-218 /
    _archive AstroMiNN.py:1575-1728) -> canonical layout for
    ``astrominn_params``. The image backbone is passed through under
    ``image_tower.backbone.*`` (caller supplies a matching backbone
    layout)."""
    head_main = {"1": "main_norm", "2": "main_fc1", "5": "main_fc2", "6": "main_fc3"}
    head_aux = {"0": "aux_norm", "1": "aux_fc"}
    towers = (
        "nst1_tower", "nst2_tower", "spatial_tower", "psf_tower",
        "mag_tower", "coord_tower", "mega_tower", "lc_tower",
    )
    out = {}
    for k, v in sd.items():
        if k.startswith("fusion_router.0."):
            out["router_fc1." + k[len("fusion_router.0."):]] = v
        elif k.startswith("fusion_router.3."):
            out["router_fc2." + k[len("fusion_router.3."):]] = v
        elif k.startswith("fusion_experts."):
            idx, rest = k[len("fusion_experts."):].split(".", 1)
            out[f"experts.{idx}." + _rename_tower(rest)] = v
        elif k.startswith("image_tower.head_main."):
            idx, rest = k[len("image_tower.head_main."):].split(".", 1)
            out[f"image_tower.{head_main[idx]}.{rest}"] = v
        elif k.startswith("image_tower.head_aux."):
            idx, rest = k[len("image_tower.head_aux."):].split(".", 1)
            out[f"image_tower.{head_aux[idx]}.{rest}"] = v
        elif k.startswith("image_tower.backbone."):
            out[k] = v
        elif any(k.startswith(t + ".") for t in towers):
            tower, rest = k.split(".", 1)
            out[f"{tower}." + _rename_tower(rest)] = v
        else:
            out[k] = v
    return out


def fusion_reference_params(
    sd: dict,
    *,
    photometry_layers: int,
    spectra_depths=(1, 1, 1, 1, 1),
    astrominn_backbone_depths=(3, 3, 9, 3),
    num_experts: int = 4,
) -> tuple[dict, dict]:
    """REAL brew_cider AppleCider state_dict -> (flax params, batch_stats).

    Layout per ``_archive/notebooks/brew_cider.py:807-862``:
    ``photometry_encoder.*`` (archive BaselineCLS, embedding mode),
    ``spectra_encoder.*`` (tri-pool build_spec_model, BN layout derived from
    running_mean keys), ``img_metadata_encoder.*`` (XastroMiNN Sequential
    names), projections + ``fc``. Returns batch_stats nested under
    ``spectra_encoder`` for the BN stages.
    """
    spectra_sd = _sub(sd, "spectra_encoder")
    use_ln = [
        f"stage{s + 1}.0.norm.running_mean" not in spectra_sd
        for s in range(len(spectra_depths))
    ]
    spectra_params, spectra_stats = spectranet_tripool_params(
        spectra_sd, spectra_depths, use_ln
    )
    img_sd = rename_reference_astrominn_sd(_sub(sd, "img_metadata_encoder"))
    params = {
        "photometry_encoder": baseline_cls_params(
            _sub(sd, "photometry_encoder"), photometry_layers, classification=False
        ),
        "spectra_encoder": spectra_params,
        "img_meta_encoder": astrominn_params(
            img_sd, astrominn_backbone_depths, num_experts
        ),
        "photometry_proj": _lin(sd, "photometry_proj"),
        "spectra_proj": _lin(sd, "spectra_proj"),
        "img_metadata_proj": _lin(sd, "img_metadata_proj"),
        "fc": _lin(sd, "fc"),
    }
    stats = {"spectra_encoder": spectra_stats} if spectra_stats else {}
    return params, stats


def mpt_to_classifier_warmstart(mpt_flax_params: dict) -> dict:
    """Weight surgery: MPT trunk -> fresh classifier warm start.

    Mirrors the reference recipe (baselineCLS_example.py:31-39): copy every
    non-head parameter; the classifier's ``norm`` and ``fc`` start fresh.
    """
    return {"trunk": mpt_flax_params["trunk"]}
