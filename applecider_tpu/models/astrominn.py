"""AstroMiNN: image + metadata mixture-of-experts classifier.

Behavioral contract from the reference
(``src/applecider/models/astrominn.py:8-348``):

* 8 metadata towers (gated-residual MLPs) over fixed column slices of the
  24-feature metadata vector: nst1 [0,2], nst2 [1,3], spatial [2,3,4],
  psf [5,14], mag [6,9,10,13,15,17,18], coord [7,8], mega [0..18],
  lc [6,9,10,13,15,17,18,19,20,21,22,23];
* image tower: ConvNeXt-tiny backbone with a main head gated by a tanh aux
  head (``SplitHeadConvNeXt``);
* concat (6 towers_outdims + 3 fusion_outdims wide) -> sigmoid router ->
  top-2 mixture over 4 gated-residual experts;
* CE loss on one-hot 5-class targets; AdamW with 11 per-tower param groups
  (distinct lr multipliers / weight decays / betas, base lr 1.6e-4).

TPU re-design: the reference's boolean-mask expert loop
(``astrominn.py:282-295``) — dynamic shapes that break tracing/ONNX — is
replaced by dense top-2 dispatch (all 4 tiny experts batched on the MXU,
combined with a masked gate matrix; see ``applecider_tpu.ops.moe``).
The 11 torch param groups map to ``optax.multi_transform`` over top-level
param labels.

Note: the reference hardcodes the expert/MoE output width to 5 even though
``num_classes=9`` sits in its config; we expose it as ``moe_output_dims``
(default 5) instead of silently hardcoding.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from applecider_tpu.ops.dropout import FastDropout

from applecider_tpu.models.base import Task, maybe_softmax
from applecider_tpu.models.convnext import ConvNeXt
from applecider_tpu.models.layers import Linear, LayerNorm, gelu_exact
from applecider_tpu.ops.losses import cross_entropy
from applecider_tpu.ops.moe import topk_dense_dispatch
from applecider_tpu.registry import register_model

# metadata column slices (reference astrominn.py:249-261)
TOWER_SLICES = {
    "nst1_tower": [0, 2],
    "nst2_tower": [1, 3],
    "spatial_tower": [2, 3, 4],
    "psf_tower": [5, 14],
    "mag_tower": [6, 9, 10, 13, 15, 17, 18],
    "coord_tower": [7, 8],
    "mega_tower": list(range(19)),
    "lc_tower": [6, 9, 10, 13, 15, 17, 18, 19, 20, 21, 22, 23],
}


class ResidualTowerBlock(nn.Module):
    """Gated-residual MLP: out = main(h) * sigmoid_gate(h) + skip(x), h = GELU(W x)."""

    hidden_dim: int
    output_dim: int
    dropout: float = 0.25
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = Linear(self.hidden_dim, dtype=self.dtype, name="start")(x)
        h = gelu_exact(h)

        g = LayerNorm(dtype=self.dtype, name="gate_norm")(h)
        g = FastDropout(self.dropout)(g, deterministic=deterministic)
        g = nn.sigmoid(Linear(self.output_dim, dtype=self.dtype, name="gate_fc")(g))

        m = LayerNorm(dtype=self.dtype, name="main_norm")(h)
        m = FastDropout(self.dropout)(m, deterministic=deterministic)
        m = Linear(self.output_dim, dtype=self.dtype, name="main_fc")(m)

        if x.shape[-1] != self.output_dim:
            skip = Linear(self.output_dim, dtype=self.dtype, name="skip")(x)
        else:
            skip = x
        return m * g + skip


class SplitHeadImageTower(nn.Module):
    """ConvNeXt backbone with a main head modulated by a tanh aux head."""

    outdims: int
    depths: tuple = (3, 3, 9, 3)
    dims: tuple = (96, 192, 384, 768)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        feats = ConvNeXt(self.depths, self.dims, dtype=self.dtype, name="backbone")(x)
        f = int(self.dims[-1])
        m = gelu_exact(feats)
        m = LayerNorm(dtype=self.dtype, name="main_norm")(m)
        m = nn.relu(Linear(f // 2, dtype=self.dtype, name="main_fc1")(m))
        m = FastDropout(0.4)(m, deterministic=deterministic)
        m = Linear(f, dtype=self.dtype, name="main_fc2")(m)
        m = Linear(self.outdims, dtype=self.dtype, name="main_fc3")(m)
        a = LayerNorm(dtype=self.dtype, name="aux_norm")(feats)
        a = jnp.tanh(Linear(self.outdims, dtype=self.dtype, name="aux_fc")(a))
        return m * a


class AstroMiNNModule(nn.Module):
    num_experts: int = 4
    towers_hidden_dims: int = 16
    towers_outdims: int = 32
    fusion_hidden_dims: int = 128
    fusion_outdims: int = 32
    moe_output_dims: int = 5
    backbone_depths: tuple = (3, 3, 9, 3)
    backbone_dims: tuple = (96, 192, 384, 768)
    router_dropout: float = 0.3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, metadata, image, *, deterministic: bool = True, return_router: bool = False):
        """metadata: (B, 24); image: (B, H, W, 3) NHWC or None."""
        th, to, fo = self.towers_hidden_dims, self.towers_outdims, self.fusion_outdims
        m = metadata.astype(self.dtype or jnp.float32)
        kw = dict(deterministic=deterministic)

        nsta = ResidualTowerBlock(th, fo, dtype=self.dtype, name="nst1_tower")(m[:, TOWER_SLICES["nst1_tower"]], **kw)
        nstb = ResidualTowerBlock(th, fo, dtype=self.dtype, name="nst2_tower")(m[:, TOWER_SLICES["nst2_tower"]], **kw)
        spatial = ResidualTowerBlock(th, to, dtype=self.dtype, name="spatial_tower")(m[:, TOWER_SLICES["spatial_tower"]], **kw)
        psf = ResidualTowerBlock(th, to, dtype=self.dtype, name="psf_tower")(m[:, TOWER_SLICES["psf_tower"]], **kw)
        mag = ResidualTowerBlock(th * 2, to, dtype=self.dtype, name="mag_tower")(m[:, TOWER_SLICES["mag_tower"]], **kw)
        coord = ResidualTowerBlock(th, fo, dtype=self.dtype, name="coord_tower")(m[:, TOWER_SLICES["coord_tower"]], **kw)
        mega = ResidualTowerBlock(128, to, dtype=self.dtype, name="mega_tower")(m[:, TOWER_SLICES["mega_tower"]], **kw)
        lc = ResidualTowerBlock(th * 3, to, dtype=self.dtype, name="lc_tower")(m[:, TOWER_SLICES["lc_tower"]], **kw)

        if image is not None:
            img_feats = SplitHeadImageTower(
                to, self.backbone_depths, self.backbone_dims, dtype=self.dtype, name="image_tower"
            )(image.astype(self.dtype or jnp.float32), **kw)
        else:
            # width must match the image tower's slot (towers_outdims);
            # zeros_like(nsta) was fusion_outdims wide and broke the concat
            # whenever to != fo
            img_feats = jnp.zeros_like(spatial)

        all_feats = jnp.concatenate(
            [nsta, nstb, spatial, psf, mag, coord, mega, img_feats, lc], axis=-1
        )
        fusion_dims = 6 * to + 3 * fo

        # router: Linear -> tanh -> dropout -> Linear -> sigmoid
        r = jnp.tanh(Linear(fusion_dims // 2, dtype=self.dtype, name="router_fc1")(all_feats))
        r = FastDropout(self.router_dropout)(r, deterministic=deterministic)
        router_weights = nn.sigmoid(
            Linear(self.num_experts, dtype=self.dtype, name="router_fc2")(r)
        ).astype(jnp.float32)

        expert_outs = jnp.stack(
            [
                ResidualTowerBlock(
                    self.fusion_hidden_dims, self.moe_output_dims, dtype=self.dtype, name=f"expert_{i}"
                )(all_feats, **kw)
                for i in range(self.num_experts)
            ],
            axis=1,
        ).astype(jnp.float32)  # (B, E, C)

        logits = topk_dense_dispatch(expert_outs, router_weights, k=2)
        if return_router:
            return logits, router_weights
        return logits


# the 11 torch param groups -> (lr multiplier key, decay key, betas key) labels
GROUP_SETTINGS = {
    "image_tower": ("cnn_lr", "cnn_decay", None),
    "psf_tower": ("psf_lr", "psf_decay", None),
    "lc_tower": ("lc_lr", "lc_decay", None),
    "mag_tower": ("mag_lr", "mag_decay", None),
    "spatial_tower": ("spatial_lr", "spatial_decay", None),
    # NB: the reference assigns the *nst1* settings to the coord tower
    # (astrominn.py:181-184), not the coord_* keys it also defines.
    "coord_tower": ("nst1_lr", "nst1_decay", None),
    "nst1_tower": ("nst1_lr", "nst1_decay", None),
    "nst2_tower": ("nst2_lr", "nst2_decay", None),
    "mega_tower": ("lc_lr", "lc_decay", None),
    "expert": ("fusion_lr", "fusion_decay", ("fusion_beta1", "fusion_beta2")),
    "router": ("router_lr", "router_decay", ("router_beta1", "router_beta2")),
}


def param_group_label(top_level_name: str) -> str:
    if top_level_name.startswith("expert_"):
        return "expert"
    if top_level_name.startswith("router_"):
        return "router"
    return top_level_name


@register_model(name="AstroMiNN")
class AstroMiNNTask(Task):
    name = "AstroMiNN"

    def __init__(self, config):
        super().__init__(config)
        mc = config["model"]["AstroMiNN"]
        self.mc = mc
        backbone_depths = tuple(mc.get("backbone_depths", (3, 3, 9, 3)))
        backbone_dims = tuple(mc.get("backbone_dims", (96, 192, 384, 768)))
        self.module = AstroMiNNModule(
            num_experts=int(mc["num_mlp_experts"]),
            towers_hidden_dims=int(mc["towers_hidden_dims"]),
            towers_outdims=int(mc["towers_outdims"]),
            fusion_hidden_dims=int(mc["fusion_hidden_dims"]),
            fusion_outdims=int(mc["fusion_outdims"]),
            moe_output_dims=int(mc.get("moe_output_dims", 5)),
            backbone_depths=backbone_depths,
            backbone_dims=backbone_dims,
            dtype=self.compute_dtype(),
        )

    def init(self, rng, batch):
        metadata, image = batch[0], batch[1]
        return self.module.init(
            {"params": rng}, jnp.asarray(metadata), jnp.asarray(image), deterministic=True
        )

    def loss_fn(self, params, batch, rng, train: bool):
        metadata, image, targets = batch
        logits = self.module.apply(
            {"params": params}, metadata, image,
            deterministic=not train, rngs={"dropout": rng} if train else {},
        )
        loss = cross_entropy(logits, targets)
        acc = jnp.mean(
            (jnp.argmax(logits, -1) == (jnp.argmax(targets, -1) if targets.ndim > 1 else targets)).astype(jnp.float32)
        )
        return loss, {"metrics": {"loss": loss, "accuracy": acc}, "logits": logits}

    def predict(self, params, batch):
        metadata, image = batch[0], batch[1]
        logits = self.module.apply({"params": params}, metadata, image, deterministic=True)
        return maybe_softmax(logits, bool(self.mc.get("use_probabilities", False)))

    def make_optimizer(self):
        """11-group AdamW mirroring the reference's per-tower hyperparameters."""
        mc = self.mc
        base_lr = float(mc.get("base_lr", 1.6e-4))
        eps = float(mc.get("eps", 5e-10))
        default_betas = (float(mc.get("beta1", 0.9)), float(mc.get("beta2", 0.999)))

        transforms = {}
        for label, (lr_key, decay_key, betas_keys) in GROUP_SETTINGS.items():
            betas = default_betas
            if betas_keys is not None:
                betas = (float(mc[betas_keys[0]]), float(mc[betas_keys[1]]))
            transforms[label] = optax.adamw(
                learning_rate=base_lr * float(mc[lr_key]),
                b1=betas[0],
                b2=betas[1],
                eps=eps,
                weight_decay=float(mc[decay_key]),
            )

        def labeler(params):
            return {k: jax.tree.map(lambda _: param_group_label(k), v) for k, v in params.items()}

        return optax.multi_transform(transforms, labeler)

    @staticmethod
    def to_tensor(data_dict: dict):
        """(metadata, NHWC image, one-hot target) from the host batch dict."""
        data = data_dict["data"]
        metadata = np.asarray(data["metadata"], dtype=np.float32)
        images = np.asarray(data["image"], dtype=np.float32)
        if images.ndim == 4 and images.shape[1] in (1, 3, 4) and images.shape[-1] not in (1, 3, 4):
            images = np.transpose(images, (0, 2, 3, 1))  # NCHW -> NHWC
        targets = np.asarray(data.get("target", []), dtype=np.float32)
        return (metadata, images, targets)
