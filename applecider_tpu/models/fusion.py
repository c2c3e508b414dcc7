"""AppleCider: 4-modality late-fusion transient classifier.

Behavioral contract from the reference
(``_archive/AppleCider/core/model.py:8-67`` and the fuller variant
``_archive/notebooks/brew_cider.py:807-862``):

* per-modality encoders — BaselineCLS photometry transformer in embedding
  mode, SpectraNet spectra encoder, AstroMiNN image+metadata MoE;
* a Linear projection per modality into a shared ``hidden_dim``;
* L2 normalization of each projected embedding;
* fusion by ``avg`` or ``concat`` -> final Linear classifier.

Concat order: the two archive variants disagree — ``core/model.py:57``
concatenates (p, s, im) while ``brew_cider.py:852`` (the paper's training
script) uses (p, im, s). This build follows **brew_cider**: (p, im, s);
reference checkpoints imported via ``torch_port.fusion_reference_params``
therefore reproduce exactly.

The spectra branch uses SpectraNet's pre-classifier hidden representation
(the archive variants disagree between "logits" and a 256-d embedding; the
projection layer makes either work — flax infers the input width).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from applecider_tpu.models.astrominn import AstroMiNNModule
from applecider_tpu.models.base import Task, maybe_softmax
from applecider_tpu.models.baseline_cls import BaselineCLSModule
from applecider_tpu.models.layers import Linear, resolve_remat
from applecider_tpu.models.spectranet import SpectraNetModule
from applecider_tpu.ops.losses import cross_entropy, focal_loss
from applecider_tpu.registry import register_model


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """torch ``x / x.norm(dim=-1, keepdim=True)`` semantics."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True))
    return (x / jnp.maximum(norm, eps)).astype(x.dtype)


class AppleCiderModule(nn.Module):
    photometry_encoder: BaselineCLSModule
    spectra_encoder: SpectraNetModule
    img_meta_encoder: AstroMiNNModule
    hidden_dim: int = 5
    fusion: str = "avg"  # "avg" | "concat"
    num_classes: int = 5

    @nn.compact
    def __call__(
        self, photometry, photo_mask, metadata, images, spectra,
        *, deterministic: bool = True, return_embeddings: bool = False,
        spec_gather=None,
    ):
        p = self.photometry_encoder(photometry, photo_mask, deterministic=deterministic)
        s = self.spectra_encoder(spectra, deterministic=deterministic)
        im = self.img_meta_encoder(metadata, images, deterministic=deterministic)

        p_emb = l2_normalize(Linear(self.hidden_dim, name="photometry_proj")(p))
        s_emb = l2_normalize(Linear(self.hidden_dim, name="spectra_proj")(s))
        im_emb = l2_normalize(Linear(self.hidden_dim, name="img_metadata_proj")(im))

        # spectrum-presence routing support (infer/stream):
        # * spec_gather (FusedSpectraStream): ``spectra`` is a compact
        #   (S+1, G) block — row 0 the zero spectrum, rows 1..S the real
        #   spectra — and spec_gather maps each batch row to its block row
        #   (0 for spectrum-less samples). Every SpectraNet op is
        #   per-sample, so gathering the (S+1, h) embeddings back to
        #   (B, h) is exactly the full-batch computation.
        # * 1-row broadcast (RoutedAlertStream skip_spectra): a batch whose
        #   samples ALL lack spectra passes ONE zero spectrum and the
        #   (1, h) embedding broadcasts row-wise.
        if spec_gather is not None:
            s_emb = s_emb[spec_gather]
        elif s_emb.shape[0] == 1 and p_emb.shape[0] != 1:
            s_emb = jnp.broadcast_to(s_emb, (p_emb.shape[0], s_emb.shape[-1]))

        if return_embeddings:
            return p_emb, im_emb, s_emb

        if self.fusion == "concat":
            emb = jnp.concatenate([p_emb, im_emb, s_emb], axis=-1)
        elif self.fusion == "avg":
            emb = (p_emb + im_emb + s_emb) / 3.0
        else:
            raise NotImplementedError(f"fusion={self.fusion!r}")
        return Linear(self.num_classes, name="fc")(emb).astype(jnp.float32)


@register_model(name="AppleCider")
@register_model(name="Fusion")
class AppleCiderTask(Task):
    name = "AppleCider"

    def __init__(self, config):
        super().__init__(config)
        fc = config["model"]["AppleCider"]
        self.fc_cfg = fc
        self.grad_clip = float(fc.get("grad_clip", 1.0))
        dtype = self.compute_dtype()

        pc = config["model"]["BaselineCLS"]
        photometry = BaselineCLSModule(
            d_model=int(pc["d_model"]), n_heads=int(pc["n_heads"]),
            n_layers=int(pc["n_layers"]), dropout=float(pc["dropout"]),
            classification=False, dtype=dtype,
            attn_impl=str(pc.get("attention_impl", "auto")),
            remat=resolve_remat(pc.get("remat", "auto")),
            name="photometry_encoder",
        )
        # spectra encoder: the active-code SpectraNet embedding (default) or
        # the brew_cider tri-pool variant the paper's fusion model used
        # (model.AppleCider.spectra_encoder = "tripool")
        if str(fc.get("spectra_encoder", "standard")) == "tripool":
            from applecider_tpu.models.spectranet import SpectraNetTriPoolModule

            tc = dict(config["model"].get("SpectraNetTriPool", {}))
            n_stages = len(tc.get("channels", (16, 32, 64, 128, 256)))
            spectra = SpectraNetTriPoolModule(
                channels=tuple(tc.get("channels", (16, 32, 64, 128, 256))),
                depths=tuple(tc.get("depths", (1,) * n_stages)),
                kernel_sizes_per_stage=tuple(
                    tuple(k) for k in tc.get(
                        "kernel_sizes_per_stage",
                        SpectraNetTriPoolModule.kernel_sizes_per_stage)
                ),
                use_ln_stages=tuple(tc.get("use_ln_stages", (True,) * n_stages)),
                classification=False,
                conv_mode=str(tc.get("conv_mode", "auto")),
                dtype=dtype, name="spectra_encoder",
            )
        else:
            sc = config["model"]["SpectraNet"]
            spectra = SpectraNetModule(
                channels=tuple(sc["channels"]), depths=tuple(sc["depths"]),
                kernel_sizes_per_stage=tuple(tuple(k) for k in sc["kernel_sizes_per_stage"]),
                embedding=True, conv_mode=str(sc.get("conv_mode", "auto")),
                dtype=dtype, name="spectra_encoder",
            )
        ac = config["model"]["AstroMiNN"]
        img_meta = AstroMiNNModule(
            num_experts=int(ac["num_mlp_experts"]),
            towers_hidden_dims=int(ac["towers_hidden_dims"]),
            towers_outdims=int(ac["towers_outdims"]),
            fusion_hidden_dims=int(ac["fusion_hidden_dims"]),
            fusion_outdims=int(ac["fusion_outdims"]),
            moe_output_dims=int(ac.get("moe_output_dims", 5)),
            backbone_depths=tuple(ac.get("backbone_depths", (3, 3, 9, 3))),
            backbone_dims=tuple(ac.get("backbone_dims", (96, 192, 384, 768))),
            dtype=dtype, name="img_meta_encoder",
        )
        self.module = AppleCiderModule(
            photometry_encoder=photometry,
            spectra_encoder=spectra,
            img_meta_encoder=img_meta,
            hidden_dim=int(fc.get("hidden_dim", 5)),
            fusion=str(fc.get("fusion", "avg")),
            num_classes=int(fc.get("num_classes", 5)),
        )
        # frozen BatchNorm running stats when the tri-pool spectra encoder
        # uses reference BN stages (constants; refreshed by init() or set
        # from an imported checkpoint)
        self.batch_stats = None

    def _variables(self, params):
        if self.batch_stats:
            return {"params": params, "batch_stats": self.batch_stats}
        return {"params": params}

    def init(self, rng, batch):
        photometry, photo_mask, metadata, images, spectra = batch[:5]
        variables = self.module.init(
            {"params": rng},
            jnp.asarray(photometry), jnp.asarray(photo_mask), jnp.asarray(metadata),
            jnp.asarray(images), jnp.asarray(spectra), deterministic=True,
        )
        if self.batch_stats is None:  # keep stats assigned from a checkpoint
            self.batch_stats = variables.get("batch_stats")
        return variables

    def loss_fn(self, params, batch, rng, train: bool):
        photometry, photo_mask, metadata, images, spectra, labels = batch
        logits = self.module.apply(
            self._variables(params), photometry, photo_mask, metadata, images, spectra,
            deterministic=not train, rngs={"dropout": rng} if train else {},
        )
        if str(self.fc_cfg.get("criterion", "ce")) == "focal":
            loss = focal_loss(logits, labels, gamma=float(self.fc_cfg.get("focal_gamma", 2.0)))
        else:
            loss = cross_entropy(logits, labels)
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return loss, {"metrics": {"loss": loss, "accuracy": acc}, "logits": logits}

    def predict(self, params, batch):
        photometry, photo_mask, metadata, images, spectra = batch[:5]
        logits = self.module.apply(
            self._variables(params), photometry, photo_mask, metadata, images, spectra,
            deterministic=True,
        )
        return maybe_softmax(logits, bool(self.fc_cfg.get("use_probabilities", False)))

    def make_optimizer(self):
        return optax.adam(float(self.fc_cfg.get("lr", 1e-4)))

    @staticmethod
    def to_tensor(data_dict: dict):
        """Fusion batch: normalize photometry channels, NHWC images.

        Replaces the reference fusion collate (``Time2Vec.py:18-45``) whose
        stats path was hardcoded — stats ride in the batch dict here.
        """
        data = data_dict["data"]
        photo = np.asarray(data["photometry"], dtype=np.float32).copy()
        if "mean" in data:
            mean = np.asarray(data["mean"], dtype=np.float32)
            std = np.asarray(data["std"], dtype=np.float32)
            photo[..., :4] = (photo[..., :4] - mean) / (std + 1e-8)
        pad_mask = np.asarray(
            data.get("pad_mask", np.zeros(photo.shape[:2], bool)), dtype=bool
        )
        metadata = np.asarray(data["metadata"], dtype=np.float32)
        images = np.asarray(data["image"], dtype=np.float32)
        if images.ndim == 4 and images.shape[1] in (1, 3, 4) and images.shape[-1] not in (1, 3, 4):
            images = np.transpose(images, (0, 2, 3, 1))
        spectra = np.asarray(data["spectrum"], dtype=np.float32)
        labels = np.asarray(data.get("label", []), dtype=np.int64)
        return (photo, pad_mask, metadata, images, spectra, labels)
