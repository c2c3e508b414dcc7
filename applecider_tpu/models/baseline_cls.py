"""Photometry transformer classifier (BaselineCLS).

Behavioral contract from the reference
(``src/applecider/models/HyraxBaselineCLS.py:9-166``, archive
``_archive/AppleCider/models/BaselineCLS.py:32-89``):

* input (B, L, 7) event tensor: [log1p dt, log1p dt_prev, logf, logfe,
  one-hot band(3)], continuous channels pre-normalized by train stats;
* Linear(7 -> d_model) projection + additive Time2Vec embedding of the dt
  channel + learned zero-init CLS token prepended;
* post-LN torch-default TransformerEncoder (d_ff = 4*d_model, ReLU);
* LayerNorm on the CLS token; ``mode='photo'`` adds a Linear classification
  head, otherwise the normalized CLS embedding is the output (fusion mode);
* focal loss (gamma=2), Adam lr 1e-4, grad clip 1.0.
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
from applecider_tpu.models.layers import (
    Linear, LayerNorm, TransformerEncoder, resolve_remat,
)
from applecider_tpu.models.time2vec import Time2Vec
from applecider_tpu.ops.losses import focal_loss
from applecider_tpu.registry import register_model

N_EVENT_FEATURES = 7


class BaselineCLSEncoder(nn.Module):
    """Shared trunk: projection + Time2Vec + CLS + transformer.

    Returns all L+1 token embeddings; callers pick CLS or event tokens.
    ``te_dropout`` applies dropout to the time embedding before the add
    (the MPT pretrainer does this; the classifier does not).
    """

    d_model: int
    n_heads: int
    n_layers: int
    dropout: float
    dtype: Optional[jnp.dtype] = None
    attn_impl: str = "auto"  # "auto" | "xla" | "flash" | "pallas" | "pallas_interpret"
    remat: object = False  # False | True | "attn" — see layers.TransformerEncoder

    @nn.compact
    def __call__(self, x, pad_mask, *, deterministic: bool = True, te_dropout: bool = False):
        B, L, _ = x.shape
        h = Linear(self.d_model, dtype=self.dtype, name="in_proj")(x)
        t = x[..., 0]
        te = Time2Vec(self.d_model, dtype=self.dtype, name="time2vec")(t)
        if te_dropout:
            te = FastDropout(self.dropout)(te, deterministic=deterministic)
        h = h + te
        cls_tok = self.param("cls_tok", nn.initializers.zeros, (1, 1, self.d_model))
        tok = jnp.broadcast_to(cls_tok.astype(h.dtype), (B, 1, self.d_model))
        h = jnp.concatenate([tok, h], axis=1)  # (B, L+1, d)
        pad = jnp.concatenate([jnp.zeros((B, 1), dtype=bool), pad_mask.astype(bool)], axis=1)
        z = TransformerEncoder(
            self.n_layers,
            self.n_heads,
            self.d_model * 4,
            self.dropout,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            remat=self.remat,
            name="encoder",
        )(h, pad, deterministic=deterministic)
        return z


class BaselineCLSModule(nn.Module):
    d_model: int = 128
    n_heads: int = 8
    n_layers: int = 4
    num_classes: int = 5
    dropout: float = 0.40
    classification: bool = True
    dtype: Optional[jnp.dtype] = None
    attn_impl: str = "auto"
    remat: object = False  # False | True | "attn"

    @nn.compact
    def __call__(self, x, pad_mask, *, deterministic: bool = True):
        z = BaselineCLSEncoder(
            self.d_model, self.n_heads, self.n_layers, self.dropout,
            dtype=self.dtype, attn_impl=self.attn_impl, remat=self.remat,
            name="trunk",
        )(x, pad_mask, deterministic=deterministic)
        out = LayerNorm(dtype=self.dtype, name="norm")(z[:, 0])
        if self.classification:
            out = Linear(self.num_classes, dtype=self.dtype, name="fc")(out)
        return out.astype(jnp.float32)


@register_model(name="BaselineCLS")
@register_model(name="HyraxBaselineCLS")
class BaselineCLSTask(Task):
    name = "BaselineCLS"

    def __init__(self, config):
        super().__init__(config)
        mc = config["model"]["BaselineCLS"]
        self.mc = mc
        self.grad_clip = float(mc.get("grad_clip", 1.0))
        self.module = BaselineCLSModule(
            d_model=int(mc["d_model"]),
            n_heads=int(mc["n_heads"]),
            n_layers=int(mc["n_layers"]),
            num_classes=int(mc["num_classes"]),
            dropout=float(mc["dropout"]),
            classification=(mc.get("mode", "photo") == "photo"),
            dtype=self.compute_dtype(),
            attn_impl=str(mc.get("attention_impl", "auto")),
            remat=resolve_remat(mc.get("remat", "auto")),
        )

    def init(self, rng, batch):
        data, pad_mask, _ = batch
        return self.module.init(
            {"params": rng}, jnp.asarray(data), jnp.asarray(pad_mask), deterministic=True
        )

    def loss_fn(self, params, batch, rng, train: bool):
        data, pad_mask, labels = batch
        logits = self.module.apply(
            {"params": params}, data, pad_mask,
            deterministic=not train, rngs={"dropout": rng} if train else {},
        )
        loss = focal_loss(logits, labels, gamma=float(self.mc.get("focal_gamma", 2.0)))
        metrics = {
            "loss": loss,
            # the reference logs the per-batch TDE count (HyraxBaselineCLS.py:120)
            "num_tdes": jnp.sum(labels == 4),
        }
        return loss, {"metrics": metrics, "logits": logits}

    def predict(self, params, batch):
        data, pad_mask = batch[0], batch[1]
        logits = self.module.apply({"params": params}, data, pad_mask, deterministic=True)
        return maybe_softmax(logits, bool(self.mc.get("use_probabilities", False)))

    def make_optimizer(self):
        return optax.adam(float(self.mc.get("lr", 1e-4)))

    @staticmethod
    def to_tensor(data_dict: dict):
        """Normalize the 4 continuous channels by train stats and emit
        (photometry, pad_mask, labels)."""
        data = data_dict["data"]
        photo = np.asarray(data["photometry"], dtype=np.float32).copy()
        labels = np.asarray(data.get("label", []), dtype=np.int64)
        mean = np.asarray(data["mean"], dtype=np.float32)
        std = np.asarray(data["std"], dtype=np.float32)
        photo[..., :4] = (photo[..., :4] - mean) / (std + 1e-8)
        if "pad_mask" in data:
            pad_mask = np.asarray(data["pad_mask"], dtype=bool)
        else:
            pad_mask = np.zeros(photo.shape[:2], dtype=bool)
        return (photo, pad_mask, labels)
