"""Baseline model zoo (comparison models from the paper).

Behavioral contracts from the reference's ``_archive/AppleCider/models/other
models/``:

* ``BTSModel``    — BTSbot CNN over sci/ref/diff cutouts (2 conv blocks,
  max-pool 2 then 4, flatten -> Linear) [BTSModel.py:1-64]
* ``GalSpecNet``  — 1-D CNN spectra classifier (Conv-ReLU[-MaxPool] chain,
  dropout, Linear) [GalSpecNet.py:1-46]
* ``MetaModel``   — AstroM3 metadata MLP (2x Linear-ReLU-Dropout, Linear)
  [MetaModel.py:1-36]
* ``Informer``    — ProbSparse-attention encoder classifier
  [Informer.py:1-309]; the sparse top-u query selection is re-expressed
  with static shapes (lax.top_k + gather/scatter), TPU-friendly.
* ``SpectraViT`` / ``SpectraConvNeXt`` — timm-backbone spectra baselines;
  backbones are reimplemented (ViT from scratch; ConvNeXt reuses
  ``applecider_tpu.models.convnext``). Offline, so no pretrained weights —
  the reference's ``pretrained=True`` requires a download either way.

Every model keeps the reference's ``mode`` toggle: classification head on
when mode matches, embedding output otherwise (for fusion use).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from applecider_tpu.ops.dropout import FastDropout

from applecider_tpu.models.convnext import ConvNeXt, Conv2dTorch
from applecider_tpu.models.layers import (
    LayerNorm,
    Linear,
    MultiHeadSelfAttention,
    TransformerEncoder,
    gelu_exact,
)
from applecider_tpu.ops.conv1d import conv1d, max_pool1d
from applecider_tpu.registry import register_model



class BTSModel(nn.Module):
    """BTSbot-style CNN over (B, H, W, C) cutout stacks."""

    conv1_channels: int = 32
    conv2_channels: int = 64
    conv_kernel: int = 5
    dropout1: float = 0.25
    dropout2: float = 0.25
    num_classes: int = 5
    classification: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        pad = self.conv_kernel // 2
        for ch in (self.conv1_channels, self.conv1_channels):
            x = nn.relu(Conv2dTorch(ch, self.conv_kernel, padding=pad, dtype=self.dtype)(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = FastDropout(self.dropout1)(x, deterministic=deterministic)
        for ch in (self.conv2_channels, self.conv2_channels):
            x = nn.relu(Conv2dTorch(ch, self.conv_kernel, padding=pad, dtype=self.dtype)(x))
        x = nn.max_pool(x, (4, 4), strides=(4, 4))
        x = FastDropout(self.dropout2)(x, deterministic=deterministic)
        x = x.reshape(x.shape[0], -1)
        if self.classification:
            x = Linear(self.num_classes, name="fc")(x)
        return x.astype(jnp.float32)



class GalSpecNet(nn.Module):
    """Conv-ReLU[-MaxPool] 1-D chain over spectra (NLC layout)."""

    conv_channels: Sequence[int] = (1, 64, 64, 32, 32)
    kernel_size: int = 5
    mp_kernel_size: int = 2
    dropout: float = 0.3
    num_classes: int = 9
    classification: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if x.ndim == 2:
            x = x[..., None]
        n = len(self.conv_channels) - 1
        for i in range(n):
            # torch Conv1d with no padding -> trim k-1 from length
            cin = x.shape[-1]
            kernel = self.param(
                f"conv{i}_kernel",
                lambda k, s: jax.random.uniform(
                    k, s, jnp.float32,
                    -1 / math.sqrt(s[0] * s[1]), 1 / math.sqrt(s[0] * s[1])),
                (self.kernel_size, cin, self.conv_channels[i + 1]),
            )
            bias = self.param(f"conv{i}_bias", nn.initializers.zeros,
                              (self.conv_channels[i + 1],))
            # torch Conv1d default padding=0 (VALID): out length L-k+1.
            # The former same-conv + trim was wrong for even k ('same'
            # pads k//2 both sides, so length came out L+1 with shifted
            # values); a direct VALID conv is exact for every k.
            y = jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype), window_strides=(1,),
                padding="VALID", dimension_numbers=("NWC", "WIO", "NWC"),
            ) + bias
            x = nn.relu(y)
            if i < n - 1:
                x = max_pool1d(x, self.mp_kernel_size)
        x = x.reshape(x.shape[0], -1)
        x = FastDropout(self.dropout)(x, deterministic=deterministic)
        if self.classification:
            x = Linear(self.num_classes, name="fc")(x)
        return x.astype(jnp.float32)



class MetaModel(nn.Module):
    """AstroM3-style metadata MLP."""

    hidden_dim: int = 128
    dropout: float = 0.2
    num_classes: int = 5
    classification: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        for _ in range(2):
            x = nn.relu(Linear(self.hidden_dim, dtype=self.dtype)(x))
            x = FastDropout(self.dropout)(x, deterministic=deterministic)
        if self.classification:
            x = Linear(self.num_classes, name="fc")(x)
        return x.astype(jnp.float32)


class ProbSparseSelfAttention(nn.Module):
    """Informer ProbSparse attention with static shapes.

    Top-u "active" queries (u = factor * ceil(ln L)) get full attention;
    the rest receive the mean of V (non-causal initial context). Key
    sampling for the sparsity measure is deterministic strided sampling —
    same estimator spirit, trace-stable on TPU.
    """

    num_heads: int
    factor: int = 5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        B, L, D = x.shape
        H = self.num_heads
        hd = D // H
        qkv = Linear(3 * D, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, L, H, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        u = max(min(int(self.factor * math.ceil(math.log(max(L, 2)))), L), 1)
        sample_k = u

        # strided key sample for the sparsity measure
        stride = max(L // sample_k, 1)
        k_sample = k[:, :, ::stride, :][:, :, :sample_k, :]
        qk_sample = jnp.einsum("bhld,bhsd->bhls", q, k_sample) / math.sqrt(hd)
        M = jnp.max(qk_sample, axis=-1) - jnp.mean(qk_sample, axis=-1)  # (B,H,L)
        _, top_idx = jax.lax.top_k(M, u)  # (B,H,u)

        q_top = jnp.take_along_axis(q, top_idx[..., None], axis=2)  # (B,H,u,hd)
        scores = jnp.einsum("bhud,bhld->bhul", q_top, k) / math.sqrt(hd)
        attn = jax.nn.softmax(scores, axis=-1)
        ctx_top = jnp.einsum("bhul,bhld->bhud", attn, v)

        ctx = jnp.broadcast_to(jnp.mean(v, axis=2, keepdims=True), v.shape)
        b_idx = jnp.arange(B)[:, None, None]
        h_idx = jnp.arange(H)[None, :, None]
        ctx = ctx.at[b_idx, h_idx, top_idx].set(ctx_top)
        out = ctx.transpose(0, 2, 1, 3).reshape(B, L, D)
        return Linear(D, dtype=self.dtype, name="out_proj")(out)


class DistilConvLayer(nn.Module):
    """Informer's self-attention distilling between encoder stages
    (canonical design, AAAI'21 paper §3.3: Conv1d(k=3) + norm + ELU +
    MaxPool(3, stride 2) — halves the sequence). The reference's copy of
    Informer drops these (its ``Encoder`` at ``other models/Informer.py:231``
    takes attention layers only); provided here as an option for the
    canonical architecture. Norm is LayerNorm (the paper's BatchNorm1d
    running stats don't fit the functional TPU step)."""

    d_model: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            (3, x.shape[-1], self.d_model),
        )
        x = conv1d(x.astype(jnp.float32), kernel, mode="direct")
        x = LayerNorm(name="norm")(x)
        x = nn.elu(x)
        # MaxPool1d(kernel=3, stride=2, padding=1)
        x = jnp.pad(x, ((0, 0), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 3, 1), window_strides=(1, 2, 1), padding="VALID",
        )
        return x.astype(self.dtype or jnp.float32)



class Informer(nn.Module):
    """Informer-style encoder classifier over event sequences.

    ``head="flatten"`` reproduces the reference head exactly
    (``other models/Informer.py:297-309``): encoder output is multiplied by
    the valid-token mask, flattened to (B, L*d_model), then classified.
    ``head="mean"`` is the TPU-friendly default (no L*d_model weight blow-up).
    ``distil=True`` inserts the canonical distilling conv+pool between
    encoder stages (halving L each time; absent from the reference's copy).
    """

    c_in: int = 7
    d_model: int = 128
    n_heads: int = 8
    n_layers: int = 2
    dropout: float = 0.1
    num_classes: int = 5
    classification: bool = True
    head: str = "mean"  # "mean" | "flatten"
    distil: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask=None, *, deterministic: bool = True):
        B, L, _ = x.shape
        # token embedding: conv1d over time (Informer's TokenEmbedding)
        kernel = self.param(
            "token_kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            (3, self.c_in, self.d_model),
        )
        h = conv1d(x.astype(jnp.float32), kernel, mode="direct")
        # sinusoidal positional embedding
        pos = jnp.arange(L)[:, None]
        div = jnp.exp(jnp.arange(0, self.d_model, 2) * (-math.log(10000.0) / self.d_model))
        pe = jnp.zeros((L, self.d_model))
        pe = pe.at[:, 0::2].set(jnp.sin(pos * div)).at[:, 1::2].set(jnp.cos(pos * div))
        h = h + pe[None]
        h = FastDropout(self.dropout)(h, deterministic=deterministic)

        for i in range(self.n_layers):
            a = ProbSparseSelfAttention(self.n_heads, dtype=self.dtype, name=f"attn_{i}")(h)
            h = LayerNorm(name=f"norm1_{i}")(h + FastDropout(self.dropout)(a, deterministic=deterministic))
            f = Linear(4 * self.d_model, name=f"ff1_{i}")(h)
            f = Linear(self.d_model, name=f"ff2_{i}")(nn.relu(f))
            h = LayerNorm(name=f"norm2_{i}")(h + FastDropout(self.dropout)(f, deterministic=deterministic))
            if self.distil and i < self.n_layers - 1:
                h = DistilConvLayer(self.d_model, dtype=self.dtype, name=f"distil_{i}")(h)
                if mask is not None:  # pool the valid mask alongside
                    m = jnp.pad(mask.astype(jnp.float32)[..., None], ((0, 0), (1, 1), (0, 0)))
                    m = jax.lax.reduce_window(
                        m, -jnp.inf, jax.lax.max,
                        window_dimensions=(1, 3, 1), window_strides=(1, 2, 1),
                        padding="VALID",
                    )
                    mask = m[..., 0] > 0
        h = LayerNorm(name="norm_final")(h)
        h = FastDropout(self.dropout)(h, deterministic=deterministic)

        if self.head == "flatten":
            # reference head: zero padding embeddings, flatten L*d_model
            valid = (
                mask.astype(h.dtype)
                if mask is not None
                else jnp.ones(h.shape[:2], h.dtype)
            )
            h = (h * valid[..., None]).reshape(B, -1)
        else:
            if mask is not None:
                valid = mask.astype(h.dtype)[..., None]
                h = jnp.sum(h * valid, axis=1) / jnp.maximum(jnp.sum(valid, axis=1), 1.0)
            else:
                h = jnp.mean(h, axis=1)
        if self.classification:
            h = Linear(self.num_classes, name="fc")(h)
        return h.astype(jnp.float32)


class ViT(nn.Module):
    """Plain ViT encoder (patch embed + CLS + pre-LN transformer)."""

    patch: int = 16
    dim: int = 256
    depth: int = 4
    heads: int = 8
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        x = Conv2dTorch(self.dim, self.patch, stride=self.patch, dtype=self.dtype, name="patch")(x)
        x = x.reshape(B, -1, self.dim)
        cls = self.param("cls", nn.initializers.zeros, (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.dim)), x], axis=1)
        pos = self.param("pos", nn.initializers.normal(0.02), (1, x.shape[1], self.dim))
        x = x + pos
        x = TransformerEncoder(self.depth, self.heads, self.dim * 4, 0.0,
                               dtype=self.dtype, name="encoder")(x)
        return LayerNorm(name="norm")(x[:, 0])



class SpectraViT(nn.Module):
    """ViT backbone + MLP head over spectrogram-like 2-D spectra renders."""

    s_dim: int = 512
    dropout: float = 0.3
    num_classes: int = 9
    classification: bool = True
    backbone_dim: int = 256
    backbone_depth: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        feats = ViT(dim=self.backbone_dim, depth=self.backbone_depth, dtype=self.dtype)(x)
        h = nn.relu(Linear(self.s_dim)(feats))
        h = FastDropout(self.dropout)(h, deterministic=deterministic)
        h = nn.relu(Linear(256)(h))
        h = FastDropout(self.dropout)(h, deterministic=deterministic)
        if self.classification:
            h = Linear(self.num_classes, name="fc")(h)
        return h.astype(jnp.float32)


# ------------------------------------------------------- EfficientNetV2
class _SqueezeExcite(nn.Module):
    """SE gate: global-pool -> 1x1 reduce (silu) -> 1x1 expand (sigmoid)."""

    reduced: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.silu(Conv2dTorch(self.reduced, 1, dtype=self.dtype, name="reduce")(s))
        s = nn.sigmoid(Conv2dTorch(x.shape[-1], 1, dtype=self.dtype, name="expand")(s))
        return x * s


class _MBConvBlock(nn.Module):
    """EfficientNetV2 block: fused-MBConv (early stages) or MBConv+SE.

    BatchNorm uses running statistics when ``deterministic`` (inference);
    training updates them through the mutable ``batch_stats`` collection.
    """

    out_ch: int
    expand: int
    kernel: int
    stride: int
    se_ratio: float
    fused: bool
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        cin = x.shape[-1]
        mid = cin * self.expand

        def bn(name):
            return nn.BatchNorm(
                use_running_average=deterministic, momentum=0.9, epsilon=1e-3,
                dtype=self.dtype, name=name,
            )

        h = x
        if self.fused:
            if self.expand != 1:
                h = Conv2dTorch(mid, self.kernel, stride=self.stride,
                                padding=self.kernel // 2, dtype=self.dtype,
                                name="expand_conv")(h)
                h = nn.silu(bn("bn0")(h))
                h = Conv2dTorch(self.out_ch, 1, dtype=self.dtype, name="project_conv")(h)
                h = bn("bn1")(h)  # no activation after projection
            else:
                h = Conv2dTorch(self.out_ch, self.kernel, stride=self.stride,
                                padding=self.kernel // 2, dtype=self.dtype,
                                name="project_conv")(h)
                h = nn.silu(bn("bn1")(h))
        else:
            if self.expand != 1:
                h = Conv2dTorch(mid, 1, dtype=self.dtype, name="expand_conv")(h)
                h = nn.silu(bn("bn0")(h))
            h = Conv2dTorch(mid, self.kernel, stride=self.stride,
                            padding=self.kernel // 2, groups=mid, dtype=self.dtype,
                            name="dw_conv")(h)
            h = nn.silu(bn("bn1")(h))
            if self.se_ratio > 0:
                h = _SqueezeExcite(max(1, int(cin * self.se_ratio)),
                                   dtype=self.dtype, name="se")(h)
            h = Conv2dTorch(self.out_ch, 1, dtype=self.dtype, name="project_conv")(h)
            h = bn("bn2")(h)
        if self.stride == 1 and cin == self.out_ch:
            h = h + x  # identity residual (stochastic depth off, eval parity)
        return h


# stage specs: (fused, expand, kernel, stride, channels, blocks, se_ratio)
EFFNETV2_ARCHS: dict = {
    "l": (32, (
        (True, 1, 3, 1, 32, 4, 0.0), (True, 4, 3, 2, 64, 7, 0.0),
        (True, 4, 3, 2, 96, 7, 0.0), (False, 4, 3, 2, 192, 10, 0.25),
        (False, 6, 3, 1, 224, 19, 0.25), (False, 6, 3, 2, 384, 25, 0.25),
        (False, 6, 3, 1, 640, 7, 0.25),
    )),
    # what the reference *actually* loads: its class is named ...V2L but the
    # timm tag is tf_efficientnetv2_m (SpectraEfficientNetV2L.py:12)
    "m": (24, (
        (True, 1, 3, 1, 24, 3, 0.0), (True, 4, 3, 2, 48, 5, 0.0),
        (True, 4, 3, 2, 80, 5, 0.0), (False, 4, 3, 2, 160, 7, 0.25),
        (False, 6, 3, 1, 176, 14, 0.25), (False, 6, 3, 2, 304, 18, 0.25),
        (False, 6, 3, 1, 512, 5, 0.25),
    )),
    # CPU-testable miniature with one stage of each block kind
    "tiny": (8, (
        (True, 1, 3, 1, 8, 1, 0.0), (True, 2, 3, 2, 16, 1, 0.0),
        (False, 2, 3, 2, 16, 2, 0.25),
    )),
}


class EfficientNetV2(nn.Module):
    """EfficientNetV2 feature backbone (stem -> staged blocks -> 1x1 head).

    Returns pooled (B, head_features) embeddings, i.e. timm's
    ``num_classes=0`` behavior the reference relies on.
    """

    arch: str = "m"
    head_features: int = 1280
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        stem_ch, stages = EFFNETV2_ARCHS[self.arch]

        def bn(name):
            return nn.BatchNorm(
                use_running_average=deterministic, momentum=0.9, epsilon=1e-3,
                dtype=self.dtype, name=name,
            )

        x = Conv2dTorch(stem_ch, 3, stride=2, padding=1, dtype=self.dtype,
                        name="stem_conv")(x)
        x = nn.silu(bn("stem_bn")(x))
        for si, (fused, expand, k, stride, ch, blocks, se) in enumerate(stages):
            for bi in range(blocks):
                x = _MBConvBlock(
                    out_ch=ch, expand=expand, kernel=k,
                    stride=stride if bi == 0 else 1, se_ratio=se, fused=fused,
                    dtype=self.dtype, name=f"stage{si}_block{bi}",
                )(x, deterministic=deterministic)
        x = Conv2dTorch(self.head_features, 1, dtype=self.dtype, name="head_conv")(x)
        x = nn.silu(bn("head_bn")(x))
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)



class SpectraEfficientNetV2(nn.Module):
    """EfficientNetV2 spectra baseline.

    Reference contract (``_archive/AppleCider/models/other models/
    SpectraEfficientNetV2L.py:5-37``): timm EfficientNetV2 backbone with the
    classifier stripped, then Linear(s_dim) -> BatchNorm1d -> ReLU ->
    Dropout -> Linear(256) -> BatchNorm1d -> ReLU -> Dropout, plus an
    optional fc classification head. Reference quirks handled here: the
    class is *named* V2-L but loads the ``tf_efficientnetv2_m`` tag (so
    ``arch`` defaults to "m"), and it reads ``self.classification`` without
    ever assigning it (an AttributeError on use) — here it is a proper
    field matching the rest of the zoo's ``mode`` toggle. No pretrained
    weights offline (the reference's ``pretrained=True`` downloads either
    way).
    """

    arch: str = "m"
    s_dim: int = 512
    dropout: float = 0.3
    num_classes: int = 9
    classification: bool = True
    head_features: int = 1280
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        feats = EfficientNetV2(
            arch=self.arch, head_features=self.head_features,
            dtype=self.dtype, name="backbone",
        )(x, deterministic=deterministic)

        def bn1d(name):
            return nn.BatchNorm(
                use_running_average=deterministic, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=name,
            )

        h = Linear(self.s_dim, dtype=self.dtype)(feats)
        h = nn.relu(bn1d("head_bn0")(h))
        h = FastDropout(self.dropout)(h, deterministic=deterministic)
        h = Linear(256, dtype=self.dtype)(h)
        h = nn.relu(bn1d("head_bn1")(h))
        h = FastDropout(self.dropout)(h, deterministic=deterministic)
        if self.classification:
            h = Linear(self.num_classes, name="fc")(h)
        return h.astype(jnp.float32)



class SpectraConvNeXt(nn.Module):
    """ConvNeXt backbone spectra baseline (ConvNeXt-base dims by default)."""

    depths: Sequence[int] = (3, 3, 27, 3)
    dims: Sequence[int] = (128, 256, 512, 1024)
    num_classes: int = 9
    classification: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        feats = ConvNeXt(tuple(self.depths), tuple(self.dims), dtype=self.dtype)(x)
        if self.classification:
            feats = Linear(self.num_classes, name="fc")(feats)
        return feats.astype(jnp.float32)


# --------------------------------------------------------------- Task glue
# The zoo baselines are bare nn.Modules (the reference's counterparts live
# in standalone archive scripts), but the model registry's only consumers
# (train/runtime.py) require the Task interface — registering the raw
# modules made `model.name = "GalSpecNet"` crash at task.to_tensor. Each
# zoo name now registers a thin Task adapter: config section
# [model.<Name>] supplies the module's dataclass fields (+ `lr`), batches
# are (input, label) with the input pulled from the dataset dict by kind.
def _zoo_task(module_cls, input_keys, task_name):
    import dataclasses

    import numpy as np
    import optax

    from applecider_tpu.models.base import Task, maybe_softmax
    from applecider_tpu.ops.losses import cross_entropy

    class _ZooTask(Task):
        name = task_name

        def __init__(self, config):
            super().__init__(config)
            mc = dict(config["model"].get(task_name, {}) or {})
            self.mc = mc
            fields = {f.name for f in dataclasses.fields(module_cls)}
            kwargs = {k: (tuple(v) if isinstance(v, list) else v)
                      for k, v in mc.items() if k in fields}
            kwargs.setdefault("dtype", self.compute_dtype())
            self.module = module_cls(**kwargs)
            self.batch_stats = None

        def init(self, rng, batch):
            variables = self.module.init(
                {"params": rng}, jnp.asarray(batch[0]), deterministic=True)
            # BN running stats (SpectraEfficientNetV2): the Trainer treats
            # batch_stats as frozen constants (same stance as the tri-pool
            # import path) — train-mode BN normalizes with batch statistics
            # but running averages stay at init/checkpoint values
            self.batch_stats = variables.get("batch_stats")
            return variables

        def _vars(self, params):
            if getattr(self, "batch_stats", None):
                return {"params": params, "batch_stats": self.batch_stats}
            return {"params": params}

        def loss_fn(self, params, batch, rng, train: bool):
            x, labels = batch[0], batch[1]
            kw = dict(deterministic=not train)
            if train:
                kw["rngs"] = {"dropout": rng}
            if train and getattr(self, "batch_stats", None):
                logits, _ = self.module.apply(
                    self._vars(params), x, mutable=["batch_stats"], **kw)
            else:
                logits = self.module.apply(self._vars(params), x, **kw)
            loss = cross_entropy(logits, labels)
            return loss, {"metrics": {"loss": loss}, "logits": logits}

        def predict(self, params, batch):
            logits = self.module.apply(
                self._vars(params), batch[0], deterministic=True)
            return maybe_softmax(
                logits, bool(self.mc.get("use_probabilities", False)))

        def make_optimizer(self):
            return optax.adam(float(self.mc.get("lr", 1e-4)))

        @staticmethod
        def to_tensor(data_dict: dict):
            data = data_dict["data"]
            for key in input_keys:
                if key in data:
                    x = np.asarray(data[key], np.float32)
                    break
            else:
                raise KeyError(
                    f"{task_name} batch needs one of {input_keys}; "
                    f"got keys {sorted(data)}")
            labels = np.asarray(data.get("label", []), np.int64)
            return (x, labels)

    _ZooTask.__name__ = f"{task_name}Task"
    return _ZooTask


_SPEC_KEYS = ("flux", "spectrum", "spectra", "x")
# the timm-style spectra baselines consume 2-D spectra RENDERS (images)
_RENDER_KEYS = ("spectrum_image", "image", "x")
for _name, _cls, _keys in (
    ("BTSModel", BTSModel, ("image", "x")),
    ("GalSpecNet", GalSpecNet, _SPEC_KEYS),
    ("MetaModel", MetaModel, ("metadata", "meta19", "x")),
    ("Informer", Informer, ("photometry", "events", "x")),
    ("SpectraViT", SpectraViT, _RENDER_KEYS),
    ("SpectraEfficientNetV2", SpectraEfficientNetV2, _RENDER_KEYS),
    ("SpectraConvNeXt", SpectraConvNeXt, _RENDER_KEYS),
):
    register_model(name=_name)(_zoo_task(_cls, _keys, _name))
