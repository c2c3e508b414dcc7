"""ConvNeXt-tiny backbone in flax.

The reference's image tower depends on timm's ``convnext_tiny``
(``src/applecider/models/astrominn.py:12-17``); timm is torch-only, so the
backbone is reimplemented here following the published ConvNeXt
architecture (Liu et al. 2022, "A ConvNet for the 2020s"):

* stem: 4x4 conv stride 4 + LayerNorm (eps 1e-6);
* 4 stages, depths (3, 3, 9, 3), dims (96, 192, 384, 768) for tiny;
* block: 7x7 depthwise conv -> LN -> pointwise MLP (4x, exact GELU) ->
  layer-scale gamma (init 1e-6) -> residual (stochastic depth off at eval);
* downsample between stages: LN + 2x2 conv stride 2;
* features = LN(global-avg-pool(final stage)) — matches timm with
  ``num_classes=0`` (head fc = identity).

NHWC layout throughout (TPU native; timm permutes NCHW<->NHWC per block).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from applecider_tpu.models.layers import LayerNorm, Linear, gelu_exact, torch_bias_init


# --------------------------------------------------------------- depthwise
# At 63x63 input the ConvNeXt stages run at 15/7/3/1 spatial, so the 7x7
# depthwise conv is a *tiny-spatial* op. Two measured reformulations
# (scripts/tpu_dw_matmul_ab.py, v5e, B=1024, bf16):
#
#   center  at 1x1 spatial with padding (k-1)/2, only the center tap ever
#           touches real data -> y = x * k[c, center] (exact, pure
#           elementwise; fuses into the surrounding block for free).
#   matmul  y[b,o,c] = sum_p x_pad[b,p,c] * A[c,o,p] with A built from the
#           kernel taps and a constant one-hot gather tensor -> a
#           C-batched (B,P)x(P,O) MXU matmul. (H+2p)^2/k^2 FLOP blowup on
#           the banded zeros, but standalone it beats the grouped-conv
#           path at every stage shape (1.46 vs 2.54 ms at 15x15x96).
#
# ACDWCONV=conv|center|matmul|auto (default auto) picks the path; auto is
# decided per shape from the on-chip A/Bs recorded in docs/KERNEL_NOTES.md.


@functools.lru_cache(maxsize=None)
def _dw_gather_onehot(h: int, w: int, k: int, pad: int) -> np.ndarray:
    """G[t, o, p]: tap t of output pixel o reads padded-input pixel p."""
    hp, wp = h + 2 * pad, w + 2 * pad
    G = np.zeros((k * k, h * w, hp * wp), np.float32)
    for dh in range(k):
        for dw in range(k):
            t = dh * k + dw
            for oh in range(h):
                for ow in range(w):
                    G[t, oh * w + ow, (oh + dh) * wp + (ow + dw)] = 1.0
    return G


def _dw_impl(h: int, w: int, k: int, pad: int) -> str:
    """Pick the depthwise implementation for a (h, w) spatial shape."""
    if 2 * pad != k - 1:  # paths below assume "same" output size
        return "conv"
    mode = os.environ.get("ACDWCONV", "auto")
    if mode in ("conv", "matmul"):
        return mode
    if mode == "center":
        return "center" if (h == 1 and w == 1) else "conv"
    # auto: the 1x1 center-tap identity is exact on every backend and can
    # only remove work. The matmul reformulation won STANDALONE at every
    # stage shape (1.46 vs 2.54 ms at 15x15x96) but LOSES IN-MODEL on the
    # jitted img_meta encoder (18.44 vs 15.90 ms at B=1024, v5e) — the
    # standalone gap was launch overhead, and inside the fused program
    # XLA's grouped conv overlaps while the 9x banded-FLOP blowup is real
    # (scripts/tpu_dw_inmodel_ab.py). It stays opt-in for future shapes.
    if h == 1 and w == 1:
        return "center"
    return "conv"


class LayerNorm6(LayerNorm):
    """layers.LayerNorm with the ConvNeXt eps 1e-6 default.

    Same param names/math as the shared LayerNorm (was a verbatim copy;
    kept as a subclass so future fixes land in one place)."""

    eps: float = 1e-6


def _conv_init(key, shape, dtype=jnp.float32):
    """torch Conv2d default: U(+-1/sqrt(fan_in)), kernel (kh, kw, in/groups, out)."""
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Conv2dTorch(nn.Module):
    features: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    padding: int = 0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.kernel_size
        kernel = self.param("kernel", _conv_init, (k, k, cin // self.groups, self.features))
        fan_in = (cin // self.groups) * k * k
        bias = self.param("bias", torch_bias_init(fan_in), (self.features,))
        # opt-in int8 serving path (ops/quant.py); trace-time no-op when off
        from applecider_tpu.ops.quant import quant_conv

        q = quant_conv(
            x, kernel, bias, self.path, self.dtype or x.dtype,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            feature_group_count=self.groups,
        )
        if q is not None:
            return q
        xc = x.astype(self.dtype)
        if (self.groups == cin and self.features == cin and self.stride == 1
                and xc.ndim == 4):
            impl = _dw_impl(xc.shape[1], xc.shape[2], k, self.padding)
            if impl == "center":
                # 1x1 spatial, "same" padding: every non-center tap reads a
                # zero pad pixel; the conv reduces to an exact elementwise
                # multiply by the center tap (rel_err 0.0 on chip).
                y = xc * kernel[self.padding, self.padding, 0].astype(xc.dtype)
                return (y + bias).astype(self.dtype or y.dtype)
            if impl == "matmul":
                b_, h, w, _ = xc.shape
                pad = self.padding
                G = jnp.asarray(_dw_gather_onehot(h, w, k, pad))
                xp = jnp.pad(xc, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
                xp = xp.reshape(b_, (h + 2 * pad) * (w + 2 * pad), cin)
                ktaps = kernel.reshape(k * k, cin).astype(jnp.float32)
                A = jnp.einsum("tc,top->cop", ktaps, G).astype(xc.dtype)
                y = jnp.einsum("bpc,cop->boc", xp, A).reshape(b_, h, w, cin)
                return (y + bias).astype(self.dtype or y.dtype)
        y = jax.lax.conv_general_dilated(
            xc,
            kernel.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
            # f32-store only for f32 operands: conv's VJP rejects the mixed
            # bf16-operand/f32-cotangent transpose conv (see ops/conv1d.py)
            preferred_element_type=jnp.float32 if xc.dtype == jnp.float32 else None,
        )
        return (y + bias).astype(self.dtype or y.dtype)


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = Conv2dTorch(self.dim, 7, padding=3, groups=self.dim, dtype=self.dtype, name="dwconv")(x)
        x = LayerNorm6(dtype=self.dtype, name="norm")(x)
        x = Linear(4 * self.dim, dtype=self.dtype, name="pwconv1")(x)
        x = gelu_exact(x)
        x = Linear(self.dim, dtype=self.dtype, name="pwconv2")(x)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layer_scale_init), (self.dim,)
        )
        x = x * gamma.astype(x.dtype)
        return shortcut + x


class ConvNeXt(nn.Module):
    """ConvNeXt feature extractor; returns (B, dims[-1]) pooled features."""

    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) image in NHWC."""
        x = Conv2dTorch(self.dims[0], 4, stride=4, dtype=self.dtype, name="stem_conv")(x)
        x = LayerNorm6(dtype=self.dtype, name="stem_norm")(x)
        for s in range(len(self.depths)):
            if s > 0:
                x = LayerNorm6(dtype=self.dtype, name=f"downsample{s}_norm")(x)
                x = Conv2dTorch(self.dims[s], 2, stride=2, dtype=self.dtype, name=f"downsample{s}_conv")(x)
            for b in range(self.depths[s]):
                x = ConvNeXtBlock(self.dims[s], dtype=self.dtype, name=f"stage{s}_block{b}")(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return LayerNorm6(dtype=self.dtype, name="head_norm")(x)


def convnext_tiny(dtype=None) -> ConvNeXt:
    return ConvNeXt(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768), dtype=dtype)
