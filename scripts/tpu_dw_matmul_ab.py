"""Depthwise-conv formulation A/B at ConvNeXt's tiny stage shapes.

tpu_img_meta_breakdown.py measured the ConvNeXt backbone at ~13.2 of the
img_meta encoder's 15.7 ms (B=1024) — ~9% MFU — and showed the grouped
7x7 depthwise convs cost 1.1-2.4 ms each standalone while shift-and-add
unrolls lose. At 63x63 input the stages run at 15/7/3/1 spatial, so the
depthwise conv is a *tiny-spatial* op; three candidate reformulations:

  conv      lax.conv_general_dilated(feature_group_count=C)  [current]
  matmul    y[b,o,c] = sum_p x_pad[b,p,c] * A[c,o,p], with
            A = einsum('tc,top->cop', kernel_taps, G) and G a constant
            one-hot (49, O, P) gather tensor — turns the grouped conv
            into a C-batched (B,P)x(P,O) MXU matmul (9x FLOP blowup on
            the banded zeros, but MXU >> grouped-conv path at tiny HW)
  center    at 1x1 spatial with padding 3, only the center tap ever
            touches data: y = x * k[3,3] (pure elementwise)

Relay measurement rules (KERNEL_NOTES) throughout.

Run: nohup python -u scripts/tpu_dw_matmul_ab.py > /tmp/dwm.log 2>&1 &
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

from bench import _block  # noqa: E402


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timeit(fn, *args, iters=24):
    _block(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _block(out)
    return round((time.perf_counter() - t0) / iters * 1e3, 3)


def dw_conv(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=[(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


def gather_onehot(H: int, W: int) -> np.ndarray:
    """G[t, o, p]: tap t of output pixel o reads padded-input pixel p."""
    Hp, Wp = H + 6, W + 6
    G = np.zeros((49, H * W, Hp * Wp), np.float32)
    for dh in range(7):
        for dw in range(7):
            t = dh * 7 + dw
            for oh in range(H):
                for ow in range(W):
                    G[t, oh * W + ow, (oh + dh) * Wp + (ow + dw)] = 1.0
    return G


@functools.partial(jax.jit, static_argnames=("H",))
def dw_matmul(x, kernel, G, *, H):
    B, _, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0))).reshape(B, (H + 6) * (W + 6), C)
    ktaps = kernel.reshape(49, C)
    A = jnp.einsum("tc,top->cop", ktaps.astype(jnp.float32), G).astype(x.dtype)
    y = jnp.einsum("bpc,cop->boc", xp, A)
    return y.reshape(B, H, W, C).astype(x.dtype)


@jax.jit
def dw_center(x, kernel):
    return x * kernel[3, 3, 0]


def main() -> None:
    dev = jax.devices()[0]
    bs = int(os.environ.get("PROBE_BS", "1024"))
    emit(stage="device", device=str(dev), batch=bs)
    rng = np.random.default_rng(0)

    for (H, C) in ((15, 96), (7, 192), (3, 384), (1, 768)):
        x = jnp.asarray(rng.normal(size=(bs, H, H, C)).astype(np.float32), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(7, 7, 1, C)).astype(np.float32), jnp.bfloat16)
        f_conv = jax.jit(dw_conv)
        a = np.asarray(f_conv(x, k), np.float32)
        row = {"shape": f"{H}x{H}x{C}"}
        G = jnp.asarray(gather_onehot(H, H))
        b = np.asarray(dw_matmul(x, k, G, H=H), np.float32)
        row["matmul_rel_err"] = round(
            float(np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)), 6)
        if H == 1:
            c = np.asarray(dw_center(x, k), np.float32)
            row["center_rel_err"] = round(
                float(np.max(np.abs(a - c)) / (np.max(np.abs(a)) + 1e-9)), 6)
            row["center_ms"] = timeit(dw_center, x, k)
        row["conv_ms"] = timeit(f_conv, x, k)
        row["matmul_ms"] = timeit(lambda xx, kk: dw_matmul(xx, kk, G, H=H), x, k)
        emit(**row)


if __name__ == "__main__":
    main()
