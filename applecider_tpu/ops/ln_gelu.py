"""Fused LayerNorm+GELU Pallas kernel — the SpectraNet stage epilogue.

The round-4 speed-of-light table (docs/KERNEL_NOTES.md §Round-4) attributes
~19-28 ms of the b256 fusion train step to f32 LayerNorm/convert/pool HBM
passes over SpectraNet's stage activations (e.g. f32[256, 3481, 192]).
This kernel is the "last measured shot" (VERDICT r4 #6) at that residual:

* forward: ``y = gelu_exact(layernorm(x) * scale + bias)`` in ONE HBM
  read + ONE write per element (XLA's fusion typically pays an extra
  normalize pass for the mean/var reduction);
* backward: recomputes everything in-VMEM from x (no residuals except x
  itself), emits dx in one read(g,x)+write(dx) pass plus per-grid-block
  partial (dscale, dbias) rows reduced outside the kernel.

LayerNorm semantics match ``models.layers.LayerNorm`` (torch eps 1e-5,
f32 stats over the LAST dim); GELU is the exact erf formulation
(``gelu_exact``). Exactness vs the unfused ops is unit-tested in
interpret mode (tests/test_ln_gelu.py); the on-chip train-step A/B lives
in scripts/tpu_ln_gelu_ab.py and decides adoption (>= 5 ms or the ledger
closes — KERNEL_NOTES).

Enable in the model with ``ACLNGELU=pallas`` (``pallas_interpret`` for
CPU tests); default off until the A/B wins.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_SQRT2 = math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def impl() -> str:
    return os.environ.get("ACLNGELU", "")


# ------------------------------------------------------------------ reference
def ln_gelu_reference(x, scale, bias, eps: float = 1e-5):
    """Unfused oracle: f32 LN over last dim, then exact GELU."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    z = (xf - mean) * inv * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return (0.5 * z * (1.0 + jax.lax.erf(z / _SQRT2))).astype(x.dtype)


# -------------------------------------------------------------------- kernels
def _fwd_kernel(x_ref, s_ref, b_ref, y_ref, *, eps: float):
    xf = x_ref[...].astype(jnp.float32)  # (RB, C)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    z = (xf - mean) * inv * s_ref[...].astype(jnp.float32) + \
        b_ref[...].astype(jnp.float32)
    y = 0.5 * z * (1.0 + jax.lax.erf(z / _SQRT2))
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_kernel(x_ref, s_ref, b_ref, g_ref, dx_ref, ds_ref, db_ref, *,
                eps: float):
    xf = x_ref[...].astype(jnp.float32)
    gf = g_ref[...].astype(jnp.float32)
    s = s_ref[...].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * inv
    z = xhat * s + b_ref[...].astype(jnp.float32)
    # d gelu(z)/dz = Phi(z) + z * phi(z)
    dgelu = 0.5 * (1.0 + jax.lax.erf(z / _SQRT2)) + \
        z * _INV_SQRT_2PI * jnp.exp(-0.5 * z * z)
    dz = gf * dgelu
    ds_ref[...] = jnp.sum(dz * xhat, axis=0, keepdims=True)
    db_ref[...] = jnp.sum(dz, axis=0, keepdims=True)
    dxhat = dz * s
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ref[...] = (inv * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)


def _pick_rb(n_rows: int, c: int) -> int:
    """Row-block size: keep the (RB, C) f32 tile plus temporaries in VMEM."""
    budget = 2 * 1024 * 1024 // max(c * 4, 1)  # ~2 MB for x per pass
    rb = max(8, min(1024, budget))
    while n_rows % rb:
        rb //= 2
        if rb < 8:
            return 0  # shape doesn't tile; caller falls back
    return rb


def _rows_spec(rb, c):
    return pl.BlockSpec((rb, c), lambda i: (i, 0))


def _vec_spec(c):
    return pl.BlockSpec((1, c), lambda i: (0, 0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ln_gelu_2d(x, scale, bias, eps: float, interpret: bool):
    y, _ = _ln_gelu_2d_fwd(x, scale, bias, eps, interpret)
    return y


def _ln_gelu_2d_fwd(x, scale, bias, eps, interpret):
    n, c = x.shape
    rb = _pick_rb(n, c)
    if rb == 0:
        return ln_gelu_reference(x, scale, bias, eps), (x, scale, bias)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        grid=(n // rb,),
        in_specs=[_rows_spec(rb, c), _vec_spec(c), _vec_spec(c)],
        out_specs=_rows_spec(rb, c),
        interpret=interpret,
    )(x, scale.reshape(1, c), bias.reshape(1, c))
    return y, (x, scale, bias)


def _ln_gelu_2d_bwd(eps, interpret, res, g):
    x, scale, bias = res
    n, c = x.shape
    rb = _pick_rb(n, c)
    if rb == 0:
        _, vjp = jax.vjp(
            lambda x_, s_, b_: ln_gelu_reference(x_, s_, b_, eps),
            x, scale, bias)
        return vjp(g)
    grid = n // rb
    dx, ds_part, db_part = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((n, c), x.dtype),
            jax.ShapeDtypeStruct((grid, c), jnp.float32),
            jax.ShapeDtypeStruct((grid, c), jnp.float32),
        ),
        grid=(grid,),
        in_specs=[_rows_spec(rb, c), _vec_spec(c), _vec_spec(c),
                  _rows_spec(rb, c)],
        out_specs=(
            _rows_spec(rb, c),
            pl.BlockSpec((1, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (i, 0)),
        ),
        interpret=interpret,
    )(x, scale.reshape(1, c), bias.reshape(1, c), g)
    dscale = jnp.sum(ds_part, axis=0).astype(scale.dtype)
    dbias = jnp.sum(db_part, axis=0).astype(bias.dtype)
    return dx, dscale, dbias


_ln_gelu_2d.defvjp(_ln_gelu_2d_fwd, _ln_gelu_2d_bwd)


def ln_gelu(x, scale, bias, eps: float = 1e-5, impl_override: str | None = None):
    """Fused LN(last dim)+GELU. ``impl``: '' (reference), 'pallas',
    'pallas_interpret'. Any leading dims; stats over the last dim."""
    mode = impl() if impl_override is None else impl_override
    if not mode.startswith("pallas"):
        return ln_gelu_reference(x, scale, bias, eps)
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    y = _ln_gelu_2d(x2, scale, bias, eps, mode == "pallas_interpret")
    return y.reshape(shape)
