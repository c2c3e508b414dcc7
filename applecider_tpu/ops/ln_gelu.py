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
(``gelu_exact``; in-kernel via the A&S 7.1.26 rational erf — exact at f32
working precision, Mosaic has no erf primitive). Exactness vs the unfused
ops is unit-tested in interpret mode (tests/test_ln_gelu.py).

**MEASURED AND REJECTED (round 5)** — the on-chip b256 train-step A/B
(scripts/tpu_ln_gelu_ab.py, tpu_results/ln_gelu_ab_r5.jsonl): 147.2 ms
fused vs 108.0 ms XLA, both reps. XLA schedules the LN/GELU HBM passes
UNDER the adjacent conv MXU work; hoisting them into a standalone Pallas
kernel serializes that overlap and costs ~39 ms. Consistent with the r3
bf16-LN tie. This closes the SpectraNet-LN ledger row (KERNEL_NOTES
§Round-4 row 1): the train step is at its structural envelope on v5e.
The kernel stays available behind ``ACLNGELU=pallas`` as evidence; the
default path is byte-identical to the pre-swap model.
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
def _erf_approx(x):
    """Abramowitz & Stegun 7.1.26 rational erf — max abs error 1.5e-7
    (f32 eps is 1.2e-7, so this is exact at f32 working precision).
    Mosaic has no erf primitive (lowering raises NotImplementedError), so
    the kernel carries its own; the OUT-of-kernel reference keeps
    ``jax.lax.erf`` and the unit tests bound the difference."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _fwd_kernel(x_ref, s_ref, b_ref, y_ref, *, eps: float):
    xf = x_ref[...].astype(jnp.float32)  # (RB, C)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    z = (xf - mean) * inv * s_ref[...].astype(jnp.float32) + \
        b_ref[...].astype(jnp.float32)
    y = 0.5 * z * (1.0 + _erf_approx(z / _SQRT2))
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
    dgelu = 0.5 * (1.0 + _erf_approx(z / _SQRT2)) + \
        z * _INV_SQRT_2PI * jnp.exp(-0.5 * z * z)
    dz = gf * dgelu
    c = xf.shape[-1]
    # partial blocks are (8, C): Mosaic requires the second-to-last block
    # dim divisible by 8 — row 0 carries the partial, rows 1-7 are zero
    # and vanish in the outside sum
    zeros7 = jnp.zeros((7, c), jnp.float32)
    ds_ref[...] = jnp.concatenate(
        [jnp.sum(dz * xhat, axis=0, keepdims=True), zeros7], axis=0)
    db_ref[...] = jnp.concatenate(
        [jnp.sum(dz, axis=0, keepdims=True), zeros7], axis=0)
    dxhat = dz * s
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ref[...] = (inv * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)


def _pick_rb(n_rows: int, c: int) -> int:
    """Row-block size: keep the (RB, C) f32 tile plus temporaries in VMEM."""
    budget = 2 * 1024 * 1024 // max(c * 4, 1)  # ~2 MB for x per pass
    rb = max(8, min(1024, budget) // 8 * 8)  # Mosaic: row blocks % 8 == 0
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
            jax.ShapeDtypeStruct((grid * 8, c), jnp.float32),
            jax.ShapeDtypeStruct((grid * 8, c), jnp.float32),
        ),
        grid=(grid,),
        in_specs=[_rows_spec(rb, c), _vec_spec(c), _vec_spec(c),
                  _rows_spec(rb, c)],
        out_specs=(
            _rows_spec(rb, c),
            pl.BlockSpec((8, c), lambda i: (i, 0)),
            pl.BlockSpec((8, c), lambda i: (i, 0)),
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
