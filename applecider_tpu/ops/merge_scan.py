"""Pallas TPU kernel for the merge's greedy group-start scan (batched).

The light-curve merge's only sequential stage is the greedy per-band
grouping recurrence (``infer/stream._all_band_group_flags_scan``): under
``vmap`` it lowers to ONE XLA while loop of P steps whose per-step work is
a tiny batched elementwise op — per-iteration loop overhead dominates.
This kernel runs the identical recurrence inside a single Pallas program
with a hardware ``fori_loop``:

* layout: time on the sublane/grid axis, batch on the 128-wide lane axis
  — every per-step op is a full-lane (3, 128) / (128,) vector;
* grid over ceil(B / 128) lane tiles; each program sweeps all P steps for
  its 128 light curves with the (3, 128) open-group state held in
  registers;
* output is ``seg_ids`` directly (the group-start position per element,
  P for invalid slots) — the flags/associative-scan pair in the XLA path
  collapses into the loop-carried ``start`` state.

On-chip validated (round 3, ``tpu_results/merge_scan_ab_r3.jsonl``):
oracle-exact at (B=256, P=192), (1024, 192), (1024, 257) and 2.2-2.6x
faster than the XLA scan path (1.0 ms vs 2.2 ms at B=256; 1.7 ms vs
4.5 ms at B=1024/P=257) — so the fused stream defaults to this kernel on
a TPU backend (``ACMERGE=xla`` reverts). Under a mesh the call routes
through a Shardy ``custom_partitioning`` rule (batch passthrough, P
replicated — no collectives), same pattern as ``ops/flash_attention``.
Because this environment has produced two real XLA TPU miscompiles
(docs/KERNEL_NOTES.md), the kernel ships with an exact-equivalence test
suite (interpret mode on CPU) and a validation-first A/B script
(``scripts/tpu_merge_scan_ab.py``) that oracles outputs on device before
timing anything. No reference counterpart (the reference's merge is a
host numba loop, ``preprocess_multimodal.py:82-111``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_BANDS = 3
_LANES = 128


def _seg_ids_kernel(t_ref, band_ref, valid_ref, out_ref, *, dt_days: float, P: int):
    lanes = t_ref.shape[1]
    band_ids = jax.lax.broadcasted_iota(jnp.int32, (N_BANDS, lanes), 0)

    def step(i, carry):
        t0, start = carry  # (3, lanes) f32 / int32
        ti = t_ref[i, :]
        bi = band_ref[i, :]
        vi = valid_ref[i, :] != 0
        is_b = (bi[None, :] == band_ids) & vi[None, :]
        new = is_b & (ti[None, :] > t0 + dt_days)
        t0 = jnp.where(new, ti[None, :], t0)
        start = jnp.where(new, i, start)
        # each valid in-band element belongs to exactly one band: select its
        # start. any(is_b) also excludes valid points whose band falls
        # outside [0, N_BANDS) — those stay unmerged (seg P), matching the
        # XLA paths.
        seg = jnp.sum(jnp.where(is_b, start, 0), axis=0)
        out_ref[i, :] = jnp.where(jnp.any(is_b, axis=0), seg, P)
        return t0, start

    init = (jnp.full((N_BANDS, lanes), -jnp.inf, jnp.float32),
            jnp.zeros((N_BANDS, lanes), jnp.int32))
    jax.lax.fori_loop(0, P, step, init)


@functools.partial(jax.jit, static_argnames=("dt_days", "interpret"))
def seg_ids_pallas(t_sorted: jax.Array, band: jax.Array, valid: jax.Array,
                   dt_days: float = 0.5, interpret: bool = False) -> jax.Array:
    """Batched greedy group-start ids.

    t_sorted (B, P) f32: per-sample time-ascending, +inf at invalid slots;
    band (B, P) int32 in [0, 3); valid (B, P) bool. Returns (B, P) int32
    ``seg_ids`` — identical to the XLA scan path's
    ``where(valid, latest_start_of_own_band, P)``.

    With more than one device visible the call routes through a Shardy
    ``custom_partitioning`` rule (batch passthrough, P replicated) so the
    kernel batch-shards under a mesh — same pattern as
    ``ops/flash_attention``; the single-device program is untouched.
    """
    if jax.device_count() > 1:
        return _sharded_seg_ids(float(dt_days), bool(interpret))(
            t_sorted, band, valid)
    return _seg_ids_impl(t_sorted, band, valid, dt_days, interpret)


def _seg_ids_impl(t_sorted, band, valid, dt_days: float, interpret: bool):
    B, P = t_sorted.shape
    Bp = -(-B // _LANES) * _LANES
    if Bp != B:
        t_sorted = jnp.pad(t_sorted, ((0, Bp - B), (0, 0)), constant_values=jnp.inf)
        band = jnp.pad(band, ((0, Bp - B), (0, 0)))
        valid = jnp.pad(valid, ((0, Bp - B), (0, 0)))
    # lanes = batch, sublanes/steps = time
    t_t = t_sorted.T.astype(jnp.float32)          # (P, Bp)
    band_t = band.T.astype(jnp.int32)
    valid_t = valid.T.astype(jnp.int32)           # bool refs are awkward; 0/1
    grid = Bp // _LANES
    out = pl.pallas_call(
        functools.partial(_seg_ids_kernel, dt_days=float(dt_days), P=P),
        out_shape=jax.ShapeDtypeStruct((P, Bp), jnp.int32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((P, _LANES), lambda i: (0, i)),
            pl.BlockSpec((P, _LANES), lambda i: (0, i)),
            pl.BlockSpec((P, _LANES), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((P, _LANES), lambda i: (0, i)),
        interpret=interpret,
    )(t_t, band_t, valid_t)
    return out.T[:B]


@functools.lru_cache(maxsize=None)
def _sharded_seg_ids(dt_days: float, interpret: bool):
    """Shardy custom_partitioning wrapper: batch dim passthrough, P
    replicated — each device sweeps the recurrence over its local batch
    shard with no collectives.  The per-shard lane padding happens inside
    ``_seg_ids_impl`` on local shapes."""
    from jax.experimental.custom_partitioning import custom_partitioning

    @custom_partitioning
    def call(t_sorted, band, valid):
        return _seg_ids_impl(t_sorted, band, valid, dt_days, interpret)

    def infer(mesh, arg_shapes, shape):
        return arg_shapes[0].sharding

    def partition(mesh, arg_shapes, result_shape):
        arg_shardings = jax.tree.map(lambda a: a.sharding, tuple(arg_shapes))
        out_sharding = result_shape.sharding

        def lower_fn(t_sorted, band, valid):
            return _seg_ids_impl(t_sorted, band, valid, dt_days, interpret)

        return mesh, lower_fn, out_sharding, arg_shardings

    call.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b p, b p, b p -> b p",
        need_replication_factors=("p",),
    )
    return call


def seg_ids_scan_reference(t_sorted, band, valid, dt_days: float = 0.5):
    """Batched XLA oracle: exactly the fused-scan path of merge_light_curve."""
    from applecider_tpu.infer.stream import _all_band_group_flags_scan

    def one(t, b, v):
        P = t.shape[0]
        in_band = (b >= 0) & (b < N_BANDS)
        flags3 = _all_band_group_flags_scan(t, b, v, dt_days)
        positions = jnp.arange(P, dtype=jnp.int32)
        latest3 = jax.lax.associative_scan(
            jnp.maximum, jnp.where(flags3, positions[:, None], -1), axis=0
        )
        latest = jnp.take_along_axis(
            latest3, b.astype(jnp.int32).clip(0, N_BANDS - 1)[:, None], axis=1
        )[:, 0]
        return jnp.where(v & in_band, latest, P)

    return jax.vmap(one)(t_sorted, band, valid)
