"""Device-compiled alert-stream inference pipeline.

The BASELINE north star: >= 10k ZTF alerts/sec/chip *end-to-end* —
preprocessing plus 4-modality fusion inference. The reference preprocesses
per alert in Python/pandas/numba (SURVEY call stack 3.1); here the entire
tensor path after raw-file decode compiles to one XLA program over
fixed-shape batches:

* greedy 12-hour per-band light-curve merge — group starts found by an
  O(log P)-depth pointer-doubling chain expansion (scan oracle kept for
  testing) + ``segment_sum`` weighted collapse (numerically identical to
  the reference's numba loop, batched over (sample, band) on device);
* event featurization: dt/dt_prev/logflux/one-hot (the model's (P, 7)
  layout — colors live in the training-corpus event_data, not here) + the
  causal context block at the alert cut;
* spectra: linear interpolation with extrapolation onto the 3481-bin grid
  + (x-mean)/MAD normalization (sort-based median on device);
* fusion forward (bf16 matmuls on the MXU).

Host keeps only raw-file decode (FITS stamps + candidate floats) — see
``pack_alert_batch`` for the fixed-shape packing contract.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# plain float: a module-level jnp expression would initialize the jax
# backend at import time (and hang if the TPU tunnel is wedged)
LOG_CONST = float(1.0 / np.log(10.0))
N_BANDS = 3


# ---------------------------------------------------------------- merge
def _band_group_flags_scan(t: jax.Array, is_band: jax.Array, dt_days: float) -> jax.Array:
    """Greedy window starts for one band over a time-sorted sequence.

    Reference semantics (O(P) sequential scan); kept as the oracle for the
    pointer-doubling implementation below."""

    def step(t0, x):
        ti, active = x
        new_group = active & (ti > t0 + dt_days)
        t0 = jnp.where(new_group, ti, t0)
        return t0, new_group

    _, flags = jax.lax.scan(step, -jnp.inf, (t, is_band))
    return flags


def _all_band_group_flags_scan(t: jax.Array, band: jax.Array, valid: jax.Array,
                               dt_days: float) -> jax.Array:
    """Greedy window starts for ALL bands in one fused scan -> (P, N_BANDS).

    One P-step scan carrying the (N_BANDS,) open-group start times instead
    of N_BANDS independent scans: the merge's TPU cost is dominated by
    sequential scan steps (each step is a tiny batched elementwise op), so
    fusing the bands cuts the sequential depth 3x. Per-band columns are
    exactly ``_band_group_flags_scan(t, valid & (band == b), dt)``."""

    def step(t0, x):
        ti, bi, vi = x
        is_b = (bi == jnp.arange(N_BANDS)) & vi
        new_group = is_b & (ti > t0 + dt_days)
        t0 = jnp.where(new_group, ti, t0)
        return t0, new_group

    _, flags = jax.lax.scan(
        step, jnp.full((N_BANDS,), -jnp.inf, t.dtype), (t, band, valid)
    )
    return flags


def _band_group_flags(t: jax.Array, is_band: jax.Array, dt_days: float) -> jax.Array:
    """Greedy window starts via pointer doubling — O(log P) depth.

    Precondition: ``t`` ascending with invalid slots as +inf at the tail
    (the ``pack_alert_batch`` layout) — searchsorted relies on it.

    The greedy chain is: s0 = first in-band point; s_{k+1} = first in-band
    point with t > t[s_k] + dt. ``next(i)`` is computed for every i at once
    (searchsorted + next-in-band table), then the chain's orbit is expanded
    with log2(P) jump-doubling rounds instead of a P-step scan. Exactly
    equivalent to ``_band_group_flags_scan`` (tested); ~30x fewer sequential
    steps at P=257, which matters for single-alert latency on TPU.
    """
    P = t.shape[0]
    sentinel = P  # chain end
    rng = jnp.arange(P)
    # first j with t[j] > t[i] + dt (t is sorted; invalid slots are +inf)
    k = jnp.searchsorted(t, t + dt_days, side="right")  # values in [0, P]
    # next in-band index >= p, via reverse running-min over band positions
    idx = jnp.where(is_band, rng, sentinel)
    nxt_in_band = jax.lax.associative_scan(jnp.minimum, idx, reverse=True)
    nxt_in_band_ext = jnp.concatenate([nxt_in_band, jnp.full((1,), sentinel)])
    # jump table f(i) = next group start after start i; f(sentinel) = sentinel
    jump = jnp.concatenate([nxt_in_band_ext[k], jnp.full((1,), sentinel)])

    # orbit of f from the first in-band point, by list doubling:
    # after round r, pos[0:2^r] = f^0..f^{2^r-1}(s0) and jump = f^{2^r}
    pos = jnp.full((P,), sentinel).at[0].set(nxt_in_band[0])
    m = 1
    while m < P:
        mapped = jump[pos]  # f^m of every current chain node
        pos = jnp.where((rng >= m) & (rng < 2 * m), jnp.roll(mapped, m), pos)
        jump = jump[jump]  # f^{2m}; fixed point at the sentinel
        m *= 2
    return jnp.zeros((P,), bool).at[pos].set(True, mode="drop")  # pos==P drops


def _rank_compact(key: jax.Array) -> jax.Array:
    """Stable ascending rank of every element — sort-free, gather-free.

    ``rank[i] = #{j : key[j] < key[i]} + #{j < i : key[j] == key[i]}`` is
    exactly the position ``jnp.argsort(key)`` (stable) would give element
    i. O(N^2) compares on the VPU beat an O(N log N) vmapped argsort on
    TPU for the merge's N = P+1 (a few hundred): no dynamic gathers, one
    dense boolean reduction.
    """
    n = key.shape[0]
    idx = jnp.arange(n)
    lt = key[None, :] < key[:, None]              # (i, j): key[j] < key[i]
    eq = (key[None, :] == key[:, None]) & (idx[None, :] < idx[:, None])
    return jnp.sum(lt | eq, axis=-1).astype(jnp.int32)


def merge_light_curve(t, flux, err, band, valid, dt_days: float = 0.5, eps: float = 1e-8,
                      assume_sorted: bool = False, flags_impl: str = "auto",
                      compact_impl: str = "auto", seg_ids=None):
    """One sample: (P,) arrays -> merged (P,) arrays + valid mask.

    Returns (t_m, f_m, e_m, band_m, valid_m) sorted by merged time, padded
    with +inf times / zero flux. ``assume_sorted=True`` skips the input
    reorder when the caller guarantees time-ascending valid-prefix layout
    (``pack_alert_batch`` does).

    ``flags_impl``: "doubling" (O(log P) pointer doubling — wins for
    single-sample latency), "scan" (O(P) lax.scan — wins under vmap on TPU,
    where the doubling variant's per-row dynamic gathers dominated the
    whole serving pipeline: 35 ms of a 45 ms batch-256 step), or "auto"
    (scan on TPU, doubling elsewhere). ``compact_impl``: "argsort",
    "rank" (O(P^2) compare-matrix stable rank + scatter — gather/sort-free),
    or "auto" (rank on TPU). All variants are exactly equivalent (tested).
    """
    P = t.shape[0]
    if flags_impl == "auto" or compact_impl == "auto":
        on_tpu = jax.default_backend() not in ("cpu",)
        if flags_impl == "auto":
            flags_impl = "scan" if on_tpu else "doubling"
        if compact_impl == "auto":
            # round-3 late A/B after the stacked-scatter change
            # (tpu_results/compact_ab_r3.jsonl): argsort+single-gather now
            # ties-or-beats rank+scatter at every benched shape on TPU
            # (2.0 vs 2.2 ms at B=256/P=192, 5.7 vs 6.4 at B=1024/P=192),
            # so argsort is the auto choice everywhere
            compact_impl = "argsort"
    if not assume_sorted:
        # order by time with invalid at the tail (the reference's host merge
        # sorts by time first; this also discharges the pointer-doubling
        # helper's sortedness precondition for any valid-mask layout)
        order = jnp.argsort(jnp.where(valid, t, jnp.inf))
        t, flux, err = t[order], flux[order], err[order]
        band, valid = band[order], valid[order]
    t_sorted = jnp.where(valid, t, jnp.inf)

    # segment id = position of the group's START point (unique across bands,
    # since every point belongs to one band): a P+1 segment space instead of
    # 3P+1 — 3x smaller segment_sum and compaction sort, identical numerics
    positions = jnp.arange(P, dtype=jnp.int32)
    if seg_ids is not None:
        # precomputed (e.g. the batched Pallas scan kernel,
        # ops/merge_scan.seg_ids_pallas); requires assume_sorted layout
        pass
    elif flags_impl == "scan":
        # one fused P-step scan + one (P, 3) associative scan for all bands.
        # in_band guards valid points whose band falls outside [0, N_BANDS):
        # they must stay unmerged (seg P) like in the per-band doubling path
        # (a raw take_along_axis would clamp them into band N_BANDS-1)
        in_band = (band >= 0) & (band < N_BANDS)
        flags3 = _all_band_group_flags_scan(t_sorted, band, valid, dt_days)
        marker3 = jnp.where(flags3, positions[:, None], -1)
        latest3 = jax.lax.associative_scan(jnp.maximum, marker3, axis=0)
        latest_by_band = jnp.take_along_axis(
            latest3, band.astype(jnp.int32).clip(0, N_BANDS - 1)[:, None], axis=1
        )[:, 0]
        seg_ids = jnp.where(valid & in_band, latest_by_band, P)
    else:
        seg_ids = jnp.full((P,), P, dtype=jnp.int32)  # overflow for invalid
        for b in range(N_BANDS):
            is_b = valid & (band == b)
            flags = _band_group_flags(t_sorted, is_b, dt_days)
            marker = jnp.where(flags, positions, -1)
            latest_start = jax.lax.associative_scan(jnp.maximum, marker)
            seg_ids = jnp.where(is_b, latest_start, seg_ids)

    w = jnp.where(valid, 1.0 / (err + eps), 0.0)
    num_segments = P + 1
    # ONE stacked segment_sum instead of five: XLA does not fuse sibling
    # scatters, and scatter setup cost dominates at these sizes — a (P, 5)
    # payload pays it once (identical numerics, columns are independent)
    payload = jnp.stack(
        [w, valid.astype(jnp.float32), w * t, w * flux, w * err], axis=1
    )
    segs = jax.ops.segment_sum(payload, seg_ids, num_segments=num_segments)
    wsum, cnt = segs[:, 0], segs[:, 1]
    safe = jnp.maximum(wsum, eps)
    t_m = segs[:, 2] / safe
    f_m = segs[:, 3] / safe
    e_m = segs[:, 4] / safe
    seg_valid = (cnt > 0) & (jnp.arange(num_segments) < P)  # drop overflow
    # the segment's band is the band of its start point
    seg_band = jnp.concatenate([band.astype(jnp.int32), jnp.zeros(1, jnp.int32)])

    # compact: sort segments by time (invalid -> +inf), keep first P
    key = jnp.where(seg_valid, t_m, jnp.inf)
    # stack the five outputs as f32 columns so the compaction pays ONE
    # scatter/gather instead of five (band values in [0, 3] and the 0/1
    # valid flag are exact in f32 — cast back after)
    cols = jnp.stack(
        [t_m, f_m, e_m,
         seg_band.astype(jnp.float32), seg_valid.astype(jnp.float32)],
        axis=1,
    )
    if compact_impl == "rank":
        # ranks are a permutation of [0, P]; scattering with unique target
        # slots fills every output row exactly once (rank == P drops)
        rank = _rank_compact(key)
        picked = jnp.zeros((P, 5), cols.dtype).at[rank].set(cols, mode="drop")
    else:
        picked = cols[jnp.argsort(key)[:P]]
    return (
        picked[:, 0], picked[:, 1], picked[:, 2],
        picked[:, 3].astype(jnp.int32), picked[:, 4].astype(bool),
    )


# --------------------------------------------------------- featurization
def featurize_events(t_m, f_m, e_m, band_m, valid_m, horizon=None):
    """Merged light curve -> (P, 7) model features + pad mask + context(10,).

    Feature layout matches the training path (photo_dataset):
    [log1p dt, log1p dt_prev, logflux, logflux_err, one-hot band(3)].
    Context block matches ``preprocessing.events.CTX_COLUMNS``.

    ``horizon`` (days, default None = keep all): the training datasets drop
    merged events more than ``horizon`` days after first detection
    (fusion_dataset.py ``dt <= self.horizon``, photo_dataset
    ``build_photo_features``) and the normalization stats are computed on
    the cut features — so serving must cut identically or long-baseline
    objects (AGN/CV with years of photometry) feed the transformer dt
    values training never produced. Merged events are time-ascending, so
    the cut is a suffix mask: exactly equivalent to the training row-drop
    because padded rows are fully masked through attention (unit-tested).
    The CONTEXT block intentionally stays uncut: training context features
    are causal prefix scans over the full kept history with no horizon
    (preprocessing/events.py), and metadata24 picks them at the alert row.
    """
    P = t_m.shape[0]
    t0 = jnp.min(jnp.where(valid_m, t_m, jnp.inf))
    t_safe = jnp.where(valid_m, t_m, 0.0)
    if horizon is not None:
        keep_m = valid_m & (t_m - t0 <= horizon)
    else:
        keep_m = valid_m
    dt = jnp.where(keep_m, t_m - t0, 0.0)
    prev_t = jnp.concatenate([jnp.full((1,), t0), t_safe[:-1]])
    dt_prev = jnp.where(keep_m, t_safe - prev_t, 0.0)
    f = jnp.clip(f_m, 1e-6, None)
    logf = jnp.where(keep_m, jnp.log10(f), 0.0)
    logfe = jnp.where(keep_m, e_m * LOG_CONST / f, 0.0)
    one_hot = jax.nn.one_hot(band_m, N_BANDS) * keep_m[:, None]
    feats = jnp.concatenate(
        [
            jnp.stack([jnp.log1p(dt), jnp.log1p(dt_prev), logf, logfe], axis=1),
            one_hot,
        ],
        axis=1,
    )

    # context at the cut (all valid events)
    mag = -2.5 * jnp.log10(jnp.clip(f_m, 1e-12, None))
    neg_inf_flux = jnp.where(valid_m, f_m, -jnp.inf)
    peak_i = jnp.argmax(neg_inf_flux)
    last_jd = jnp.max(jnp.where(valid_m, t_m, -jnp.inf))
    first_jd = t0
    days_since = last_jd - t_m[peak_i]
    days_to = t_m[peak_i] - first_jd
    peakmag = jnp.min(jnp.where(valid_m, mag, jnp.inf))
    maxmag = jnp.max(jnp.where(valid_m, mag, -jnp.inf))
    ratio = jnp.where(peakmag != 0, maxmag / peakmag, jnp.nan)
    counts = jnp.stack([jnp.sum(valid_m & (band_m == b)) for b in range(N_BANDS)])
    ctx = jnp.concatenate(
        [
            jnp.stack([days_since, days_to, days_since + days_to, peakmag, maxmag, ratio]),
            jnp.asarray([counts.sum()], jnp.float32),
            counts.astype(jnp.float32),
        ]
    )
    ctx = jnp.where(jnp.isfinite(ctx), ctx, -999.0)
    return feats, ~keep_m, ctx


# -------------------------------------------------------------- spectra
def _median_no_sort(x, passes: int = 4, bins: int = 128):
    """Median of a 1-D array via histogram rank selection — no sort.

    RETIRED from the hot path (round 3, late): measured at the compact
    spectra block shape (129, 3481) this loses ~9x to ``_median_exact``
    (lax.top_k) on BOTH TPU v5e (13.7 vs 1.5 ms) and the 1-core CPU image
    (772 vs 95 ms), and its clamp-convergence guarantee is not airtight —
    0.029 absolute error measured on a 3481-length N(0,100) row with one
    1e30 outlier (tpu_results/median_ab_r3.jsonl). Kept as the loop-free
    evidence/reference implementation; see its unit tests.

    On TPU a 3481-length sort is ~log^2(n) bitonic passes, and sequential
    while-loop steps cost ~0.4 ms each at batch 256 (overhead, not
    bandwidth — measured). A binary value-bisection needs 48 such steps;
    this radix-style selection needs only ``passes`` (default 4): each
    pass histograms the in-interval elements into ``bins`` uniform buckets
    (a one-shot broadcast compare + reduction — embarrassingly parallel on
    the VPU), locates the bucket holding each central rank via cumsum, and
    narrows the interval to the ACTUAL data min/max inside that bucket.
    The data clamp is what makes convergence outlier-immune: a raw
    bucket-width interval shrinks only as range/bins^p, so one 1e30 spike
    would leave the median wrong by range/2^28 after 4 passes (a real
    round-3 review catch); clamping to the in-bucket data range makes each
    pass's interval track the surviving candidates, which collapses to the
    exact element values after a few passes for any outlier structure.
    The two central ranks ride as a leading length-2 axis. Exactness vs
    ``jnp.median`` is unit-tested (duplicates, scales, sizes, and
    single-huge-outlier regressions).
    """
    n = x.shape[-1]
    ks = jnp.asarray([[(n - 1) // 2], [n // 2]], jnp.int32)  # central ranks, (2,1)
    xmin, xmax = jnp.min(x), jnp.max(x)
    lo = jnp.broadcast_to(xmin, (2,))
    # widen the top so every element strictly falls inside pass 1's buckets
    hi = jnp.broadcast_to(xmax + 1e-6 * (xmax - xmin) + 1e-30, (2,))
    arange_bins = jnp.arange(bins, dtype=jnp.int32)
    for _ in range(passes):
        w = jnp.maximum((hi - lo) / bins, 1e-38)
        u_raw = jnp.floor((x[None, :] - lo[:, None]) / w[:, None])  # (2, n)
        below = jnp.sum((u_raw < 0).astype(jnp.int8), axis=-1, dtype=jnp.int32)
        uc = jnp.clip(u_raw, 0, bins - 1).astype(jnp.int32)
        # elements past the top edge (float-rounding stragglers in later
        # passes) are absorbed into the last bucket so a rank is always hit.
        # int8 one-hot: the (2, n, bins) intermediate is the pass's HBM
        # traffic — 4x cheaper than f32 (counts fit int32 exactly)
        onehot = (uc[:, :, None] == arange_bins) & (u_raw >= 0)[:, :, None]
        hist = jnp.sum(onehot.astype(jnp.int8), axis=1, dtype=jnp.int32)  # (2, bins)
        c = below[:, None] + jnp.cumsum(hist, axis=-1)  # counts <= bucket top
        b = jnp.argmax(c >= ks + 1, axis=-1)  # first covering bucket
        lo2 = lo + b.astype(lo.dtype) * w
        hi2 = lo2 + w
        # clamp to the in-bucket data range (outlier immunity, see docstring)
        inb = (x[None, :] >= lo2[:, None]) & (x[None, :] <= hi2[:, None])
        dlo = jnp.min(jnp.where(inb, x[None, :], jnp.inf), axis=-1)
        dhi = jnp.max(jnp.where(inb, x[None, :], -jnp.inf), axis=-1)
        lo = jnp.where(jnp.isfinite(dlo), jnp.maximum(lo2, dlo), lo2)
        hi = jnp.where(jnp.isfinite(dhi), jnp.minimum(hi2, dhi), hi2)
    return 0.5 * (0.5 * (lo[0] + hi[0]) + 0.5 * (lo[1] + hi[1]))


def _resample_spectrum_reference(wl, flux, valid, grid):
    """Sort/searchsorted/gather reference implementation (oracle).

    Kept for exact-equivalence tests and as the fallback for non-uniform
    grids. On TPU the argsort + searchsorted + 4 dynamic (G,)-gathers
    measured 176 ms at batch 256 — 2x the whole fusion forward — which is
    why the production path is ``resample_spectrum`` below.
    """
    big = 1e30
    wl_s = jnp.where(valid, wl, big)
    order = jnp.argsort(wl_s)
    x = wl_s[order]
    y = flux[order]
    n = jnp.maximum(jnp.sum(valid), 2)

    idx = jnp.clip(jnp.searchsorted(x, grid), 1, n - 1)
    x0, x1 = x[idx - 1], x[idx]
    y0, y1 = y[idx - 1], y[idx]
    slope = (y1 - y0) / jnp.maximum(x1 - x0, 1e-12)
    out = y0 + slope * (grid - x0)  # interior + right-extrapolation via last segment

    # explicit boundary extrapolation (matches host path semantics)
    s_left = (y[1] - y[0]) / jnp.maximum(x[1] - x[0], 1e-12)
    out = jnp.where(grid < x[0], y[0] + s_left * (grid - x[0]), out)
    xl, xl1 = x[n - 1], x[n - 2]
    yl, yl1 = y[n - 1], y[n - 2]
    s_right = (yl - yl1) / jnp.maximum(xl - xl1, 1e-12)
    out = jnp.where(grid > xl, yl + s_right * (grid - xl), out)
    return _mad_normalize(out)


def _median_exact(x):
    """Exact median over the last axis via ``lax.top_k``.

    Keep the top ``n//2 + 1`` values; their smallest one (odd n) or two
    (even n) are exactly the central order statistics. Measured A/B at the
    compact-spectra-block shape (129, 3481), tpu_results/median_ab_r3.jsonl:
    top_k 1.5 ms vs the histogram rank selection's 13.7 ms on TPU v5e, and
    95 ms vs 772 ms on the 1-core CPU image — top_k wins ~9x on BOTH
    platforms, and it is exact by construction (the histogram's data-range
    clamp measurably missed by 0.029 on a 3481-length row with a 1e30
    outlier: 4 passes x 128 bins cannot always collapse the interval).
    """
    n = x.shape[-1]
    k = n // 2 + 1
    top = jax.lax.top_k(x, k)[0]
    if n % 2:
        return top[..., -1]
    return 0.5 * (top[..., -1] + top[..., -2])


def _mad_normalize(out):
    mean = jnp.mean(out)
    med = _median_exact(out)
    mad = _median_exact(jnp.abs(out - med))
    std = jnp.std(out)
    scale = jnp.where(mad > 0, mad, jnp.where(std > 0, std, 1.0))
    return (out - mean) / scale


def _interp_fill(x, y, valid, grid, gnp):
    """Sort-free / search-free / gather-free linear interp onto a UNIFORM grid.

    TPU-native formulation: because the target grid is uniform, the bin of
    every sample point is closed-form arithmetic (one multiply + floor,
    corrected to exact ``searchsorted(grid, x, side='right') - 1``
    semantics with two tiny gathers from the constant grid). Each grid
    point's bracketing samples then come from two associative-scan fills:

      x0[g] = largest sample x <  grid[g]  == forward  "last valid" fill
              over bins <= g-1 (every point in bin b satisfies
              grid[b] <= x < grid[b+1], so bin <= g-1 <=> x < grid[g]);
      x1[g] = smallest sample x >= grid[g] == backward "first valid" fill
              over bins >= g.

    Only the last point of each bin is scattered for the forward fill and
    only the first for the backward fill (duplicate-free scatters), which
    makes both fills EXACTLY the reference's ``x[idx-1]``/``x[idx]``
    selections — equivalence is unit-tested. Cost: O(S) arithmetic, two
    (S,)->(G+1,) scatters, two log2(G)-pass scans; measured ~50x faster
    than the reference path at batch 256 on TPU v5e.
    """
    S = x.shape[0]
    G = grid.shape[0]
    g0 = float(gnp[0])
    inv_dg = float((G - 1) / (gnp[-1] - gnp[0]))
    neg, pos = jnp.float32(-jnp.inf), jnp.float32(jnp.inf)
    gridp = jnp.concatenate([jnp.full((1,), neg), grid, jnp.full((1,), pos)])  # (G+2,)

    # exact searchsorted-right bin: largest b with grid[b] <= x, in [-1, G-1]
    xc = jnp.clip(x, g0 - 1.0 / inv_dg, float(gnp[-1]) + 1.0 / inv_dg)
    b = jnp.clip(jnp.floor((xc - g0) * inv_dg).astype(jnp.int32), -1, G - 1)
    b = b + (gridp[b + 2] <= x)   # float-rounding correction, +/-1 at most
    b = b - ((gridp[b + 1] > x) & (b >= 0))

    # last-of-bin (forward fill) / first-of-bin (backward fill) selectors
    nxt_b = jnp.concatenate([b[1:], jnp.full((1,), -2, b.dtype)])
    nxt_v = jnp.concatenate([valid[1:], jnp.zeros((1,), bool)])
    is_last = valid & ((b != nxt_b) | ~nxt_v)
    prv_b = jnp.concatenate([jnp.full((1,), -2, b.dtype), b[:-1]])
    prv_v = jnp.concatenate([jnp.zeros((1,), bool), valid[:-1]])
    is_first = valid & ((b != prv_b) | ~prv_v)

    slots = b + 1  # [0, G]; scatter into G+1 slots, drop at G+1
    # NOTE: these three sibling scatters were A/B'd STACKED as a (G+1, 3)
    # row scatter (the merge-tail win) and measured SLOWER here (8.5 ->
    # 11.5 ms at 129 rows, two passes) — the 3-wide rows pad the 128-lane
    # tile on a 3482-long axis. Keep them scalar.
    def scatter(sel):
        tgt = jnp.where(sel, slots, G + 1)
        sx = jnp.zeros((G + 1,), x.dtype).at[tgt].set(x, mode="drop")
        sy = jnp.zeros((G + 1,), y.dtype).at[tgt].set(y, mode="drop")
        sh = jnp.zeros((G + 1,), bool).at[tgt].set(sel, mode="drop")
        return sx, sy, sh

    def last_valid(a, c):  # rightmost-valid semigroup (associative)
        ax, ay, ah = a
        cx, cy, ch = c
        return jnp.where(ch, cx, ax), jnp.where(ch, cy, ay), ah | ch

    fx, fy, fh = jax.lax.associative_scan(last_valid, scatter(is_last))
    x0, y0, h0 = fx[:G], fy[:G], fh[:G]  # slot g covers bins <= g-1

    # reverse=True flips, scans, flips back — so "nearest valid at/after g"
    # is the SAME rightmost-valid combiner applied to the flipped array
    bx, by, bh = jax.lax.associative_scan(last_valid, scatter(is_first), reverse=True)
    x1, y1, h1 = bx[1:], by[1:], bh[1:]  # slot g+1 covers bins >= g

    slope = (y1 - y0) / jnp.maximum(x1 - x0, 1e-12)
    out = y0 + slope * (grid - x0)

    # boundary extrapolation from the first/last data segments (reference
    # semantics: h0 false <=> grid[g] <= x_first; h1 false <=> grid[g] > x_last)
    n = jnp.maximum(jnp.sum(valid), 2)
    xa, xb_, ya, yb = x[0], x[1], y[0], y[1]
    s_left = (yb - ya) / jnp.maximum(xb_ - xa, 1e-12)
    out = jnp.where(~h0, ya + s_left * (grid - xa), out)
    xl, xl1 = x[n - 1], x[n - 2]
    yl, yl1 = y[n - 1], y[n - 2]
    s_right = (yl - yl1) / jnp.maximum(xl - xl1, 1e-12)
    out = jnp.where(~h1, yl + s_right * (grid - xl), out)
    return out


def resample_spectrum(wl, flux, valid, grid, assume_sorted: bool = False):
    """Linear interp with boundary extrapolation + (x-mean)/MAD normalize.

    ``assume_sorted``: the valid entries form an ascending-wavelength
    prefix (``pack_alert_batch``'s layout) — skips the device argsort.
    Uniform grids (every in-repo grid is a linspace) take the scatter+fill
    fast path (``_interp_fill``); non-uniform or traced grids fall back to
    the sort/search reference path.
    """
    gnp = None
    if not isinstance(grid, jax.core.Tracer):
        gnp = np.asarray(grid)
        G = gnp.shape[0]
        if G >= 2:
            dg = (float(gnp[-1]) - float(gnp[0])) / (G - 1)
            # closed-form binning + the +/-1 correction step is exact as
            # long as every grid point sits within half a bin of the ideal
            # uniform lattice (f32 linspace rounding is ~1e-3 bins)
            ideal = float(gnp[0]) + np.arange(G) * dg
            if dg <= 0 or float(np.max(np.abs(gnp - ideal))) > 0.45 * dg:
                gnp = None
        else:
            gnp = None
    if gnp is None:
        return _resample_spectrum_reference(wl, flux, valid, grid)

    big = 1e30
    x = jnp.where(valid, wl, big)
    y = jnp.where(valid, flux, 0.0)
    v = valid
    if not assume_sorted:
        order = jnp.argsort(x)
        x, y = x[order], y[order]
        v = x < big / 2
    out = _interp_fill(x, y, v, grid, gnp)
    return _mad_normalize(out)


# ------------------------------------------------------------- pipeline
def _resolve_acmerge(mesh, raw=None) -> str:
    """Which merge group-start implementation the fused stream uses.

    ``ACMERGE`` env wins when set ("xla", "pallas", "pallas_interpret").
    Unset: the Pallas kernel (ops/merge_scan.py) is the default on a
    TPU backend — on-chip A/B measured it 2.2-3.6x faster
    than the XLA scan, oracle-exact (tpu_results/merge_scan_ab_r3.jsonl).
    Under a mesh the kernel batch-shards via its Shardy
    ``custom_partitioning`` rule (ops/merge_scan._sharded_seg_ids), so
    the same default applies. ``raw`` (the forward's input tree, when
    available) guards the eager-on-CPU case inside a TPU process — int8
    calibration runs the unjitted forward on CPU-placed arrays under
    ``jax.default_device(cpu)``, where ``jax.default_backend()`` still
    says "tpu" but a Pallas TPU kernel cannot execute.
    """
    acmerge = os.environ.get("ACMERGE", "")
    if acmerge:
        return acmerge
    try:
        for leaf in jax.tree.leaves(raw):
            devices = getattr(leaf, "devices", None)
            if callable(devices):  # concrete jax.Array (not a tracer/numpy)
                if any(d.platform == "cpu" for d in leaf.devices()):
                    return ""
                break
        return "pallas" if jax.default_backend() == "tpu" else ""
    except Exception:  # backend probe must never kill the trace
        return ""


class AlertStreamPipeline:
    """Fused preprocess+inference graph over fixed-shape alert batches.

    ``__call__(params, raw)`` with raw = dict of:
      photo_t/photo_flux/photo_err (B,P), photo_band (B,P) int, photo_valid (B,P) bool
      image (B,63,63,3), meta19 (B,19)  [ALERT_META_KEEP[:19], ra/dec pre-scaled]
      spec_wl/spec_flux (B,S), spec_valid (B,S) bool, has_spectrum (B,) bool
    Returns (B, num_classes) probabilities.
    """

    def __init__(self, task, stats_mean=None, stats_std=None, dt_hours: float = 12.0,
                 wave_grid: Optional[np.ndarray] = None, mesh=None,
                 freeze_params_with=None, skip_spectra: bool = False,
                 compact_spectra: bool = False, quantize_scales: Optional[dict] = None,
                 horizon_days: Optional[float] = 100.0):
        """``mesh``: optional ``jax.sharding.Mesh`` — the raw batch shards
        dim-0 over the ``data`` axis (params replicated), so one pipeline
        call fans out over every chip of a pod slice.

        ``freeze_params_with``: optional params pytree baked into the
        compiled executable as constants. XLA then constant-folds
        param-only subgraphs — and the conv auto-router assumes free
        kernel transforms (FFT viable even at batch 1). Trade-off: the
        weights are embedded in every compiled executable (~140MB per
        shape for the full fusion model), so compiles/cache entries are
        large and XLA may decline to fold the biggest kernel FFTs (size
        caps). Use for latency-critical single-shape serving; prefer the
        default arg-passing mode everywhere else. Recompiles on new
        weights."""
        self.task = task
        self.mean = jnp.asarray(
            stats_mean if stats_mean is not None else np.zeros(4, np.float32)
        )
        self.std = jnp.asarray(
            stats_std if stats_std is not None else np.ones(4, np.float32)
        )
        self.dt_days = dt_hours / 24.0
        # Horizon cut to match the training datasets (default 100 days,
        # `data_set.*.horizon`); None disables. See featurize_events.
        self.horizon_days = None if horizon_days is None else float(horizon_days)
        if wave_grid is None:
            wave_grid = np.linspace(4500.0, 7980.0, 3481, dtype=np.float32)
        self.grid = jnp.asarray(wave_grid)
        self.mesh = mesh
        # skip_spectra: this pipeline serves batches whose samples ALL lack
        # spectra. The spectra branch runs ONCE on a zero spectrum (every
        # SpectraNet op is per-sample, so the row value is identical to a
        # full zero batch — the module broadcasts the (1, h) embedding) and
        # the resample/MAD preprocess is skipped entirely. Exactness vs the
        # full pipeline on zero-spectrum batches is unit-tested.
        self.skip_spectra = bool(skip_spectra)
        # compact_spectra: the raw batch carries a compact (S+1, max_spec)
        # spectra block (row 0 = zero spectrum) + spec_has (S+1,) +
        # spec_gather (B,) instead of per-sample (B, max_spec) spectra.
        # SpectraNet runs at S+1 and the embeddings gather back to B inside
        # the fusion module (FusedSpectraStream packs this layout).
        self.compact_spectra = bool(compact_spectra)
        if self.compact_spectra and self.skip_spectra:
            raise ValueError("compact_spectra and skip_spectra are mutually exclusive")
        # compact_spectra + mesh: batch-dim tensors shard over the data
        # axis; the compact (S+1, W) spectra block + spec_has REPLICATE
        # (every shard's gather indexes the full block — SpectraNet runs
        # the small block redundantly per chip, which beats all-gathering
        # its embeddings at these sizes). spec_gather (B,) shards with
        # the batch. See _compact_shardings.
        self._placed_params = None
        self._placed_src = None
        # frozen BN running stats (e.g. imported tri-pool fusion) snapshot
        # at construction; they are jit-trace constants
        self._batch_stats = getattr(task, "batch_stats", None)
        # opt-in int8 PTQ serving (ops/quant.py): scales from .calibrate()
        self._quant_scales = dict(quantize_scales) if quantize_scales else None
        self._frozen = freeze_params_with is not None
        if self._frozen and mesh is not None:
            raise ValueError("freeze_params_with and mesh are mutually exclusive")
        if self._frozen:
            frozen = jax.tree.map(jnp.asarray, freeze_params_with)
            self._jitted = jax.jit(lambda raw: self._forward(frozen, raw))
        else:
            self._jitted = jax.jit(self._forward)

    def _forward(self, params, raw):
        from applecider_tpu.ops.conv1d import frozen_kernel_hint

        with frozen_kernel_hint(self._frozen):
            if self._quant_scales is not None:
                from applecider_tpu.ops.quant import quantized

                # trace-time context: the jitted executable is int8 end to end
                with quantized(self._quant_scales):
                    return self._forward_body(params, raw)
            return self._forward_body(params, raw)

    def calibrate(self, params, raws: list, percentile_headroom: float = 1.0) -> dict:
        """Observe per-layer input ranges on representative packed batches.

        Runs the UNJITTED forward under an observation context; returns the
        {module-path: scale} dict that ``quantize_scales`` consumes. Use a
        few small batches — eager execution is slow but happens once."""
        from applecider_tpu.ops.quant import calibrate as _calibrate

        return _calibrate(lambda raw: self._forward(params, raw), raws,
                          percentile_headroom=percentile_headroom)

    def _forward_body(self, params, raw):
        # Merge group-start scan dispatch. The Pallas kernel
        # (ops/merge_scan.py) replaces the P-step XLA while-loop-under-vmap
        # with one batched program; on-chip A/B (tpu_results/
        # merge_scan_ab_r3.jsonl) measured 1.0 ms vs 2.2 ms (B=256, P=192)
        # and 1.7 ms vs 4.5 ms (B=1024, P=257), oracle-exact — so it is the
        # DEFAULT on a TPU backend. ACMERGE=xla forces the scan path;
        # ACMERGE=pallas forces the kernel anywhere (ACMERGE=pallas_interpret
        # runs the kernel interpreter for CPU tests). Under a mesh the kernel
        # batch-shards via its Shardy custom_partitioning rule
        # (ops/merge_scan._sharded_seg_ids), so the default holds there too.
        acmerge = _resolve_acmerge(self.mesh, raw)
        if acmerge.startswith("pallas"):
            from applecider_tpu.ops.merge_scan import seg_ids_pallas

            t_sorted_b = jnp.where(raw["photo_valid"], raw["photo_t"], jnp.inf)
            seg_b = seg_ids_pallas(
                t_sorted_b, raw["photo_band"], raw["photo_valid"],
                dt_days=self.dt_days, interpret=acmerge == "pallas_interpret",
            )
            merge = jax.vmap(
                lambda t_, f_, e_, b_, v_, s_: merge_light_curve(
                    t_, f_, e_, b_, v_, dt_days=self.dt_days,
                    assume_sorted=True, seg_ids=s_,
                )
            )
            t_m, f_m, e_m, band_m, valid_m = merge(
                raw["photo_t"], raw["photo_flux"], raw["photo_err"],
                raw["photo_band"], raw["photo_valid"], seg_b,
            )
        else:
            merge = jax.vmap(
                partial(merge_light_curve, dt_days=self.dt_days, assume_sorted=True)
            )
            t_m, f_m, e_m, band_m, valid_m = merge(
                raw["photo_t"], raw["photo_flux"], raw["photo_err"],
                raw["photo_band"], raw["photo_valid"],
            )
        feats, pad_mask, ctx = jax.vmap(
            partial(featurize_events, horizon=self.horizon_days)
        )(t_m, f_m, e_m, band_m, valid_m)
        cont = (feats[..., :4] - self.mean) / (self.std + 1e-8)
        photometry = jnp.concatenate([cont, feats[..., 4:]], axis=-1)

        # 24-col metadata: 19 alert columns + 5 context features
        ctx5 = ctx[:, [0, 1, 3, 4, 6]]
        metadata = jnp.concatenate([raw["meta19"], ctx5], axis=1)

        extra = {}
        if self.skip_spectra:
            spectra = jnp.zeros((1, self.grid.shape[0]), jnp.float32)
        elif self.compact_spectra:
            spectra = jax.vmap(
                partial(resample_spectrum, grid=self.grid, assume_sorted=True)
            )(raw["spec_wl"], raw["spec_flux"], raw["spec_valid"])
            spectra = jnp.where(raw["spec_has"][:, None], spectra, 0.0)
            extra["spec_gather"] = raw["spec_gather"]
        else:
            spectra = jax.vmap(
                partial(resample_spectrum, grid=self.grid, assume_sorted=True)
            )(raw["spec_wl"], raw["spec_flux"], raw["spec_valid"])
            spectra = jnp.where(raw["has_spectrum"][:, None], spectra, 0.0)

        variables = {"params": params}
        if self._batch_stats:
            variables["batch_stats"] = self._batch_stats
        logits = self.task.module.apply(
            variables,
            photometry, pad_mask, metadata, raw["image"], spectra,
            deterministic=True, **extra,
        )
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    def __call__(self, params, raw=None):
        if raw is None:  # one-arg convenience: __call__(raw)
            params, raw = None, params
        if self._frozen:
            if params is not None:
                raise ValueError(
                    "this pipeline was built with freeze_params_with=...; "
                    "weights are baked in — call pipe(raw) without params"
                )
            return self._jitted(raw)
        if params is None:
            raise TypeError("params required: call pipe(params, raw)")
        if self.mesh is not None:
            from applecider_tpu.parallel.mesh import replicate, shard_batch

            if self.compact_spectra:
                raw = self._shard_compact(raw)
            else:
                raw = shard_batch(raw, self.mesh)
            if self._placed_src is not params:  # cache keyed on object identity
                self._placed_params = replicate(params, self.mesh)
                self._placed_src = params
            params = self._placed_params
        return self._jitted(params, raw)

    _COMPACT_REPLICATED = ("spec_wl", "spec_flux", "spec_valid", "spec_has")

    def _shard_compact(self, raw: dict) -> dict:
        """Per-key shardings for the compact-spectra layout (see __init__)."""
        import jax as _jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from applecider_tpu.parallel.mesh import batch_sharding

        out = {}
        for k, v in raw.items():
            if k in self._COMPACT_REPLICATED:
                out[k] = _jax.device_put(v, NamedSharding(self.mesh, P()))
            else:
                # v.ndim, not np.asarray(v).ndim: placed jax Arrays must not
                # round-trip through the host on every dispatch
                out[k] = _jax.device_put(v, batch_sharding(self.mesh, v.ndim))
        return out


def decimate_spectrum(wl: np.ndarray, flux: np.ndarray, max_points: int):
    """Bin-average an overlong raw spectrum down to ``max_points`` segments.

    Equal-count segment means preserve the FULL wavelength range (real
    instrument exports run to thousands of samples; a ``[:max_points]``
    truncation would keep only the bluest stub and let the on-device
    resample extrapolate garbage across most of the grid). No-op for
    spectra that already fit."""
    n = len(wl)
    if n <= max_points:
        return wl, flux
    wl = np.asarray(wl, np.float64)
    flux = np.asarray(flux, np.float64)
    if np.any(np.diff(wl) < 0):
        # segment means are only meaningful over wavelength-adjacent
        # samples; the packing contract allows unsorted spectra (the
        # lexsort downstream used to absorb them), so sort here first
        order = np.argsort(wl, kind="stable")
        wl, flux = wl[order], flux[order]
    edges = np.linspace(0, n, max_points + 1).astype(np.int64)
    counts = np.diff(edges)
    wl_d = np.add.reduceat(wl, edges[:-1]) / counts
    fx_d = np.add.reduceat(flux, edges[:-1]) / counts
    return wl_d.astype(np.float32), fx_d.astype(np.float32)


def _fitted_spectra(samples: list[dict], idx: list[int], W: int):
    """Per-sample (wl, flux) arrays fitted to width W (decimated if longer)."""
    out = []
    for i in idx:
        out.append(decimate_spectrum(
            np.asarray(samples[i]["spec_wl"], np.float32),
            np.asarray(samples[i]["spec_flux"], np.float32), W,
        ))
    return out


def pack_alert_batch(
    samples: list[dict], max_photo: int = 257, max_spec: int = 512,
    length_buckets: Optional[tuple[int, ...]] = None,
    image_dtype=np.float32,
) -> dict:
    """Host-side packing of ragged raw per-alert dicts into fixed shapes.

    Each sample dict: photometry arrays (t/flux/err/band), image (63,63,3),
    meta19 (19,), optional spectrum (wl, flux).

    ``length_buckets``: optional ascending photometry-length buckets (e.g.
    ``(64, 128, 257)``). The batch packs to the smallest bucket covering its
    longest light curve — jit caches one pipeline per bucket, and short
    batches skip most of the transformer's L^2 work. Results are identical
    to ``max_photo`` packing (padding is masked).

    ``image_dtype``: dtype for the packed cutout stack. Images are 86% of
    the batch's H2D bytes; when the model computes in bfloat16 anyway,
    packing them as ``ml_dtypes.bfloat16`` halves the transfer with no
    effect on the compute path (the encoder's first op casts to bf16).
    bf16 keeps f32's exponent range — raw ZTF counts (up to ~1e5) cannot
    overflow, unlike float16.
    """
    B = len(samples)
    if length_buckets and samples:  # empty batch: any bucket works for (0, P)
        need = min(max(len(s["photo_t"]) for s in samples), max_photo)
        usable = [b for b in sorted(length_buckets) if b <= max_photo]
        max_photo = next((b for b in usable if b >= need), max_photo)
    img_shape = np.asarray(samples[0]["image"]).shape if samples else (63, 63, 3)
    out = {
        "photo_t": np.zeros((B, max_photo), np.float32),
        "photo_flux": np.zeros((B, max_photo), np.float32),
        "photo_err": np.ones((B, max_photo), np.float32),
        "photo_band": np.zeros((B, max_photo), np.int32),
        "photo_valid": np.zeros((B, max_photo), bool),
        "meta19": np.empty((B, 19), np.float32),
        "spec_wl": np.zeros((B, max_spec), np.float32),
        "spec_flux": np.zeros((B, max_spec), np.float32),
        "spec_valid": np.zeros((B, max_spec), bool),
        "has_spectrum": np.zeros((B,), bool),
    }
    if not samples:
        out["image"] = np.zeros((0, *img_shape), image_dtype)
        return out

    # ---- photometry: flat-concat -> one lexsort -> one scatter per column.
    # The per-sample argsort loop this replaces measured ~3.9k alerts/s on
    # this host (below the 10k north star on its own); bulk numpy ops over
    # the concatenated stream keep the Python cost O(B) tiny-list appends
    # instead of O(B) array round-trips.
    lens = np.fromiter((len(s["photo_t"]) for s in samples), np.int64, count=B)
    t_all = np.concatenate([np.asarray(s["photo_t"], np.float32) for s in samples])
    sid = np.repeat(np.arange(B, dtype=np.int64), lens)
    # detect the common case — per-sample times already ascending (survey
    # light curves arrive time-ordered) — with one O(N) diff; the lexsort
    # it skips is ~200x its cost (17.6 ms vs 0.09 ms at B=1024 on this
    # host) and was ~22% of the whole pack. NaN times compare False and
    # fall back to the sort.
    if t_all.shape[0] > 1:
        asc = np.diff(t_all) >= 0
        bnd = np.cumsum(lens)[:-1] - 1  # cross-sample comparisons exempt
        # clip both ends: a leading empty sample gives bnd=-1, a TRAILING
        # empty sample gives bnd=N-1 == len(asc) (IndexError before this)
        asc[bnd[(bnd >= 0) & (bnd < asc.shape[0])]] = True
        presorted = bool(asc.all())
    else:
        presorted = True
    if presorted:
        order = None
    else:
        # stable sort by (sample, time): groups stay contiguous, times ascend
        order = np.lexsort((t_all, sid))
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    col = np.arange(t_all.shape[0], dtype=np.int64) - np.repeat(starts, lens)
    keep = col < max_photo  # truncate overlong light curves (keep earliest)
    rows, cols = sid[keep], col[keep]
    src = np.flatnonzero(keep) if order is None else order[keep]
    out["photo_t"][rows, cols] = t_all[src]
    f_all = np.concatenate([np.asarray(s["photo_flux"], np.float32) for s in samples])
    e_all = np.concatenate([np.asarray(s["photo_err"], np.float32) for s in samples])
    b_all = np.concatenate([np.asarray(s["photo_band"], np.int32) for s in samples])
    out["photo_flux"][rows, cols] = f_all[src]
    out["photo_err"][rows, cols] = e_all[src]
    out["photo_band"][rows, cols] = b_all[src]
    out["photo_valid"][rows, cols] = True

    # ---- dense per-sample tensors. Preallocate the target-dtype image
    # stack and assign row-by-row: each assignment converts f32->bf16
    # in C during the copy, skipping stack()'s full-size f32 intermediate
    # plus a second astype pass (2.1x on this host at B=1024: 30.7 ms ->
    # 14.6 ms; images are ~95% of pack bytes).
    img = np.empty((B, *img_shape), image_dtype)
    for i, s in enumerate(samples):
        img[i] = s["image"]
    out["image"] = img
    out["meta19"] = np.stack([s["meta19"] for s in samples]).astype(np.float32, copy=False)

    # ---- spectra (sparse: only samples that carry one)
    spec_idx = [i for i, s in enumerate(samples)
                if s.get("spec_wl") is not None and len(s.get("spec_wl", ())) >= 2]
    if spec_idx:
        fitted = _fitted_spectra(samples, spec_idx, max_spec)
        slens = np.fromiter((len(w) for w, _ in fitted), np.int64, count=len(fitted))
        wl_all = np.concatenate([w for w, _ in fitted])
        fx_all = np.concatenate([f for _, f in fitted])
        srows = np.repeat(np.asarray(spec_idx, np.int64), slens)
        sstarts = np.concatenate([[0], np.cumsum(slens)[:-1]])
        scols = np.arange(wl_all.shape[0], dtype=np.int64) - np.repeat(sstarts, slens)
        # ascending-wavelength prefix per sample: one stable lexsort of the
        # concatenated stream lets the device skip its argsort
        # (resample_spectrum assume_sorted=True). Instrument spectra are
        # usually already ascending, making this a near-free passthrough.
        sorder = np.lexsort((wl_all, srows))
        out["spec_wl"][srows, scols] = wl_all[sorder]
        out["spec_flux"][srows, scols] = fx_all[sorder]
        out["spec_valid"][srows, scols] = True
        out["has_spectrum"][np.asarray(spec_idx)] = True
    return out


def _has_spectrum(s: dict) -> bool:
    wl = s.get("spec_wl")
    return wl is not None and len(wl) >= 2


class RoutedAlertStream:
    """Spectrum-presence router over two compiled pipelines.

    In a live alert stream only a minority of alerts carry a spectrum
    (BTS-scale streams: ~10-30%), yet the monolithic pipeline runs
    SpectraNet — 61% of the fusion forward's wall time on TPU v5e — on a
    zero vector for every spectrum-less alert. Because every SpectraNet op
    is per-sample, a zero spectrum yields one constant embedding, so
    splitting the batch is EXACTLY equivalent (unit-tested):

      with-spectrum    -> full pipeline (resample + SpectraNet + fusion)
      without-spectrum -> skip_spectra pipeline (no resample/MAD, one
                          batch-1 zero-spectrum SpectraNet, broadcast)

    Sub-batches pad up to ``batch_buckets`` (jit caches one executable per
    bucket); padding rows replicate the first sample and are sliced off.
    Results return in input order. Both sub-batches dispatch before either
    synchronizes, so the two executables queue back-to-back on the device.
    """

    def __init__(self, task, batch_buckets=(8, 32, 64, 96, 128, 192, 256, 384, 512),
                 **pipeline_kw):
        self.full = AlertStreamPipeline(task, **pipeline_kw)
        self.nospec = AlertStreamPipeline(task, skip_spectra=True, **pipeline_kw)
        self.batch_buckets = tuple(sorted(batch_buckets))

    def _bucket(self, n: int) -> int:
        for b in self.batch_buckets:
            if b >= n:
                return b
        return n

    def submit(self, params, samples: list[dict], length_buckets=None,
               image_dtype=np.float32):
        """Pack + async-place + dispatch both sub-batches WITHOUT
        synchronizing.

        Returns a zero-arg callable that materializes the (N, C) host
        array. Pipelining pattern (a production feeder, and bench.py):
        submit(batch i+1) while batch i executes, then resolve batch i —
        the host-device roundtrip hides behind the next batch's compute.
        """
        return self.run_placed(
            params,
            self.place(samples, length_buckets=length_buckets, image_dtype=image_dtype),
        )

    def __call__(self, params, samples: list[dict], length_buckets=None,
                 image_dtype=np.float32) -> np.ndarray:
        return self.submit(params, samples, length_buckets=length_buckets,
                           image_dtype=image_dtype)()

    def place(self, samples: list[dict], length_buckets=None,
              image_dtype=np.float32, device=None):
        """Pack + split + device_put WITHOUT dispatching.

        Returns an opaque placed-batch object for ``run_placed``. Use to
        separate the host/H2D plane from device execution — e.g. a feeder
        thread placing batch i+1 while the device runs batch i, or a
        device-residency benchmark.
        """
        import jax

        placed = []
        for pred, max_spec in ((True, 512), (False, 1)):
            idx = [i for i, s in enumerate(samples) if _has_spectrum(s) == pred]
            if not idx:
                placed.append((None, idx))
                continue
            subset = [samples[i] for i in idx]
            # pack the REAL subset, then tile the first packed row out to
            # the bucket — padding must not multiply the host packing work
            # (a single alert padded to bucket 8 would otherwise pay 8x
            # the concat+lexsort; padding rows are sliced off at resolve)
            raw = pack_alert_batch(
                subset, max_spec=max_spec,
                length_buckets=length_buckets, image_dtype=image_dtype,
            )
            pad = self._bucket(len(subset)) - len(subset)
            if pad:
                raw = {k: np.concatenate([v, np.repeat(v[:1], pad, axis=0)])
                       for k, v in raw.items()}
            raw = {k: (jax.device_put(v, device) if device is not None
                       else jax.device_put(v)) for k, v in raw.items()}
            placed.append((raw, idx))
        return (len(samples), placed)

    def run_placed(self, params, placed):
        """Dispatch both sub-batches of a ``place()``d batch; returns a
        zero-arg resolver like ``submit``."""
        n, parts = placed
        outs = []
        for pipe, (raw, idx) in zip((self.full, self.nospec), parts):
            outs.append(None if raw is None else pipe(params, raw))

        def resolve() -> np.ndarray:
            probs = None
            for out, (_, idx) in zip(outs, parts):
                if out is None:
                    continue
                arr = np.asarray(out)
                if probs is None:
                    probs = np.empty((n, arr.shape[-1]), arr.dtype)
                probs[np.asarray(idx)] = arr[: len(idx)]
            if probs is None:  # empty samples list -> empty result, not None
                ncls = int(getattr(self.full.task.module, "num_classes", 0))
                probs = np.zeros((0, ncls), np.float32)
            return probs

        return resolve


class FusedSpectraStream:
    """Single-program spectrum-presence routing via a compact spectra block.

    ``RoutedAlertStream`` splits each batch and runs TWO full pipelines —
    which duplicates the photometry transformer and the image/metadata
    towers across sub-batches, pays two D2H roundtrips, and runs SpectraNet
    on an underfilled minority bucket at realistic spectrum fractions
    (measured: the frac-0.1 device-routed rate is 4.1k alerts/s where a
    FLOP extrapolation predicts 6-8k; `tpu_results/spectrum_frac_r3.jsonl`).

    This variant keeps ONE jitted program per (batch, photometry-bucket,
    spectra-bucket) shape:

      * the shared encoders (photometry / image / metadata) run on the FULL
        batch — no duplication, full MXU occupancy;
      * SpectraNet + the spectra resample run on a compact ``(S+1, W)``
        block holding only the spectra that exist (row 0 is the zero
        spectrum, S buckets over ``spec_buckets``);
      * the ``(S+1, h)`` spectra embeddings gather back to ``(B, h)`` with
        a precomputed index map (0 for spectrum-less rows) inside the
        fusion module (``AppleCiderModule.__call__ spec_gather``) — every
        SpectraNet op is per-sample, so outputs are EXACTLY the monolithic
        pipeline's (unit-tested: mixed / all / none, padding rows).

    Same feeder API as ``RoutedAlertStream``: ``submit`` / ``place`` +
    ``run_placed`` / ``__call__``.
    """

    def __init__(self, task,
                 spec_buckets=(0, 4, 8, 16, 32, 64, 96, 112, 128, 192, 256,
                               320, 384, 512),
                 max_spec: int = 512, **pipeline_kw):
        self.pipe = AlertStreamPipeline(task, compact_spectra=True, **pipeline_kw)
        self.spec_buckets = tuple(sorted(spec_buckets))
        self.max_spec = int(max_spec)

    def _bucket(self, n: int) -> int:
        for b in self.spec_buckets:
            if b >= n:
                return b
        return n

    def place(self, samples: list[dict], length_buckets=None,
              image_dtype=np.float32, device=None, pad_to=None,
              host_only: bool = False):
        """Pack the full batch + compact spectra block + gather map, then
        device_put WITHOUT dispatching.

        ``pad_to``: pad the PACKED batch-dim rows out to this size with
        copies of row 0 (callers slice the pad off the output). Padding
        packed rows — not the input sample list — keeps the host packing
        and compact-spectra work proportional to the REAL samples
        (LengthBinnedFeeder.flush on a 1-sample queue would otherwise pay
        the full flush_bs pack).

        ``host_only``: return the packed numpy dict WITHOUT device_put —
        for worker processes that must never touch the JAX backend
        (OverlappedServingFeeder's process mode); pass the result to
        ``place_packed`` on the main process."""
        import jax

        # full-batch pack at max_spec=1: the per-sample spectra columns are
        # replaced by the compact block below, so don't pay their packing
        raw = pack_alert_batch(samples, max_spec=1,
                               length_buckets=length_buckets,
                               image_dtype=image_dtype)
        for k in ("spec_wl", "spec_flux", "spec_valid", "has_spectrum"):
            del raw[k]

        B = len(samples)
        W = self.max_spec
        spec_idx = [i for i, s in enumerate(samples) if _has_spectrum(s)]
        S = self._bucket(len(spec_idx))
        wl = np.zeros((S + 1, W), np.float32)
        fx = np.zeros((S + 1, W), np.float32)
        vd = np.zeros((S + 1, W), bool)
        has = np.zeros((S + 1,), bool)
        gather = np.zeros((B,), np.int32)
        if spec_idx:
            # same flat-concat + one-lexsort packing as pack_alert_batch
            # (overlong spectra decimated, not truncated): the device skips
            # its argsort (assume_sorted contract)
            fitted = _fitted_spectra(samples, spec_idx, W)
            slens = np.fromiter((len(w) for w, _ in fitted), np.int64, count=len(fitted))
            wl_all = np.concatenate([w for w, _ in fitted])
            fx_all = np.concatenate([f for _, f in fitted])
            srows = np.repeat(1 + np.arange(len(spec_idx), dtype=np.int64), slens)
            sstarts = np.concatenate([[0], np.cumsum(slens)[:-1]])
            scols = np.arange(wl_all.shape[0], dtype=np.int64) - np.repeat(sstarts, slens)
            sorder = np.lexsort((wl_all, srows))
            wl[srows, scols] = wl_all[sorder]
            fx[srows, scols] = fx_all[sorder]
            vd[srows, scols] = True
            has[1:len(spec_idx) + 1] = True
            gather[np.asarray(spec_idx)] = 1 + np.arange(len(spec_idx), dtype=np.int32)
        raw.update(spec_wl=wl, spec_flux=fx, spec_valid=vd,
                   spec_has=has, spec_gather=gather)
        if pad_to is not None and B and pad_to > B:
            # tile batch-dim tensors only; the compact spectra block
            # (rows S+1) and spec_has are batch-independent
            raw = {k: (np.concatenate([v, np.repeat(v[:1], pad_to - B, axis=0)])
                       if v.shape and v.shape[0] == B else v)
                   for k, v in raw.items()}
        if host_only:
            return raw
        return self.place_packed(raw, device=device)

    def place_packed(self, raw: dict, device=None):
        """device_put a ``place(..., host_only=True)`` packed dict."""
        import jax

        if self.pipe.mesh is not None and device is None:
            return self.pipe._shard_compact(raw)
        put = (lambda v: jax.device_put(v, device)) if device is not None \
            else jax.device_put
        return {k: put(v) for k, v in raw.items()}

    def run_placed(self, params, placed):
        """Dispatch a ``place()``d batch; returns a zero-arg resolver."""
        out = self.pipe(params, placed)
        return lambda: np.asarray(out)

    def submit(self, params, samples: list[dict], length_buckets=None,
               image_dtype=np.float32):
        return self.run_placed(
            params,
            self.place(samples, length_buckets=length_buckets,
                       image_dtype=image_dtype),
        )

    def __call__(self, params, samples: list[dict], length_buckets=None,
                 image_dtype=np.float32) -> np.ndarray:
        return self.submit(params, samples, length_buckets=length_buckets,
                           image_dtype=image_dtype)()


class LengthBinnedFeeder:
    """Per-length-bucket batch accumulation over a stream router.

    Every sample in a batch pads to the batch's longest light curve, so a
    mixed live stream runs essentially ALL its batches at the top length
    bucket. Binning alerts by light-curve length into homogeneous batches
    lets each batch run at its own bucket's compiled pipeline — measured
    fused rates at B=1024 / spectrum_frac 0.1 on TPU v5e
    (tpu_results/length_bins_r3.jsonl): 24.2k alerts/s at bucket 64,
    16.8k at 128, 14.7k at 192, a ~1.2x blended win over mixed batching
    for the bench's P ~ U(20, 180) mix (larger for real ZTF streams,
    which skew toward short early-alert light curves). Outputs are
    EXACTLY those of the underlying router — binning only reorders which
    batch a sample rides in, and padding is masked (unit-tested).

    Usage::

        feeder = LengthBinnedFeeder(FusedSpectraStream(task), params,
                                    flush_bs=1024, length_buckets=BUCKETS)
        for idx, sample in enumerate(stream):
            for indices, resolver in feeder.submit([(idx, sample)]):
                probs = resolver()          # (len(indices), C) in `indices` order
        for indices, resolver in feeder.flush():
            probs = resolver()

    ``submit`` returns zero or more ``(indices, resolver)`` pairs as
    bucket queues fill; the caller may defer calling resolvers to keep
    multiple batches in flight (depth-pipelining). ``flush`` drains
    partial queues, padding each to ``flush_bs`` with copies of its first
    sample (the pad rows are sliced off before returning).
    """

    def __init__(self, router, params, flush_bs: int = 1024,
                 length_buckets: tuple = (63, 127, 191, 255, 257),
                 image_dtype=np.float32, max_photo: int = 257):
        self.router = router
        self.params = params
        self.flush_bs = int(flush_bs)
        self.length_buckets = tuple(sorted(length_buckets))
        self.image_dtype = image_dtype
        self.max_photo = int(max_photo)
        self._queues: dict[int, list] = {b: [] for b in self.length_buckets}

    def _bucket_of(self, sample: dict) -> int:
        n = min(len(sample["photo_t"]), self.max_photo)
        for b in self.length_buckets:
            if b >= n:
                return b
        return self.length_buckets[-1]

    def _emit(self, bucket: int, pad: bool = False):
        entries = self._queues[bucket]
        self._queues[bucket] = []
        indices = [i for i, _ in entries]
        samples = [s for _, s in entries]
        n_real = len(samples)
        place_kw = {"length_buckets": (bucket,), "image_dtype": self.image_dtype}
        if pad and n_real < self.flush_bs:
            import inspect

            if "pad_to" in inspect.signature(self.router.place).parameters:
                # pad PACKED rows (host pack stays O(n_real), see place)
                place_kw["pad_to"] = self.flush_bs
            else:  # router pads internally (RoutedAlertStream batch buckets)
                samples = samples + [samples[0]] * (self.flush_bs - n_real)
        placed = self.router.place(samples, **place_kw)
        inner = self.router.run_placed(self.params, placed)

        def resolver(inner=inner, n_real=n_real):
            return inner()[:n_real]

        return indices, resolver

    def submit(self, indexed_samples) -> list:
        """Enqueue ``(index, sample)`` pairs; returns ready batches."""
        ready = []
        for idx, s in indexed_samples:
            b = self._bucket_of(s)
            self._queues[b].append((idx, s))
            if len(self._queues[b]) >= self.flush_bs:
                ready.append(self._emit(b))
        return ready

    def flush(self) -> list:
        """Emit every non-empty partial queue (padded to ``flush_bs``)."""
        return [self._emit(b, pad=True)
                for b in self.length_buckets if self._queues[b]]
