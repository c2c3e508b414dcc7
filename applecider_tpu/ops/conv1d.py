"""1-D convolutions for SpectraNet: direct (MXU) and FFT fast paths.

The reference's SpectraNet uses torch ``Conv1d`` banks with kernels up to
1021 taps (``src/applecider/default_config.toml:108-114``). Direct
convolution at those sizes costs L*K*Cin*Cout MACs (stage 2: ~10 GFLOP per
sample); the FFT path replaces the K factor with ~O(log N) via the
convolution theorem, a >30x FLOP reduction for K >= ~64, while keeping
exact 'same' cross-correlation semantics (torch Conv1d, odd K, padding
K//2).

Layout is NLC (batch, length, channels) throughout — TPU/XLA native; the
torch NCL permute dance disappears.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# Back-compat alias: the old "auto" policy was a kernel-width threshold.
# The current policy is a FLOP-cost model (see ``_fft_wins``); this value
# is still used as a hard floor below which FFT is never considered.
FFT_KERNEL_THRESHOLD = 16

# How much slower one FFT-path FLOP is than one direct-conv (MXU) FLOP.
# Platform-conditional defaults (env ACFFT_PENALTY overrides both):
#   cpu: 6.0 — reproduces the measured direct-vs-FFT winner at all 18
#        benchmarked (shape, batch) points on this image (bench_kernels.py
#        + mid-K/batch sweeps; mean |log pred/meas| = 0.41).
#   tpu: 41.05 — MEASURED on TPU v5e (scripts/tpu_decision_pass.sh,
#        2026-08-16, re-confirmed with materialization-synced timing):
#        direct (MXU) won all 6 SpectraNet stage shapes, including K=1021
#        where FFT was 3.7x faster on CPU (fft_speedup 0.11-0.69 on chip).
#        41.05 is the misroute-cost-minimizing penalty from
#        bench_kernels.py's auto-calibration; 0 rows misrouted. The penalty
#        is kept for the record, but routing on TPU is additionally
#        HARD-GATED to direct in _fft_wins: the TPU FFT conv path returns
#        numerically WRONG results at batch >= ~64 (an XLA TPU bug,
#        host-f64-oracled; fine at batch 8 and on CPU — KERNEL_NOTES).
#        Accuracy NOTE: f32 direct conv on TPU lowers to 1-pass bf16 on
#        the MXU (1.8e-3 vs host f64) — for full-f32 TPU parity use
#        jax.default_matmul_precision('highest').
# Resolved lazily so importing this module never touches the jax backend
# (a wedged TPU tunnel would hang import-time backend init).
_PENALTY_DEFAULTS = {"cpu": 6.0, "tpu": 41.05}
_penalty_cache: float | None = None


def _fft_cost_penalty() -> float:
    global _penalty_cache
    env = os.environ.get("ACFFT_PENALTY")
    if env is not None:
        return float(env)
    if _penalty_cache is None:
        try:
            backend = jax.default_backend()
        except Exception:  # backend init failure -> conservative CPU prior
            backend = "cpu"
        _penalty_cache = _PENALTY_DEFAULTS.get(backend, _PENALTY_DEFAULTS["tpu"])
    return _penalty_cache
_FFT_ACT_C = 3.0   # per-point n*log2(n) cost of activation rfft/irfft
_FFT_KER_C = 32.0  # same for the kernel rfft (cin*cout transforms). The
#                    kernel is a traced input, so its FFT re-runs every
#                    CALL — per-sample cost divides by the batch size,
#                    which is why routing is batch-aware.


import contextlib

# trace-time hint: kernels are compile-time constants (params baked into
# the executable), so their FFTs constant-fold and cost nothing per call
_FROZEN_KERNELS = False


@contextlib.contextmanager
def frozen_kernel_hint(active: bool = True):
    global _FROZEN_KERNELS
    prev = _FROZEN_KERNELS
    _FROZEN_KERNELS = bool(active)
    try:
        yield
    finally:
        _FROZEN_KERNELS = prev


def _fft_wins(L: int, K: int, cin: int, cout: int, batch: int = 64) -> bool:
    """Cost-model route choice for 'auto' mode (static at trace time).

    Per-sample costs:
    direct: 2*L*K*cin*cout MAC-FLOPs on the conv/matmul unit.
    fft:    complex pointwise batched GEMM (8 flops per (f, cin, cout))
            + rfft/irfft of activations ((cin + cout) transforms)
            + rfft of the kernel (cin*cout transforms, amortized over the
              batch),
    scaled by ``_fft_cost_penalty()`` for the platform's FFT inefficiency.
    """
    if K < FFT_KERNEL_THRESHOLD:
        return False
    # HARD CORRECTNESS GATE, not a performance heuristic: the TPU FFT conv
    # path returns garbage at batch >= ~64 (measured round 3: 86% of
    # elements wrong at (64, 3481)x K=1021, host-f64 oracle sides with
    # direct; batch 8 is numerically fine — an XLA TPU FFT bug, like the
    # block=8 s2d conv miscompile; see docs/KERNEL_NOTES.md). Timing-wise
    # direct also won every measured TPU shape, so nothing is lost.
    try:
        if jax.default_backend() == "tpu":
            return False
    except Exception:
        pass
    n = _next_fast_len(L + K - 1)
    nf = n // 2 + 1
    nlg = n * math.log2(n)
    direct = 2.0 * L * K * cin * cout
    kernel_term = (
        0.0 if _FROZEN_KERNELS
        else _FFT_KER_C * nlg * cin * cout / max(batch, 1)
    )
    fft = 8.0 * nf * cin * cout + _FFT_ACT_C * nlg * (cin + cout) + kernel_term
    return fft * _fft_cost_penalty() < direct


def conv1d_direct(x: jax.Array, kernel: jax.Array, bias: jax.Array | None = None) -> jax.Array:
    """'same' cross-correlation, odd K.

    x: (B, L, Cin); kernel: (K, Cin, Cout) -> (B, L, Cout).

    dtype note: for f32 inputs the output accumulates and stores f32.
    For bf16 inputs the output STORES bf16 (the MXU still accumulates f32
    internally per tile) — ``preferred_element_type=f32`` with bf16
    operands breaks the conv's VJP (``lax.conv_general_dilated`` rejects
    the mixed bf16-operand/f32-cotangent transpose conv that grad builds;
    ``dot_general`` tolerates mixed dtypes, conv does not), which made
    bf16 *training* through SpectraNet untraceable.
    """
    k = kernel.shape[0]
    pet = jnp.float32 if x.dtype == jnp.float32 else None
    y = lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(1,),
        padding=[(k // 2, k // 2)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=pet,
    )
    if bias is not None:
        y = y + bias
    return y


def conv1d_s2d(x: jax.Array, kernel: jax.Array, bias: jax.Array | None = None,
               block: int = 32) -> jax.Array:
    """'same' cross-correlation via space-to-depth (polyphase) decomposition.

    Rewrites the length-L, kernel-K conv as a length-L/R conv with R-fold
    richer channels (R = ``block``): x (B, L, Cin) -> (B, L/R, R*Cin),
    kernel (K, Cin, C) -> (D, R*Cin, R*C) with D ~ K/R + 2. FLOPs are
    ~identical (R*D ~ K + 2R taps), but the implied im2col matmul gets a
    contraction dim of R*Cin*D and an output dim of R*C — at SpectraNet's
    stage-0 shape (Cin=1, C=64, K=1021) that turns a (M, 1021) x (1021, 64)
    matmul into (M/8, 1032*8=8256-tap eq) x (..., 512): full 128-lane MXU
    tiles instead of half-empty ones. Measured A/B rides in
    ``bench_kernels.py``; exact equivalence with ``conv1d_direct`` is
    unit-tested.

    Derivation: y[R*m + r, o] = sum_{d,p,ci} xr[m+d, p, ci] * w2[d, p*Cin+ci, r*C+o]
    where w2 taps w at R*d + p - r + K//2 (zero outside [0, K)).

    WARNING — XLA TPU miscompile at block=8: with the resulting long
    window (D = K/8 + 2, e.g. 129 taps) over few channels at batch >= ~64,
    the TPU backend returns wrong/zero values for the last D output blocks
    (reproduced in f32 AND bf16, with both conv-attribute and explicit
    input padding; CPU and batch<=8 are exact; host-f64 oracle sides with
    conv1d_direct). block=32 (default) is verified clean at every measured
    shape and is also the fastest variant (1.63x over direct at the
    K=1021/cin=1 stage-0 shape). Exact equivalence with ``conv1d_direct``
    is unit-tested on CPU (tests/test_stream.py::test_s2d_conv_matches_direct).
    """
    B, L, Cin = x.shape
    K, _, C = kernel.shape
    R = block
    P0 = K // 2
    M = -(-L // R)  # ceil
    d_min = -((P0 + R - 1) // R)
    d_max = (K - 1 + (R - 1) - P0) // R
    D = d_max - d_min + 1

    # static tap index table (D, R, R): tap = R*(d_min+di) + p - r + P0
    di = np.arange(D)[:, None, None]
    p = np.arange(R)[None, :, None]
    r = np.arange(R)[None, None, :]
    tap = R * (d_min + di) + p - r + P0  # (D, R, R)
    valid = (tap >= 0) & (tap < K)
    tap_c = np.clip(tap, 0, K - 1)

    # w2: (D, R*Cin, R*C)
    w_taps = kernel[tap_c]  # (D, R, R, Cin, C) via leading-axis gather
    w2 = jnp.where(jnp.asarray(valid)[..., None, None], w_taps, 0)
    w2 = jnp.transpose(w2, (0, 1, 3, 2, 4)).reshape(D, R * Cin, R * C)

    xp = jnp.pad(x, ((0, 0), (0, M * R - L), (0, 0)))
    xr = xp.reshape(B, M, R * Cin)
    # pad EXPLICITLY rather than via the conv's padding attribute: XLA TPU
    # silently dropped the high-padding window contributions of this
    # (window=129, pad=(64,64), M=436) conv at batch >= ~64 — the last D
    # output blocks came back wrong/zero while CPU and small batches were
    # exact (round-3 finding, reproduced in f32 and bf16; host-f64 oracle
    # sided with conv1d_direct). Explicit jnp.pad + VALID sidesteps it.
    xr = jnp.pad(xr, ((0, 0), (-d_min, d_max), (0, 0)))
    y = lax.conv_general_dilated(
        xr, w2.astype(x.dtype),
        window_strides=(1,),
        padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        # same VJP constraint as conv1d_direct: no f32 store for bf16 operands
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    )  # (B, M, R*C)
    y = y.reshape(B, M * R, C)[:, :L]
    if bias is not None:
        y = y + bias
    return y


def _next_fast_len(n: int) -> int:
    """Smallest 5-smooth (2^a 3^b 5^c) size >= n for efficient FFT."""
    best = 1 << (n - 1).bit_length()
    p5 = 1
    while p5 < best:
        p35 = p5
        while p35 < best:
            x = p35
            while x < n:
                x *= 2
            if x < best:
                best = x
            p35 *= 3
        p5 *= 5
    return best


def conv1d_fft(
    x: jax.Array, kernel: jax.Array, bias: jax.Array | None = None,
    n: int | None = None,
) -> jax.Array:
    """'same' cross-correlation via rfft, numerically f32.

    Equivalent to ``conv1d_direct`` for odd K: linear convolution with the
    flipped kernel, sliced at offset K//2. Pass a shared ``n`` (>= L+K-1)
    when several kernels convolve the same input — identical rfft(x, n)
    calls then CSE into one input FFT per bank (SpectraNet's multi-kernel
    stages).
    """
    B, L, Cin = x.shape
    K, _, Cout = kernel.shape
    if n is None:
        n = _next_fast_len(L + K - 1)
    assert n >= L + K - 1, f"fft length {n} < L+K-1 = {L + K - 1}"
    xf = jnp.fft.rfft(x.astype(jnp.float32), n=n, axis=1)  # (B, F, Cin)
    wf = jnp.fft.rfft(kernel[::-1].astype(jnp.float32), n=n, axis=0)  # (F, Cin, Cout)
    yf = jnp.einsum("bfi,fio->bfo", xf, wf)
    y = jnp.fft.irfft(yf, n=n, axis=1)
    y = lax.dynamic_slice_in_dim(y, K // 2, L, axis=1)
    if bias is not None:
        y = y + bias
    return y


def _s2d_wins(K: int, cin: int) -> bool:
    """TPU-only auto-route to the space-to-depth conv for MXU-starved shapes.

    The polyphase rewrite wins exactly where direct conv's implied im2col
    matmul underfills the MXU's 128-lane tiles: a LONG kernel over a
    near-empty channel dim (SpectraNet stage 0: cin=1, K=1021 — measured
    1.63x over direct at block=32, docs/KERNEL_NOTES.md "Space-to-depth
    conv A/B"; K=61/cin=1 measured 0.83x, all cin>=64 shapes lose).
    Gate: K >= 512 and cin <= 2, TPU only. Env ``ACS2D``: "0" disables,
    "1" applies the shape rule on every platform (CPU equivalence tests).
    """
    env = os.environ.get("ACS2D")
    if env == "0":
        return False
    if K < 512 or cin > 2:
        return False
    if env == "1":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def conv1d(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    mode: str = "auto",
    fft_len: int | None = None,
) -> jax.Array:
    """Dispatch between direct, space-to-depth, and FFT paths.

    mode: "auto" (FLOP-cost model, see ``_fft_wins``; on TPU additionally
    ``_s2d_wins`` routes MXU-starved long-kernel/low-cin shapes through
    the polyphase rewrite), "direct" (exact parity path), "s2d", "fft".
    ``fft_len``: shared FFT length for kernel banks over one input (see
    ``conv1d_fft``).
    """
    k, cin, cout = kernel.shape
    if mode == "s2d" or (mode == "auto" and _s2d_wins(k, cin)):
        return conv1d_s2d(x, kernel, bias)
    if mode == "fft" or (
        mode == "auto" and _fft_wins(x.shape[1], k, cin, cout, batch=x.shape[0])
    ):
        if mode == "fft":
            try:
                on_tpu = jax.default_backend() == "tpu"
            except Exception:
                on_tpu = False
            if on_tpu:
                import warnings

                warnings.warn(
                    "conv_mode='fft' on TPU: the XLA TPU FFT conv path returned "
                    "numerically wrong results at batch >= ~64 in round-3 "
                    "measurements (docs/KERNEL_NOTES.md); 'auto' hard-routes "
                    "direct on TPU — override at your own risk.",
                    stacklevel=2,
                )
        return conv1d_fft(x, kernel, bias, n=fft_len)
    return conv1d_direct(x, kernel, bias)


def avg_pool1d(x: jax.Array, window: int) -> jax.Array:
    """torch AvgPool1d(window) semantics: stride=window, no padding (floor)."""
    usable = (x.shape[1] // window) * window
    x = x[:, :usable]
    summed = lax.reduce_window(
        x, 0.0, lax.add,
        window_dimensions=(1, window, 1),
        window_strides=(1, window, 1),
        padding="VALID",
    )
    return summed / window


def min_pool1d(x: jax.Array, window: int) -> jax.Array:
    """The brew_cider ``-MaxPool1d(-x)`` min-pooling trick, directly."""
    return -max_pool1d(-x, window)


def max_pool1d(x: jax.Array, window: int) -> jax.Array:
    """torch MaxPool1d(window) semantics: stride=window, no padding (floor)."""
    L = x.shape[1]
    usable = (L // window) * window
    x = x[:, :usable]
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, window, 1),
        window_strides=(1, window, 1),
        padding="VALID",
    )
