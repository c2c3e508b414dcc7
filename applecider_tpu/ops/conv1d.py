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
#        2026-08-16): direct (MXU) won all 6 SpectraNet stage shapes,
#        including K=1021 where FFT was 3.7x faster on CPU (fft_speedup
#        0.11-0.69 on chip). 41.05 is the misroute-cost-minimizing penalty
#        from bench_kernels.py's auto-calibration; 0 rows misrouted. The
#        TPU FFT is additionally far less accurate at K=1021 (rel_err 0.34
#        vs ~2e-3 at K<=251 — the chip's FFT twiddle precision degrades at
#        n=4500), so direct is the right call on both axes.
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
    """
    k = kernel.shape[0]
    y = lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(1,),
        padding=[(k // 2, k // 2)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )
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


def conv1d(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    mode: str = "auto",
    fft_len: int | None = None,
) -> jax.Array:
    """Dispatch between direct and FFT paths.

    mode: "auto" (FLOP-cost model, see ``_fft_wins``), "direct" (exact
    parity path), "fft". ``fft_len``: shared FFT length for kernel banks
    over one input (see ``conv1d_fft``).
    """
    k, cin, cout = kernel.shape
    if mode == "fft" or (
        mode == "auto" and _fft_wins(x.shape[1], k, cin, cout, batch=x.shape[0])
    ):
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
