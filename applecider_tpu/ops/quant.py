"""Post-training int8 quantization for the serving path (opt-in).

TPU v5e's MXU executes int8 x int8 -> int32 at 2x its bf16 peak, so a
weight+activation int8 forward can roughly double the matmul-bound share
of serving throughput. This module implements static PTQ:

* **weights**: symmetric per-output-channel scales, quantized in-graph
  from the f32/bf16 params (XLA constant-folds them when params are baked
  in, and the per-step requant is a cheap elementwise pass otherwise);
* **activations**: symmetric per-tensor scales calibrated offline by
  running the f32 forward EAGERLY over a few representative batches and
  recording the running absmax per module path.

The hook sits inside the framework's own layer primitives
(``models/layers.Linear``, ``models/convnext.Conv2dTorch``,
``models/spectranet.Conv1dTorch``) — every dense FLOP of every model
family routes through these three — and activates only inside a
``quantized(scales)`` context (a trace-time flag: the serving pipeline
enters it in its jitted forward, so the compiled executable is fully
int8 without any Python in the hot loop).

Accuracy is workload-dependent; this is an explicitly opt-in serving
mode (``Int8 serving``), never the parity path. ``quant_error_report``
gives per-batch agreement stats vs the f32 pipeline.

No reference counterpart (the reference serves f32 torch on GPU); the
design follows standard PTQ practice (Jacob et al. 2018) mapped onto
XLA's ``preferred_element_type=int32`` dot/conv lowering.
"""

from __future__ import annotations

import threading
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

_state = threading.local()


def _ctx():
    if not hasattr(_state, "mode"):
        _state.mode = "off"
        _state.scales = None
        _state.observed = None
    return _state


class quantized:
    """Context manager: dense layers compute in int8 using ``scales``.

    ``scales`` maps module-path strings (``"/".join(module.path)``) to
    per-tensor input scales (positive floats from ``calibrate``). Layers
    whose path is missing fall back to the normal float path.
    """

    def __init__(self, scales: dict):
        self.scales = dict(scales)

    def __enter__(self):
        st = _ctx()
        self._prev = (st.mode, st.scales)
        st.mode, st.scales = "int8", self.scales
        return self

    def __exit__(self, *exc):
        st = _ctx()
        st.mode, st.scales = self._prev
        return False


class observing:
    """Context manager: record per-path input absmax into ``out`` (a dict).

    Must wrap an EAGER (unjitted) forward — under a jit trace the inputs
    are tracers and observation is skipped silently.
    """

    def __init__(self, out: dict):
        self.out = out

    def __enter__(self):
        st = _ctx()
        self._prev = (st.mode, st.observed)
        st.mode, st.observed = "observe", self.out
        return self

    def __exit__(self, *exc):
        st = _ctx()
        st.mode, st.observed = self._prev
        return False


def _path_str(path) -> str:
    return "/".join(str(p) for p in path)


def _observe(path: str, x) -> None:
    st = _ctx()
    if isinstance(x, jax.core.Tracer):
        return  # calibration must run eagerly; ignore traced calls
    m = float(jnp.max(jnp.abs(x.astype(jnp.float32))))
    prev = st.observed.get(path, 0.0)
    if np.isfinite(m) and m > prev:
        st.observed[path] = m


def _quantize_input(x, s_in: float):
    inv = 127.0 / s_in
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127.0, 127.0)
    return q.astype(jnp.int8)


def _quantize_kernel(kernel, reduce_axes: tuple[int, ...]):
    """Symmetric per-output-channel int8 kernel + f32 scale (last axis = out)."""
    k32 = kernel.astype(jnp.float32)
    s_w = jnp.max(jnp.abs(k32), axis=reduce_axes, keepdims=True) / 127.0
    s_w = jnp.maximum(s_w, 1e-12)
    qw = jnp.round(k32 / s_w).astype(jnp.int8)
    return qw, s_w.reshape(-1)  # (out,)


def quant_dense(x, kernel, bias, path, out_dtype) -> Optional[jax.Array]:
    """int8 path for ``Linear`` (kernel (in, out)); None -> caller's float path."""
    st = _ctx()
    if st.mode == "off":
        return None
    p = _path_str(path)
    if st.mode == "observe":
        _observe(p, x)
        return None
    s_in = st.scales.get(p)
    if s_in is None or not np.isfinite(s_in) or s_in <= 0.0:
        return None
    qx = _quantize_input(x, s_in)
    qw, s_w = _quantize_kernel(kernel, (0,))
    y = jax.lax.dot_general(
        qx, qw, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * ((s_in / 127.0) * s_w)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def quant_conv(x, kernel, bias, path, out_dtype, *,
               dimension_numbers, window_strides, padding,
               feature_group_count: int = 1) -> Optional[jax.Array]:
    """int8 path for conv layers (kernel ``(*spatial, cin/g, cout)``)."""
    st = _ctx()
    if st.mode == "off":
        return None
    p = _path_str(path)
    if st.mode == "observe":
        _observe(p, x)
        return None
    s_in = st.scales.get(p)
    if s_in is None or not np.isfinite(s_in) or s_in <= 0.0:
        return None
    qx = _quantize_input(x, s_in)
    qw, s_w = _quantize_kernel(kernel, tuple(range(kernel.ndim - 1)))
    y = jax.lax.conv_general_dilated(
        qx, qw, window_strides, padding,
        dimension_numbers=dimension_numbers,
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * ((s_in / 127.0) * s_w)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def calibrate(apply_fn: Callable, batches: list, percentile_headroom: float = 1.0) -> dict:
    """Run ``apply_fn(batch)`` eagerly per batch; return {path: scale}.

    ``apply_fn`` must execute the forward WITHOUT jit (eager flax apply) so
    the hook sees concrete arrays. Scales are the running absmax times
    ``percentile_headroom`` (keep 1.0 for plain absmax)."""
    observed: dict = {}
    with observing(observed):
        for b in batches:
            apply_fn(b)
    return {k: float(v) * percentile_headroom for k, v in observed.items()}


def quant_error_report(probs_f32: np.ndarray, probs_int8: np.ndarray) -> dict:
    """Agreement stats between the float and int8 serving outputs."""
    p32 = np.asarray(probs_f32, np.float64)
    p8 = np.asarray(probs_int8, np.float64)
    top1_match = float(np.mean(p32.argmax(1) == p8.argmax(1)))
    max_abs = float(np.max(np.abs(p32 - p8)))
    mean_abs = float(np.mean(np.abs(p32 - p8)))
    return {"top1_agreement": top1_match, "max_abs_prob_diff": max_abs,
            "mean_abs_prob_diff": mean_abs}
