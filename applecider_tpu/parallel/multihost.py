"""Multi-host (multi-process) SPMD hooks.

The reference is strictly single-GPU (SURVEY §2.3); this build is
single-host SPMD by default, but a TPU pod slice beyond one host (e.g.
v5e-16: 4 hosts x 4 chips) needs ``jax.distributed.initialize`` before any
backend touch plus a per-host input pipeline. These hooks make that a
configuration change, not a rewrite:

``[parallel.multihost]`` in the run TOML::

    [parallel.multihost]
    enable = true                     # default false
    coordinator_address = "10.0.0.1:8476"   # optional; JAX env autodetect when unset
    num_processes = 4                 # optional with TPU autodetection
    process_id = 0                    # optional with TPU autodetection

On TPU pods JAX autodetects all three when launched via the standard pod
runtime, so ``enable = true`` alone usually suffices. The Trainer then:

* builds its mesh over ``jax.devices()`` (GLOBAL devices);
* strides the ``DataLoader`` by process (``num_shards=process_count()``,
  ``shard_index=process_index()``) — every host truncates to the common
  shard length, so all processes run the SAME number of identically-shaped
  steps (a divergent step count deadlocks SPMD collectives);
* assembles global arrays from per-host shards via
  ``host_local_batch_to_global`` (``jax.make_array_from_process_local_data``);
* all-gathers per-host eval outputs (``allgather_host_rows``) so every
  process computes identical metrics and takes identical early-stop /
  plateau / best-checkpoint decisions;
* broadcasts the run-directory name from process 0
  (``broadcast_str``) so orbax's collective save sees one shared path.

Everything is a no-op at ``process_count() == 1`` (unit-tested), so the
single-host path never pays for the hook.
"""

from __future__ import annotations

import jax
import numpy as np

_INITIALIZED = False


def maybe_initialize(config=None) -> tuple[int, int]:
    """Initialize jax.distributed from ``parallel.multihost`` config.

    Returns ``(process_index, process_count)``. Safe to call repeatedly
    and safe to call after the backend is live: if the runtime refuses to
    (re-)initialize but is already serving a healthy process group, the
    live values win; the error propagates only when the runtime is
    genuinely unusable.
    """
    global _INITIALIZED
    enable = bool(config.get_path("parallel.multihost.enable", default=False)) \
        if config is not None else False
    if not enable or _INITIALIZED:
        return jax.process_index(), jax.process_count()

    kw = {}
    for key in ("coordinator_address", "num_processes", "process_id"):
        val = config.get_path(f"parallel.multihost.{key}", default=None)
        if val is not None:
            kw[key] = val
    try:
        jax.distributed.initialize(**kw)
        _INITIALIZED = True
    except RuntimeError as e:
        # Two recoverable shapes: "already initialized" (a launcher beat
        # us to it) and "must be called before any JAX computations" (the
        # backend is live — e.g. a bench ran first). In both, the live
        # runtime is authoritative; re-raise only if it is unusable.
        try:
            idx, cnt = jax.process_index(), jax.process_count()
        except Exception:
            raise e from None
        want = kw.get("num_processes")
        if want is not None and int(want) > 1 and cnt != int(want):
            # the config EXPLICITLY asked for a pod of `want` processes;
            # continuing at cnt==1 would silently train the full dataset
            # independently per host under divergent run dirs (ADVICE r4)
            raise RuntimeError(
                f"jax.distributed.initialize failed ({e}) and the live "
                f"runtime reports {cnt} processes where the config demands "
                f"num_processes={want}; refusing to degrade to independent "
                "single-process runs — check coordinator_address/process_id"
            ) from e
        import warnings

        warnings.warn(
            f"jax.distributed.initialize skipped ({e}); using the live "
            f"runtime (process {idx}/{cnt})", stacklevel=2)
        _INITIALIZED = True
    return jax.process_index(), jax.process_count()


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def _batch_dim(batch) -> int:
    """The batch size: the most common leading dim over array leaves.

    Batch tensors (photometry, masks, images, labels, ...) dominate any
    ``to_tensor`` output; broadcast leaves (feature-stat vectors) are the
    minority — a majority vote is robust where a bare divisibility check
    is not (a (4,)-stats vector on a 4-process mesh must NOT be
    concatenated into a garbage (16,) global array).
    """
    from collections import Counter

    dims = Counter(
        np.asarray(x).shape[0]
        for x in jax.tree.leaves(batch)
        if np.asarray(x).ndim >= 1 and np.asarray(x).shape[0] > 0
    )
    return dims.most_common(1)[0][0] if dims else 0


def host_local_batch_to_global(batch, mesh, axis: str = "data"):
    """Assemble global sharded arrays from per-host local batches.

    Single-process: plain ``shard_batch`` (identical behavior, no-op hook).
    Multi-process: each host passes its LOCAL slice of the global batch;
    leaves whose leading dim is the batch dim go through
    ``jax.make_array_from_process_local_data``; the rest (feature-stat
    vectors — identical on every host because they come from the shared
    train-stats files) replicate. A batch whose global rows don't divide
    the mesh's data axis raises instead of silently replicating divergent
    per-host data (replicated sharding asserts equality; set
    ``data_loader.drop_last`` or a divisible batch size).
    """
    from applecider_tpu.parallel.mesh import batch_sharding, shard_batch

    if jax.process_count() == 1:
        return shard_batch(batch, mesh, axis=axis)

    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape[axis]
    local_b = _batch_dim(batch)
    global_b = local_b * jax.process_count()
    if local_b and global_b % n:
        raise ValueError(
            f"local batch {local_b} x {jax.process_count()} processes = "
            f"{global_b} global rows, not divisible by the {n}-way "
            f"'{axis}' mesh axis; use data_loader.drop_last or a "
            "divisible batch size (uneven batches cannot shard, and "
            "replicating divergent per-host data is silently wrong)")

    def put(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] == local_b and local_b > 0:
            return jax.make_array_from_process_local_data(
                batch_sharding(mesh, x.ndim, axis), x)
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, batch)


def local_rows(garr) -> np.ndarray:
    """This process's rows of a dim-0-sharded global array, in order.

    Single-process: plain materialization. Multi-process:
    ``np.asarray`` on an array spanning non-addressable devices raises,
    so assemble the host's addressable shards sorted by their global row
    offset — with ``make_array_from_process_local_data`` placement these
    are exactly (and in the order of) the rows this host fed in.
    """
    if jax.process_count() == 1:
        return np.asarray(garr)
    dim0 = garr.shape[0] if garr.ndim else 0

    def span(s):
        sl = s.index[0] if s.index else slice(None)
        return (sl.start or 0, dim0 if sl.stop is None else sl.stop)

    shards = sorted(garr.addressable_shards, key=lambda s: span(s)[0])
    # Guard the dim-0-sharded precondition: if XLA replicated the output
    # (no pinned out_shardings), every addressable shard is a FULL copy and
    # the concatenation would yield duplicated rows misaligned with this
    # host's labels on hosts > 0 (ADVICE r4). Overlapping spans mean the
    # array is not dim-0 sharded — refuse instead of returning garbage.
    prev_stop = 0
    for s in shards:
        start, stop = span(s)
        if start < prev_stop:
            raise ValueError(
                "local_rows: global array is not dim-0 sharded (addressable "
                f"shard spans overlap near row {start}; likely a replicated "
                "output — pin out_shardings=batch_sharding on the jit)")
        prev_stop = stop
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def allgather_host_rows(arr: np.ndarray) -> np.ndarray:
    """Concatenate per-host row blocks across processes (axis 0).

    Single-process: identity. Multi-process: every host receives the
    row-concatenation over all processes (process order), so eval metrics
    computed from the result are identical everywhere — divergent
    early-stop / plateau / best-checkpoint decisions would otherwise
    deadlock the SPMD step dispatch.
    """
    if jax.process_count() == 1:
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(
        np.asarray(arr), tiled=True))


def broadcast_str(value: str, max_len: int = 256) -> str:
    """Broadcast a short string from process 0 to all processes.

    Used for the timestamped run-directory name: every process must hand
    orbax the SAME path or its collective save diverges.
    """
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils

    buf = np.zeros(max_len, np.uint8)
    raw = value.encode()[:max_len]
    buf[: len(raw)] = np.frombuffer(raw, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return bytes(out[out > 0]).decode()
