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
  ``shard_index=process_index()``) so each host reads only its slice;
* assembles global arrays from per-host shards via
  ``host_local_batch_to_global`` (``jax.make_array_from_process_local_data``).

Everything is a no-op at ``process_count() == 1`` (unit-tested), so the
single-host path never pays for the hook.
"""

from __future__ import annotations

import jax
import numpy as np

_INITIALIZED = False


def maybe_initialize(config=None) -> tuple[int, int]:
    """Initialize jax.distributed from ``parallel.multihost`` config.

    Returns ``(process_index, process_count)``. Safe to call repeatedly;
    a no-op unless ``parallel.multihost.enable`` is true and the runtime
    isn't already initialized.
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
    except RuntimeError as e:
        # already initialized (e.g. by a launcher) — use the live runtime
        if "already" not in str(e).lower():
            raise
    _INITIALIZED = True
    return jax.process_index(), jax.process_count()


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def host_local_batch_to_global(batch, mesh, axis: str = "data"):
    """Assemble global sharded arrays from per-host local batches.

    Single-process: plain ``shard_batch`` (identical behavior, no-op hook).
    Multi-process: each host passes its LOCAL slice of the global batch
    (len = global_batch / process_count); dim-0-shardable leaves go through
    ``jax.make_array_from_process_local_data``; the rest (stats vectors,
    scalars) replicate.
    """
    from applecider_tpu.parallel.mesh import batch_sharding, shard_batch

    if jax.process_count() == 1:
        return shard_batch(batch, mesh, axis=axis)

    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape[axis]

    def put(x):
        x = np.asarray(x)
        global_rows = x.shape[0] * jax.process_count() if x.ndim >= 1 else 0
        if x.ndim >= 1 and x.shape[0] > 0 and global_rows % n == 0:
            return jax.make_array_from_process_local_data(
                batch_sharding(mesh, x.ndim, axis), x)
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, batch)
