"""Device mesh and sharding helpers.

The reference has no distributed support (single hardcoded CUDA device);
scaling here is SPMD over a ``jax.sharding.Mesh``:

* ``data`` axis — batch sharding (data parallel): every batch leaf is
  sharded on dim 0, params are replicated, and XLA inserts the gradient
  all-reduce over ICI automatically;
* ``model`` axis — optional model parallelism for larger configs: the MoE
  expert stack and transformer FFN/head dims shard here (see
  ``expert_sharding_rules``); at the reference's model sizes the axis is 1.

Collectives ride ICI; no NCCL/MPI translation, no manual all-reduce.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, shape=(-1, 1), axes=("data", "model")) -> Mesh:
    """Create a mesh; -1 in shape absorbs the remaining devices."""
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        shape[shape.index(-1)] = n // known
    needed = int(np.prod(shape))
    if needed > n:
        raise ValueError(f"mesh shape {tuple(shape)} needs {needed} devices, have {n}")
    if needed < n:
        import warnings

        warnings.warn(
            f"mesh shape {tuple(shape)} uses {needed} of {n} available devices; "
            "use -1 in the shape to absorb the rest",
            stacklevel=2,
        )
    grid = np.asarray(devices[:needed]).reshape(shape)
    return Mesh(grid, axes)


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard dim 0 over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """device_put every array leaf with dim-0 sharding over the data axis.

    Leaves whose dim 0 is not divisible by the data-axis size (stats vectors,
    ragged tail batches) are replicated instead.
    """
    n = mesh.shape[axis]

    def put(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] > 0:
            return jax.device_put(x, batch_sharding(mesh, x.ndim, axis))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh.

    Multi-process: a committed single-device jax.Array cannot device_put
    onto a mesh spanning non-addressable devices (the CPU/TPU backends
    refuse cross-host copies); every process holds an identical local copy
    (same seeded init / same orbax restore), so route through host memory
    and let each process place its own replica.
    """
    sharding = NamedSharding(mesh, P())
    multi = jax.process_count() > 1

    def put(x):
        if multi and isinstance(x, jax.Array):
            x = np.asarray(x)
        return jax.device_put(x, sharding)

    return jax.tree.map(put, tree)


def expert_sharding_rules(params: dict, mesh: Mesh, axis: str = "model") -> dict:
    """NamedShardings for expert parallelism: shard each ``expert_i``
    subtree's largest dim over the model axis; replicate everything else.

    With E tiny experts this is a demonstration of the mechanism more than
    a necessity — at larger expert counts the same rules scale.
    """

    def rule(path, leaf):
        path_names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        in_expert = any(str(p).startswith("expert_") for p in path_names)
        leaf = np.asarray(leaf)
        if in_expert and leaf.ndim >= 2 and leaf.shape[-1] % mesh.shape[axis] == 0:
            spec = [None] * leaf.ndim
            spec[-1] = axis
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)
