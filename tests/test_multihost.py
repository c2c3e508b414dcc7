"""Multi-host hooks (parallel/multihost.py): single-process no-op semantics
and the per-host strided DataLoader. A real pod slice can't run in CI; what
CAN be pinned down is that the hook is free when off, that initialization
is config-gated, and that host striding covers each epoch exactly once.
"""

import numpy as np

from applecider_tpu.config import load_defaults
from applecider_tpu.datasets.loader import DataLoader
from applecider_tpu.parallel.mesh import make_mesh, shard_batch
from applecider_tpu.parallel.multihost import (
    host_local_batch_to_global,
    maybe_initialize,
    process_count,
    process_index,
)


class _Toy:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def sample(self, i):
        return {"x": np.asarray([i], np.int64)}

    def collate(self, samples):
        return {"x": np.stack([s["x"] for s in samples])}


def test_maybe_initialize_noop_by_default():
    cfg = load_defaults()
    pid, pcount = maybe_initialize(cfg)
    assert (pid, pcount) == (0, 1)
    assert process_index() == 0 and process_count() == 1
    # enable=true with a LIVE backend (jax ops already ran in this test
    # process) must fall through to the live runtime values — JAX refuses
    # post-computation initialize with an error that does NOT contain
    # "already"; the hook recovers instead of crashing the run
    cfg.set("parallel.multihost.enable", True)
    cfg.set("parallel.multihost.num_processes", 1)
    cfg.set("parallel.multihost.process_id", 0)
    cfg.set("parallel.multihost.coordinator_address", "localhost:0")
    import jax

    jax.numpy.zeros(1).block_until_ready()  # ensure the backend is live
    pid, pcount = maybe_initialize(cfg)
    assert (pid, pcount) == (0, 1)


def test_host_local_batch_equals_shard_batch_single_process():
    mesh = make_mesh(shape=(8, 1))
    batch = {
        "a": np.arange(32, dtype=np.float32).reshape(16, 2),
        "stats": np.ones(3, np.float32),  # non-divisible -> replicated
    }
    got = host_local_batch_to_global(batch, mesh)
    want = shard_batch(batch, mesh)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))
        assert got[k].sharding == want[k].sharding


def test_loader_shards_equal_length_disjoint_cover():
    """Every shard sees the SAME number of identically-sized batches (a
    divergent step count deadlocks pod collectives); shards are disjoint.
    A common shard length not divisible by batch_size auto-enables
    drop_last with a warning (ADVICE r4: the divisibility error would
    otherwise surface mid-epoch in host_local_batch_to_global); the
    dropped rows are exactly shard_emit_plan()'s leftover."""
    import pytest

    ds = _Toy(37)
    with pytest.warns(UserWarning, match="drop_last"):
        loaders = [
            DataLoader(ds, batch_size=4, shuffle=True, seed=5,
                       num_shards=4, shard_index=s)
            for s in range(4)
        ]
    per_shard = []
    seen: list[int] = []
    for ld in loaders:
        batches = list(ld)
        per_shard.append([len(b["x"]) for b in batches])
        for batch in batches:
            seen.extend(int(v) for v in batch["x"].ravel())
    # identical batch-count AND batch-size schedule on every host
    assert all(p == per_shard[0] for p in per_shard[1:])
    # disjoint; 8 full rows per shard (common 9 truncated to batch multiple)
    assert len(seen) == len(set(seen)) == 4 * 8
    # identical global permutation on every host: shard 0's first batch is
    # the stride-4 head of the shared shuffle
    rng = np.random.default_rng(5)
    perm = np.arange(37)
    rng.shuffle(perm)
    fresh = DataLoader(ds, batch_size=4, shuffle=True, seed=5,
                       num_shards=4, shard_index=0, drop_last=True)
    first = next(iter(fresh))["x"].ravel()
    np.testing.assert_array_equal(first, perm[0::4][:4])


def test_shard_emit_plan_inverts_and_covers():
    """per_shard + leftover partition the dataset; plan matches what the
    loaders actually emit, and scattering emitted rows back through the
    plan reconstructs dataset order (the Trainer.predict inversion)."""
    ds = _Toy(37)
    loaders = [
        DataLoader(ds, batch_size=4, shuffle=True, seed=5,
                   num_shards=4, shard_index=s, drop_last=True)
        for s in range(4)
    ]
    plan = loaders[0].shard_emit_plan()
    # every loader agrees on the plan (same seed/epoch)
    for ld in loaders[1:]:
        p2 = ld.shard_emit_plan()
        for a, b in zip(plan["per_shard"], p2["per_shard"]):
            np.testing.assert_array_equal(a, b)
    emitted = [np.concatenate([b["x"].ravel() for b in ld]) for ld in loaders]
    for want, got in zip(plan["per_shard"], emitted):
        np.testing.assert_array_equal(want, got)
    allv = np.concatenate(plan["per_shard"] + [plan["leftover"]])
    assert sorted(allv.tolist()) == list(range(37))
    # the predict() inversion: rows gathered in [shard0; shard1; ...] order
    # scatter back to dataset order
    order = np.concatenate(plan["per_shard"])
    rows = order * 10.0  # "prediction" for dataset index i is 10*i
    full = np.empty(37)
    full[order] = rows
    full[plan["leftover"]] = plan["leftover"] * 10.0
    np.testing.assert_array_equal(full, np.arange(37) * 10.0)


def test_loader_len_accounts_for_shards():
    ds = _Toy(37)
    for s in range(4):
        ld = DataLoader(ds, batch_size=4, num_shards=4, shard_index=s)
        assert len(ld) == len(list(ld))


def test_local_rows_and_allgather_single_process():
    from applecider_tpu.parallel.multihost import (allgather_host_rows,
                                                   local_rows)
    import jax

    x = np.arange(12, dtype=np.float32).reshape(6, 2)
    g = jax.device_put(x)
    np.testing.assert_array_equal(local_rows(g), x)
    np.testing.assert_array_equal(allgather_host_rows(x), x)


def test_broadcast_str_single_process():
    from applecider_tpu.parallel.multihost import broadcast_str

    assert broadcast_str("20260820-120000-000001") == "20260820-120000-000001"


def test_batch_dim_majority_vote():
    """A (4,)-stats vector on a 4-process rig must NOT be mistaken for a
    batch leaf (concatenating per-host copies would corrupt its shape)."""
    from applecider_tpu.parallel.multihost import _batch_dim

    batch = {
        "photometry": np.zeros((8, 16, 7)),
        "mask": np.zeros((8, 16)),
        "labels": np.zeros((8,)),
        "stats_mean": np.zeros((4,)),
    }
    assert _batch_dim(batch) == 8
