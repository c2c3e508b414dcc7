"""Seeded host-side batcher with background prefetch.

Replaces the torch DataLoader the reference gets from Hyrax: datasets
expose ``sample(idx) -> dict`` and ``collate(list[dict]) -> {"data": ...}``;
this loader shuffles with a per-epoch seeded RNG, batches with optional
drop-last, and overlaps host assembly with device compute via a small
thread prefetcher (the TPU input pipeline pattern).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int = 32,
        shuffle: bool = True,
        seed: int = 42,
        drop_last: bool = False,
        prefetch: int = 2,
        num_shards: int = 1,
        shard_index: int = 0,
    ):
        """``num_shards``/``shard_index``: multi-host striding — each host
        reads every ``num_shards``-th sample of the (identically seeded)
        global permutation, so the union over hosts is the single-host
        epoch exactly once. Defaults are a single-host no-op; the Trainer
        passes ``jax.process_count()/process_index()`` when
        ``parallel.multihost.enable`` is set (parallel/multihost.py)."""
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.seed = int(seed)
        self.drop_last = drop_last
        self.prefetch = int(prefetch)
        self.num_shards = int(num_shards)
        self.shard_index = int(shard_index)
        if not (0 <= self.shard_index < self.num_shards):
            raise ValueError(
                f"shard_index {shard_index} outside [0, {num_shards})")
        if self.num_shards > 1 and not self.drop_last:
            common = len(dataset) // self.num_shards
            if common % self.batch_size:
                # a partial final batch would hit the global-divisibility
                # ValueError in host_local_batch_to_global mid-epoch (a
                # config error surfaced mid-training); fail at startup by
                # auto-enabling drop_last with a notice instead. Trainer
                # .predict recovers the dropped rows via shard_emit_plan.
                import warnings

                warnings.warn(
                    f"multi-host loader: common shard length {common} is not "
                    f"a multiple of batch_size {self.batch_size}; enabling "
                    "drop_last so every process runs identically-shaped "
                    "steps (dropped rows are recovered by predict())",
                    stacklevel=2)
                self.drop_last = True
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = int(epoch)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.num_shards > 1:  # common shard length (see _batch_indices)
            n = n // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _permutation(self) -> np.ndarray:
        """The (identically seeded across hosts) epoch permutation."""
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        return idx

    def _shard_slice(self, idx: np.ndarray, shard: int) -> np.ndarray:
        """Indices shard ``shard`` emits this epoch (drop_last applied)."""
        common = len(idx) // self.num_shards
        out = idx[shard::self.num_shards][:common]
        if self.drop_last:
            out = out[: (len(out) // self.batch_size) * self.batch_size]
        return out

    def shard_emit_plan(self) -> dict:
        """What every shard will emit on the NEXT ``__iter__`` (no state
        change): ``{"per_shard": [np.ndarray, ...], "leftover": np.ndarray}``.

        ``per_shard[s]`` is shard ``s``'s dataset indices in emission order;
        ``leftover`` is the indices no shard emits (common-length truncation
        + drop_last). Deterministic across hosts (same seed/epoch), which is
        what lets ``Trainer.predict`` invert the multi-host row permutation
        and recover the dropped tail (ADVICE r4 medium)."""
        idx = self._permutation()
        per_shard = [self._shard_slice(idx, s) for s in range(self.num_shards)]
        emitted = np.concatenate(per_shard) if per_shard else np.empty(0, np.int64)
        mask = np.ones(len(idx), bool)
        mask[emitted] = False
        return {"per_shard": per_shard, "leftover": np.flatnonzero(mask)}

    def _batch_indices(self) -> list[np.ndarray]:
        n = len(self.dataset)
        idx = self._permutation()
        if self.num_shards > 1:
            # every host shuffles the same global permutation (same seed),
            # then takes its stride — disjoint cover, no coordination.
            # Truncate to the COMMON shard length: shard sizes differing
            # by one would give hosts different batch shapes/counts, and a
            # process dispatching a collective step the others never enter
            # deadlocks the pod (up to num_shards-1 samples dropped per
            # epoch; the shuffle rotates which ones each epoch).
            idx = self._shard_slice(idx, self.shard_index)
            n = len(idx)
        batches = [idx[i : i + self.batch_size] for i in range(0, n, self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def _make_batch(self, indices: np.ndarray) -> dict:
        samples = [self.dataset.sample(int(i)) for i in indices]
        return self.dataset.collate(samples)

    def __iter__(self) -> Iterator[dict]:
        batches = self._batch_indices()
        self._epoch += 1
        if self.prefetch <= 0:
            for b in batches:
                yield self._make_batch(b)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error: list[BaseException] = []
        stop = threading.Event()  # set when the consumer abandons the epoch

        def _put(item) -> bool:
            # bounded put that gives up when the consumer is gone — an
            # abandoned `for batch in loader: break` must not leave this
            # thread blocked forever holding assembled batches
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for b in batches:
                    if stop.is_set() or not _put(self._make_batch(b)):
                        return
            except BaseException as e:  # surfaced in the consumer
                error.append(e)
            finally:
                _put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if error:
                        raise error[0]
                    return
                yield item
        finally:
            stop.set()
            # unblock a producer stuck in q.put, then reap the thread
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5.0)
