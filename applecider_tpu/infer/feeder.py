"""Overlapped serving feeder: host decode+pack runs CONCURRENTLY with
device execution.

The last unbuilt piece of the north-star path (SURVEY §3.5 hard-part #3;
reference README.md:17-19 production diagram): from RAW alerts — gzipped
FITS stamp blobs + ragged photometry/metadata/spectra — to class
probabilities, with the three planes overlapped instead of composed
serially:

  worker pool      decode stamps (native, GIL-free ctypes call) +
  (threads or       assemble samples + ``FusedSpectraStream.place``
   processes)       pack (+ device_put in thread mode)
       │  bounded buffer of prepared batches
  main thread      dispatch ``run_placed`` + resolve with depth
                    pipelining (device executes batch i while workers
                    prepare i+1..i+k)

A serially-composed loop pays decode + pack + H2D + device per batch
(measured 1.0k alerts/s from raw stamps on the round-4 rig); overlapped,
the sustained rate approaches min(host rate x workers, H2D, device rate).

Thread mode (default) fits a single process whose decode cost is mostly
inside the native decoder (ctypes releases the GIL); process mode moves
decode+pack to worker PROCESSES for hosts with many cores — workers never
touch the JAX backend (``place(host_only=True)``), the main process does
``place_packed`` + dispatch.

Exactness: outputs are the underlying router's, batch for batch
(unit-tested vs the serial loop in test_feeder.py).
"""

from __future__ import annotations

import queue
import threading
from collections import deque
from typing import Callable, Iterable, Iterator, Optional

import numpy as np


def assemble_samples(records: list[dict], hw: int = 63) -> list[dict]:
    """Raw alert records -> ``pack_alert_batch`` sample dicts.

    A record is a pack sample whose ``image`` may instead be ``stamps``:
    a list of 3 gzipped-FITS byte blobs (science/template/difference,
    the ZTF alert layout — reference ``preprocess_multimodal.py:433-456``).
    All records' stamps decode in ONE native batched call.
    """
    from applecider_tpu.native import decode_stamps_batch

    blobs, owners = [], []
    for i, r in enumerate(records):
        if "stamps" in r:
            owners.append(i)
            blobs.extend(r["stamps"])
    out = [dict(r) for r in records]
    if owners:
        imgs, ok = decode_stamps_batch(blobs, hw=hw)
        if not bool(ok.all()):
            bad = int(np.flatnonzero(~ok)[0])
            raise ValueError(
                f"stamp decode failed for blob {bad} (record "
                f"{owners[bad // 3]}); undecodable cutouts must be "
                "filtered or substituted upstream")
        imgs = imgs.reshape(len(owners), 3, hw, hw)
        for j, i in enumerate(owners):
            out[i].pop("stamps")
            out[i]["image"] = np.moveaxis(imgs[j], 0, -1)
    return out


def _prepare_host(records, length_buckets, image_dtype, hw):
    """Worker body (process mode): decode + assemble + pack, NO JAX."""
    from applecider_tpu.infer.stream import FusedSpectraStream  # noqa: F401

    samples = assemble_samples(records, hw=hw)
    return samples


class OverlappedServingFeeder:
    """Pipeline raw-record batches through decode/pack workers + device.

    Parameters
    ----------
    router : FusedSpectraStream | RoutedAlertStream
        The compiled serving router (its ``place``/``run_placed`` API).
    params : pytree
        Model weights.
    n_workers : int
        Decode+pack workers. On an N-core host, ``min(N, 2-4)`` saturates
        a v5e chip (see the bench's ``cores_to_saturate`` model).
    depth : int
        Dispatched-but-unresolved batches kept in flight on the device.
    buffer : int
        Prepared batches buffered between workers and dispatch.
    mode : "thread" | "process"
        Thread workers overlap via the GIL-free native decode; process
        workers give true multi-core scaling (numpy pack included) at the
        cost of one pickle per packed batch.
    """

    def __init__(self, router, params, n_workers: int = 2, depth: int = 3,
                 buffer: int = 4, mode: str = "thread",
                 length_buckets: Optional[tuple] = None,
                 image_dtype=np.float32, hw: int = 63):
        if mode not in ("thread", "process"):
            raise ValueError(f"mode must be thread|process, got {mode!r}")
        self.router = router
        self.params = params
        self.n_workers = int(n_workers)
        self.depth = int(depth)
        self.buffer = int(buffer)
        self.mode = mode
        self.length_buckets = length_buckets
        self.image_dtype = image_dtype
        self.hw = int(hw)

    # ------------------------------------------------------------ internals
    def _place_kw(self) -> dict:
        return {"length_buckets": self.length_buckets,
                "image_dtype": self.image_dtype}

    def _prepare_thread(self, records):
        """Thread worker: decode + pack + device_put (H2D off main)."""
        samples = assemble_samples(records, hw=self.hw)
        return self.router.place(samples, **self._place_kw()), len(records)

    # ------------------------------------------------------------------ run
    def serve(self, record_batches: Iterable[list],
              on_result: Optional[Callable] = None) -> Iterator[np.ndarray]:
        """Yield one ``(n, C)`` probability array per input batch, in order.

        Lazily consumes ``record_batches`` so an unbounded stream works;
        keeps ``buffer`` prepared batches and ``depth`` dispatched batches
        in flight. ``on_result`` (optional) is called with each resolved
        array as soon as it materializes (same thread).
        """
        if self.mode == "process":
            yield from self._serve_process(record_batches, on_result)
            return

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=self.n_workers) as ex:
            prep: deque = deque()   # futures -> (placed, n)
            disp: deque = deque()   # (n, resolver)

            def drain_one():
                n, resolver = disp.popleft()
                out = resolver()[:n]
                if on_result is not None:
                    on_result(out)
                return out

            for rb in record_batches:
                prep.append(ex.submit(self._prepare_thread, rb))
                # promote every finished prepared batch (or block when the
                # buffer is full) to a device dispatch
                while prep and (prep[0].done() or len(prep) > self.buffer):
                    placed, n = prep.popleft().result()
                    disp.append((n, self.router.run_placed(self.params, placed)))
                while len(disp) > self.depth:
                    yield drain_one()
            while prep:
                placed, n = prep.popleft().result()
                disp.append((n, self.router.run_placed(self.params, placed)))
                while len(disp) > self.depth:
                    yield drain_one()
            while disp:
                yield drain_one()

    def _serve_process(self, record_batches, on_result):
        """Process mode: workers decode+assemble (no JAX); the main
        process packs host-side via the router, device_puts, dispatches.

        The pack itself stays on the main process ONLY when the router
        lacks ``host_only`` packing; ``FusedSpectraStream.place`` supports
        it, so the full decode+pack pipeline runs in workers and the main
        process pays just ``place_packed`` (device_put) + dispatch.
        """
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor

        host_pack = hasattr(self.router, "place_packed")
        ctx = mp.get_context("spawn")  # fork would clone the JAX runtime
        with ProcessPoolExecutor(max_workers=self.n_workers,
                                 mp_context=ctx) as ex:
            prep: deque = deque()
            disp: deque = deque()

            def submit(rb):
                if host_pack:
                    kw = self._place_kw()
                    return ex.submit(_pack_worker, rb, kw, self.hw,
                                     type(self.router).__name__,
                                     getattr(self.router, "max_spec", 512),
                                     getattr(self.router, "spec_buckets", None)
                                     ), len(rb)
                return ex.submit(_prepare_host, rb, None, None, self.hw), len(rb)

            def promote():
                fut, n = prep.popleft()
                payload = fut.result()
                if host_pack:
                    placed = self.router.place_packed(payload)
                else:
                    placed = self.router.place(payload, **self._place_kw())
                disp.append((n, self.router.run_placed(self.params, placed)))

            def drain_one():
                n, resolver = disp.popleft()
                out = resolver()[:n]
                if on_result is not None:
                    on_result(out)
                return out

            for rb in record_batches:
                prep.append(submit(rb))
                while prep and (prep[0][0].done() or len(prep) > self.buffer):
                    promote()
                while len(disp) > self.depth:
                    yield drain_one()
            while prep:
                promote()
                while len(disp) > self.depth:
                    yield drain_one()
            while disp:
                yield drain_one()


def _pack_worker(records, place_kw, hw, router_cls_name, max_spec, spec_buckets):
    """Process-pool body: decode + assemble + HOST pack (no JAX import).

    Rebuilding a router in the worker would drag in the model/task; the
    compact-spectra pack is a pure function of the samples, so a minimal
    stand-in router re-runs just the packing path."""
    from applecider_tpu.infer.stream import FusedSpectraStream

    samples = assemble_samples(records, hw=hw)
    packer = FusedSpectraStream.__new__(FusedSpectraStream)
    packer.spec_buckets = tuple(spec_buckets) if spec_buckets else (
        0, 4, 8, 16, 32, 64, 96, 112, 128, 192, 256, 320, 384, 512)
    packer.max_spec = int(max_spec)
    packer.pipe = None  # host_only path never touches it
    return FusedSpectraStream.place(packer, samples, host_only=True,
                                    **place_kw)


def pipeline_model(host_per_core_alerts_per_sec: float,
                   device_alerts_per_sec: float,
                   n_cores: int,
                   h2d_alerts_per_sec: Optional[float] = None) -> dict:
    """Steady-state rate model for the overlapped pipeline.

    With decode+pack parallelized over ``n_cores`` workers and overlapped
    against H2D + device execution, the sustained rate is the minimum
    stage rate; ``cores_to_saturate`` is how many host cores a deployment
    needs before the chip (or link) becomes the binding resource.
    """
    host = host_per_core_alerts_per_sec * max(n_cores, 1)
    stages = {"host": host, "device": device_alerts_per_sec}
    if h2d_alerts_per_sec:
        stages["h2d"] = h2d_alerts_per_sec
    binding = min(stages, key=stages.get)
    non_host = min(v for k, v in stages.items() if k != "host")
    import math

    return {
        "projected_alerts_per_sec": round(min(stages.values()), 1),
        "binding_stage": binding,
        "cores_to_saturate": math.ceil(
            non_host / host_per_core_alerts_per_sec),
    }
