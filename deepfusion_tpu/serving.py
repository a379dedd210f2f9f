"""Host-side continuous batching for inference serving.

The reference is a synchronous single-process library (callers own the
batching); BASELINE.md's deployment target adds a serving layer:
individual requests accumulate in a host queue and a worker thread flushes
them through a fixed-batch jitted model, amortizing dispatch overhead and
keeping the chip's batch dimension full. Fixed batch => one compiled
executable (XLA static shapes); short tails are padded and the padding
rows discarded.

Multi-replica serving: pass one model callable per replica (e.g. the same
model jitted onto different devices, or dp-sharded sub-meshes). Each
replica gets its own queue + worker thread; ``submit`` feeds the least
loaded queue, and ``submit_many`` splits a burst across replicas with
``balance211`` (util/deepfusion_utils.h:190-208 — the same near-equal
splitter the reference uses for OpenMP threads, applied at request
granularity).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Callable, Sequence, Union

import numpy as np

from .utils.logger import check, info
from .utils.mathutil import balance211


class BatchServer:
    """Continuous batcher over fixed-batch model callable(s).

    model_fn: one callable — or a sequence of callables, one per replica —
        taking a (batch, ...) u8 array and returning (batch, ...)
    batch: the compiled batch size (requests are padded up to it)
    max_delay_ms: max time a request waits for batch-mates before a
        partial (padded) flush
    """

    def __init__(self, model_fn: Union[Callable, Sequence[Callable]],
                 batch: int, input_shape,
                 max_delay_ms: float = 2.0, input_dtype=np.uint8):
        check(batch >= 1, "batch must be >= 1")
        self._fns = list(model_fn) if isinstance(model_fn, (list, tuple)) \
            else [model_fn]
        check(len(self._fns) >= 1, "need at least one model replica")
        self._batch = batch
        self._in_shape = tuple(input_shape)
        self._in_dtype = np.dtype(input_dtype)
        self._delay = max_delay_ms / 1e3
        self._qs = [queue.Queue() for _ in self._fns]
        self._stop = threading.Event()
        self._workers = [
            threading.Thread(target=self._run, args=(r,), daemon=True)
            for r in range(len(self._fns))]
        self._started = False
        self.stats = {"requests": 0, "flushes": 0, "padded_rows": 0,
                      "per_replica": [0] * len(self._fns)}

    @property
    def n_replicas(self) -> int:
        return len(self._fns)

    # ------------------------------------------------------------- API

    def start(self):
        if not self._started:
            for w in self._workers:
                w.start()
            self._started = True
        return self

    def _enqueue(self, x: np.ndarray, replica: int) -> Future:
        x = np.asarray(x, dtype=self._in_dtype)
        check(tuple(x.shape) == self._in_shape,
              f"request shape {x.shape} != {self._in_shape}")
        fut: Future = Future()
        self._qs[replica].put((x, fut))
        self.stats["requests"] += 1
        self.stats["per_replica"][replica] += 1
        return fut

    def submit(self, x: np.ndarray) -> Future:
        """Enqueue one request (a single example, shape == input_shape) on
        the least-loaded replica."""
        replica = min(range(len(self._qs)),
                      key=lambda r: self._qs[r].qsize())
        return self._enqueue(x, replica)

    def submit_many(self, xs: Sequence[np.ndarray]):
        """Enqueue a burst, split near-equally across replicas with
        balance211 (chunk r gets the contiguous [start, end) slice)."""
        futs: list = [None] * len(xs)
        for r in range(len(self._fns)):
            start, end = balance211(len(xs), len(self._fns), r)
            for i in range(start, end):
                futs[i] = self._enqueue(xs[i], r)
        return futs

    def close(self):
        self._stop.set()
        if self._started:
            for w in self._workers:
                w.join(timeout=5)

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.close()

    # ---------------------------------------------------------- worker

    def _gather(self, q):
        """Collect up to `batch` requests, waiting at most max_delay for
        stragglers after the first arrival."""
        items = []
        try:
            items.append(q.get(timeout=0.05))
        except queue.Empty:
            return items
        while len(items) < self._batch:
            try:
                items.append(q.get(timeout=self._delay))
            except queue.Empty:
                break
        return items

    def _run(self, replica: int):
        fn, q = self._fns[replica], self._qs[replica]
        while not self._stop.is_set() or not q.empty():
            items = self._gather(q)
            if not items:
                continue
            xs = np.stack([x for x, _ in items])
            pad = self._batch - len(items)
            if pad:
                xs = np.concatenate(
                    [xs, np.zeros((pad,) + self._in_shape, self._in_dtype)])
                self.stats["padded_rows"] += pad
            try:
                out = np.asarray(fn(xs))
            except Exception as e:  # propagate to all waiters
                for _, fut in items:
                    fut.set_exception(e)
                continue
            self.stats["flushes"] += 1
            for i, (_, fut) in enumerate(items):
                fut.set_result(out[i])
        if replica == 0:
            info("batch server drained: %s", self.stats)
