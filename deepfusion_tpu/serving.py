"""Host-side continuous batching for inference serving.

The reference is a synchronous single-process library (callers own the
batching); BASELINE.md's deployment target adds a serving layer:
individual requests accumulate in a host queue and a worker thread flushes
them through a fixed-batch jitted model, amortizing dispatch overhead and
keeping the chip's batch dimension full. Fixed batch => one compiled
executable (XLA static shapes); short tails are padded and the padding
rows discarded.

Work splitting across model replicas (if >1 worker) reuses ``balance211``
(util/deepfusion_utils.h:190-208 — same splitter the reference uses for
OpenMP threads, applied at request granularity).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Callable, Sequence

import numpy as np

from .utils.logger import check, info


class BatchServer:
    """Continuous batcher over a fixed-batch model callable.

    model_fn: callable taking a (batch, ...) u8 array, returning (batch, ...)
    batch: the compiled batch size (requests are padded up to it)
    max_delay_ms: max time a request waits for batch-mates before a
        partial (padded) flush
    """

    def __init__(self, model_fn: Callable, batch: int, input_shape,
                 max_delay_ms: float = 2.0, input_dtype=np.uint8):
        check(batch >= 1, "batch must be >= 1")
        self._fn = model_fn
        self._batch = batch
        self._in_shape = tuple(input_shape)
        self._in_dtype = np.dtype(input_dtype)
        self._delay = max_delay_ms / 1e3
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._started = False
        self.stats = {"requests": 0, "flushes": 0, "padded_rows": 0}

    # ------------------------------------------------------------- API

    def start(self):
        if not self._started:
            self._worker.start()
            self._started = True
        return self

    def submit(self, x: np.ndarray) -> Future:
        """Enqueue one request (a single example, shape == input_shape)."""
        x = np.asarray(x, dtype=self._in_dtype)
        check(tuple(x.shape) == self._in_shape,
              f"request shape {x.shape} != {self._in_shape}")
        fut: Future = Future()
        self._q.put((x, fut))
        self.stats["requests"] += 1
        return fut

    def submit_many(self, xs: Sequence[np.ndarray]):
        return [self.submit(x) for x in xs]

    def close(self):
        self._stop.set()
        if self._started:
            self._worker.join(timeout=5)

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.close()

    # ---------------------------------------------------------- worker

    def _gather(self):
        """Collect up to `batch` requests, waiting at most max_delay for
        stragglers after the first arrival."""
        items = []
        try:
            items.append(self._q.get(timeout=0.05))
        except queue.Empty:
            return items
        while len(items) < self._batch:
            try:
                items.append(self._q.get(timeout=self._delay))
            except queue.Empty:
                break
        return items

    def _run(self):
        while not self._stop.is_set() or not self._q.empty():
            items = self._gather()
            if not items:
                continue
            xs = np.stack([x for x, _ in items])
            pad = self._batch - len(items)
            if pad:
                xs = np.concatenate(
                    [xs, np.zeros((pad,) + self._in_shape, self._in_dtype)])
                self.stats["padded_rows"] += pad
            try:
                out = np.asarray(self._fn(xs))
            except Exception as e:  # propagate to all waiters
                for _, fut in items:
                    fut.set_exception(e)
                continue
            self.stats["flushes"] += 1
            for i, (_, fut) in enumerate(items):
                fut.set_result(out[i])
        info("batch server drained: %s", self.stats)
