"""Async host input pipeline: threaded prefetch + device double buffering.

The reference stubs prefetch off entirely (`config.py:87-89`:
"Use horizontal... prefetch was never useful"; `layer.py:45-53` documents a
blob queue that does not exist). This is the real thing:

* N worker threads decode/resize/pad batches ahead of the training loop
  (image IO is the reference's host bottleneck — SURVEY.md §3.1);
* a bounded queue (depth cfg.TPU.PREFETCH_DEPTH) keeps memory flat;
* ``device_prefetch`` eagerly `device_put`s the next batch while the
  current step runs, overlapping H2D DMA with compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax

from ctpn_tpu.config import cfg


class PrefetchLoader:
    """Wrap a blocking batch source with background prefetch threads."""

    def __init__(
        self,
        next_batch: Callable[[], object] = None,
        depth: Optional[int] = None,
        workers: int = 2,
        sample_fn: Callable[[], object] = None,
        build_fn: Callable[[object], object] = None,
    ):
        """Either pass ``next_batch`` (whole produce step, serialized under a
        lock because samplers like RoIDataLayer keep a shuffle cursor), or
        split it into ``sample_fn`` (cheap, runs under the lock) +
        ``build_fn`` (heavy decode/pad work, runs in parallel workers)."""
        if next_batch is not None:
            self._sample = next_batch
            self._build = lambda x: x
        else:
            assert sample_fn is not None and build_fn is not None
            self._sample = sample_fn
            self._build = build_fn
        self._q: "queue.Queue" = queue.Queue(
            maxsize=depth or cfg.TPU.PREFETCH_DEPTH
        )
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(workers)
        ]
        for t in self._threads:
            t.start()

    def _worker(self) -> None:
        while not self._stop.is_set():
            try:
                with self._lock:
                    item = self._sample()
                batch = self._build(item)
            except Exception as e:  # surface errors to the consumer
                self._q.put(e)
                return
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.1)
                    break
                except queue.Full:
                    continue

    def get(self):
        item = self._q.get()
        if isinstance(item, Exception):
            raise item
        return item

    def close(self) -> None:
        self._stop.set()
        # drain so workers blocked on put can exit
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __iter__(self) -> Iterator:
        while True:
            yield self.get()


def device_prefetch(batches: Iterator, sharding=None, depth: int = 2) -> Iterator:
    """Eagerly device_put `depth` batches ahead (overlap H2D with compute)."""
    import collections

    buf = collections.deque()

    def put(b):
        if sharding is not None:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), b
            )
        return jax.tree_util.tree_map(jax.device_put, b)

    it = iter(batches)
    try:
        for _ in range(depth):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out
