"""Host-side prefetch pipeline.

The reference samples and tokenizes synchronously inside the train step
(trainer.py:161-172 + gato_policy.py:195-432), serializing host work with
device work.  Here a background thread keeps a small queue of packed numpy
batches ahead of the device: while the TPU crunches step N, the host packs
step N+1/N+2 and the transfer is issued asynchronously (jax.device_put with
shardings returns immediately).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Optional


class HostPrefetcher:
    """Runs `sample_fn` in a daemon thread, keeping up to `depth` results."""

    def __init__(self, sample_fn: Callable[[], object], depth: int = 2):
        self._sample_fn = sample_fn
        self._queue: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while not self._stop.is_set():
            try:
                item = ("ok", self._sample_fn())
            except BaseException as e:  # forwarded to the consumer
                item = ("err", e)
            while not self._stop.is_set():
                try:
                    self._queue.put(item, timeout=0.1)
                    break
                except queue.Full:
                    continue
            if item[0] == "err":
                return

    def get(self):
        kind, value = self._queue.get()
        if kind == "err":
            raise value
        return value

    def close(self):
        self._stop.set()
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
