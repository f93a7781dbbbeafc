"""Background batch prefetching.

The reference's training loop loads and warps images synchronously
between device steps (``train_network.py:259-268`` — no tf.data, no
prefetch; SURVEY §3.3 "hot loops").  This prefetcher runs the host-side
sampler in a worker thread with a small bounded queue so batch
preparation (NIfTI reads + cv2/scipy augmentation) overlaps the device
step — the numpy/cv2 work releases the GIL.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable


class BatchPrefetcher:
    """Wraps a ``make_batch() -> batch`` callable into a prefetching
    iterator.  ``depth`` batches are kept ready ahead of the consumer."""

    def __init__(self, make_batch: Callable[[], object], depth: int = 2):
        self._make_batch = make_batch
        self._queue: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._error = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            while not self._stop.is_set():
                batch = self._make_batch()
                while not self._stop.is_set():
                    try:
                        self._queue.put(batch, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except Exception as e:  # surface in next()
            self._error = e

    def next(self):
        while True:
            if self._error is not None:
                raise self._error
            try:
                return self._queue.get(timeout=0.1)
            except queue.Empty:
                if not self._thread.is_alive() and self._error is None:
                    raise RuntimeError("prefetch worker exited")

    def close(self):
        self._stop.set()
        # drain so the worker unblocks
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=2)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
