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
from typing import Callable, Optional, Sequence


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


def make_chunk_builder(prefetcher: BatchPrefetcher, K: int, total: int,
                       cadences: Sequence[int],
                       stage: Optional[Callable] = None):
    """Build the K-step dispatch input for a training loop.

    Returns ``build_input(it) -> (k_now, batches, keys)`` where ``k_now``
    is the chunk length starting at iteration ``it`` (0-based count of
    completed iterations), cut so every cadence boundary in ``cadences``
    (validation / checkpoint / progress print) and the end of training
    still land exactly on an iteration count — cadence semantics are
    unchanged by K.  For ``k_now > 1`` the K batches are stacked on a new
    leading axis (the ``lax.scan`` axis of
    ``steps.make_multi_train_step``) and keys is a (K, 2) PRNGKey array;
    for ``k_now == 1`` the batch passes through unstacked with a single
    key — matching ``steps.make_train_step``.

    ``stage`` (e.g. ``jax.device_put``) is applied to the batch pytree so
    its host→device transfer can ride under the previous dispatch; mesh
    trainers pass None and let the sharded jit place the arrays.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    stage = stage or (lambda b: b)

    def next_k(it):
        k_now = min(K, total - it)
        for c in cadences:
            if c and c > 0:
                k_now = min(k_now, c - it % c)
        return k_now

    def build_input(it):
        k_now = next_k(it)
        if k_now > 1:
            chunk = [prefetcher.next() for _ in range(k_now)]
            batches = stage({k: np.stack([b[k] for b in chunk])
                             for k in chunk[0]})
            keys = jax.vmap(jax.random.PRNGKey)(
                jnp.arange(it + 1, it + 1 + k_now))
            return k_now, batches, keys
        return 1, stage(prefetcher.next()), jax.random.PRNGKey(it + 1)

    return build_input


def make_pool_chunk_builder(prefetcher: BatchPrefetcher, pool, K: int,
                            total: int, cadences: Sequence[int],
                            stage_local: bool = True):
    """Build the K-step dispatch input for a DEVICE-POOL training loop
    (``train/device_pool.py``) — shared by the SA slice-pool and aortic
    window-pool trainers so the correctness-sensitive ordering lives in
    one place: the pool snapshot is taken AFTER all of the chunk's
    subjects are ensured (batch indices must resolve against a pool
    version that contains them), and each batch's slot pins release
    only after that snapshot is captured.

    Returns ``build_input(it) -> (k_now, (pool_img, pool_lab, batches),
    keys)`` with the same cadence-clamping as :func:`make_chunk_builder`
    and the same ``PRNGKey(it+1..)`` key stream.  ``stage_local``:
    device_put the (tiny) index batches one dispatch ahead on a single
    device; mesh trainers pass False and let the sharded jit place
    them per its in_shardings.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    def build_input(it):
        k_now = min(K, total - it)
        for c in cadences:
            if c and c > 0:
                k_now = min(k_now, c - it % c)
        chunk = [prefetcher.next() for _ in range(k_now)]
        pool_img, pool_lab = pool.snapshot()
        stage = jax.device_put if stage_local else (lambda x: x)
        batches = {k: stage(np.stack([b[k] for b in chunk]))
                   for k in chunk[0]}
        for b in chunk:
            for s in b["slot"]:
                pool.unpin(int(s))
        keys = jax.vmap(jax.random.PRNGKey)(
            jnp.arange(it + 1, it + 1 + k_now))
        return k_now, (pool_img, pool_lab, batches), keys

    return build_input
