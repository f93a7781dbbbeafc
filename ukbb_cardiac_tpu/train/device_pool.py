"""HBM-resident cine pool: train on device-gathered time windows.

The reference's aortic trainer slices each sampled circular time window
on the host and feeds it per step (``train_network_ao.py:163-187``), so
every window's frames cross host→device every iteration — and a frame
near an annotated time crosses up to ``time_window`` times as windows
overlap, every epoch, forever.  The TPU-native inversion: keep the
normalised cines IN HBM (a fixed-slot pool), ship each cine ONCE on
first touch, and let the jitted train step gather the (window, frame)
indices from the pool — steady-state H2D shrinks from megabytes of
pixels per dispatch to a few hundred bytes of int32 indices.

Design constraints this module encodes:

- **Snapshot semantics, no donation.**  Uploading into a donated pool
  buffer invalidates every live reference to it (measured; JAX deletes
  all aliases of a donated array), and batches already emitted to the
  prefetch queue hold the pool version their indices were drawn
  against.  Uploads therefore COPY (``dynamic_update_slice`` on an
  undonated operand): an upload returns a fresh array, in-flight
  snapshots stay valid, and eviction can never corrupt a queued batch —
  the batch gathers from its own snapshot.  The copy costs one
  pool-sized HBM pass per *subject first-touch* (not per step) and a
  transient 2x pool footprint, which the ``pool_gb`` budget caps.
- **Static shapes.**  One (n_slots, t_max, X, Y) image pool (f16 — the
  same precision as the trainers' ``compact_transfer``) and one uint8
  label pool; ``t_max`` comes from a header-only scan of the dataset
  (``io.nifti.read_shape``), so the step compiles once.
- **Pinning.**  A window buffered by the sampler but not yet snapshotted
  pins its slot; eviction picks the LRU *unpinned* slot and raises a
  sizing error if none exists (the pool must hold at least one
  dispatch-chunk's working set of distinct subjects).
"""

from __future__ import annotations

import collections
import threading

import jax
import jax.numpy as jnp
import numpy as np
import optax


class DeviceCinePool:
    """Fixed-slot device pool of (image f16, label uint8) cines.

    ``ensure(key, make_host)`` returns the slot holding ``key``'s cine,
    uploading via ``make_host() -> (img_txy, lab_txy)`` on first touch
    (arrays shaped (T, X, Y) with T <= t_max; padded here).  ``pin`` /
    ``unpin`` protect slots referenced by not-yet-snapshotted windows.
    ``snapshot()`` returns the current (img, lab) device arrays — an
    immutable view batches gather from.  Thread-safe (the trainers'
    prefetch worker draws concurrently with the main loop).
    """

    def __init__(self, n_slots: int, t_max: int, x: int, y: int,
                 img_dtype=jnp.float16, sharding=None):
        """``sharding``: optional ``NamedSharding`` for the pool arrays —
        pass a replicated spec (``P()``) for mesh data-parallel training
        so every chip holds the pool and the sharded step's per-shard
        gathers are local; uploads then broadcast each cine once."""
        if n_slots < 1:
            raise ValueError("n_slots must be >= 1")
        self.n_slots = int(n_slots)
        self.t_max = int(t_max)
        self.shape_xy = (int(x), int(y))
        self._img = jnp.zeros((n_slots, t_max, x, y), img_dtype)
        self._lab = jnp.zeros((n_slots, t_max, x, y), jnp.uint8)
        if sharding is not None:
            self._img = jax.device_put(self._img, sharding)
            self._lab = jax.device_put(self._lab, sharding)
        self._slot_of = collections.OrderedDict()  # key -> slot, LRU order
        self._key_of = {}                          # slot -> key
        self._pins = collections.Counter()         # slot -> refcount
        self._free = list(range(n_slots - 1, -1, -1))
        self._lock = threading.Lock()
        self.uploads = 0
        self.hits = 0

        def _upload(img_pool, lab_pool, img, lab, slot):
            img_pool = jax.lax.dynamic_update_slice(
                img_pool, img[None], (slot, 0, 0, 0))
            lab_pool = jax.lax.dynamic_update_slice(
                lab_pool, lab[None], (slot, 0, 0, 0))
            return img_pool, lab_pool

        # NO donation: snapshots held by queued batches must survive
        # (see module docstring).  ``slot`` is a traced scalar so every
        # upload reuses one compiled program.  With a sharding, pinning
        # the pool operands/results to it keeps uploads from silently
        # collapsing the pool onto one device.
        if sharding is None:
            self._upload = jax.jit(_upload)
        else:
            self._upload = jax.jit(
                _upload,
                in_shardings=(sharding, sharding, None, None, None),
                out_shardings=(sharding, sharding))

    @property
    def nbytes(self) -> int:
        return self._img.nbytes + self._lab.nbytes

    def snapshot(self):
        with self._lock:
            return self._img, self._lab

    def pin(self, slot: int, n: int = 1):
        with self._lock:
            self._pins[slot] += n

    def unpin(self, slot: int, n: int = 1):
        with self._lock:
            self._pins[slot] -= n
            if self._pins[slot] <= 0:
                del self._pins[slot]

    def ensure(self, key, make_host) -> int:
        """Slot of ``key``'s cine, uploading on first touch (LRU evict)."""
        with self._lock:
            slot = self._slot_of.get(key)
            if slot is not None:
                self._slot_of.move_to_end(key)
                self.hits += 1
                return slot
        # Host decode outside the lock (can be slow: gzip inflate).
        img, lab = make_host()
        t = img.shape[0]
        if t > self.t_max or img.shape[1:] != self.shape_xy:
            raise ValueError(
                f"cine shape {img.shape} exceeds pool slot "
                f"({self.t_max}, {self.shape_xy}) — rebuild the pool")
        if t < self.t_max:
            pad = ((0, self.t_max - t), (0, 0), (0, 0))
            img = np.pad(img, pad)
            lab = np.pad(lab, pad)
        img = np.asarray(img, np.float16)
        lab = np.asarray(lab, np.uint8)
        with self._lock:
            slot = self._slot_of.get(key)
            if slot is not None:  # raced with another thread's upload
                self._slot_of.move_to_end(key)
                return slot
            if self._free:
                slot = self._free.pop()
            else:
                slot = None
                for k, s in self._slot_of.items():  # LRU-first order
                    if s not in self._pins:
                        slot = s
                        del self._slot_of[k]
                        del self._key_of[s]
                        break
                if slot is None:
                    raise RuntimeError(
                        "DeviceCinePool: every slot is pinned by queued "
                        "windows — the pool cannot hold one dispatch "
                        "chunk's working set.  Increase pool_gb, or "
                        "reduce batch_windows/steps_per_dispatch.")
            self._img, self._lab = self._upload(
                self._img, self._lab, img, lab, jnp.int32(slot))
            self._slot_of[key] = slot
            self._key_of[slot] = key
            self.uploads += 1
            return slot


def _gather_slices(flat_img, flat_lab, ib, t_max):
    """SA gather: (slot, z) index pairs -> {(B, X, Y, 1), (B, X, Y)}."""
    fi = ib["slot"] * t_max + ib["zidx"]
    return {"image": flat_img[fi][..., None], "label": flat_lab[fi]}


def _gather_windows(flat_img, flat_lab, ib, t_max):
    """Aortic gather: (slot, tidx, lidx) -> {(B, TW, X, Y, 1),
    (B, TW, X, Y)}.  ``tidx`` are the circular window frames, ``lidx``
    the label frames (the window itself when a densely propagated label
    exists, the annotated centre repeated otherwise —
    ``train_network_ao.py:181-187`` semantics)."""
    fi = ib["slot"][:, None] * t_max + ib["tidx"]
    li = ib["slot"][:, None] * t_max + ib["lidx"]
    return {"image": flat_img[fi][..., None], "label": flat_lab[li]}


def _make_pool_multi_step(loss_fn, optimizer, gather):
    """The ONE K-step scan body all four pool steps share: flatten the
    pool snapshot, ``gather`` each step's pixel batch from it by index,
    and run loss/grad/update under ``lax.scan``.  The slice/window and
    single-device/mesh variants below differ ONLY in the gather and in
    the jit shardings — keeping one body means a fix here cannot
    diverge the paths."""

    def multi_step(params, state, opt_state, pool_img, pool_lab, batches,
                   keys):
        n_slots, t_max = pool_img.shape[0], pool_img.shape[1]
        flat_img = pool_img.reshape((n_slots * t_max,) + pool_img.shape[2:])
        flat_lab = pool_lab.reshape((n_slots * t_max,) + pool_lab.shape[2:])

        def body(carry, xs):
            params, state, opt_state = carry
            ib, key = xs
            batch = gather(flat_img, flat_lab, ib, t_max)
            (loss, (aux, new_state)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, state, batch, key)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_state, opt_state), (loss, aux)

        (params, state, opt_state), (losses, auxes) = jax.lax.scan(
            body, (params, state, opt_state), (batches, keys))
        last_aux = jax.tree.map(lambda a: a[-1], auxes)
        return params, state, opt_state, losses, last_aux

    return multi_step


def _dp_shardings(mesh, axis, idx_specs):
    """(in_shardings, out_shardings) for a mesh-DP pool step: everything
    replicated except the index batches, which shard over ``axis`` on
    their batch dimension (dim 1 of (K, B, ...))."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    idx = {k: NamedSharding(mesh, P(*spec)) for k, spec in idx_specs.items()}
    return ((repl, repl, repl, repl, repl, idx, repl),
            (repl, repl, repl, repl, repl))


def make_pool_slice_multi_step(loss_fn, optimizer: optax.GradientTransformation):
    """K-step scan dispatch whose batches are (slot, z-index) pairs
    gathered from a :class:`DeviceCinePool` snapshot on device — the SA
    trainer's twin of :func:`make_pool_window_multi_step` (the pool's
    ``t_max`` axis holds SLICES of a subject-frame volume rather than
    frames of a cine).

    ``batches``: {"slot": (K, B) int32, "zidx": (K, B) int32}.  The
    gather builds the exact {"image": (B, X, Y, 1) f16, "label":
    (B, X, Y) uint8} batch the host slice-pool sampler would have
    shipped (``train.sa.make_slice_pool_sampler`` with
    ``compact_transfer``), so ``loss_fn`` (``train.sa.make_fcn_loss``)
    is reused unchanged.  Steady-state H2D is 8 bytes per slice.
    """
    return jax.jit(_make_pool_multi_step(loss_fn, optimizer,
                                         _gather_slices))


def make_pool_slice_multi_dp_step(loss_fn,
                                  optimizer: optax.GradientTransformation,
                                  mesh, axis: str = "data"):
    """Mesh data-parallel :func:`make_pool_slice_multi_step`.

    The pool arrays are REPLICATED over the mesh (build the
    :class:`DeviceCinePool` with ``sharding=NamedSharding(mesh, P())``)
    and the (K, B) index batches are sharded over ``axis`` on B — each
    chip gathers its batch shard from its own pool replica locally, and
    the only collective is the per-step ICI gradient all-reduce GSPMD
    derives from the shardings (``train/steps.py`` pattern).  Uploads
    broadcast each subject once; steady-state H2D stays bytes of
    indices.
    """
    in_sh, out_sh = _dp_shardings(mesh, axis,
                                  {"slot": (None, axis),
                                   "zidx": (None, axis)})
    return jax.jit(_make_pool_multi_step(loss_fn, optimizer,
                                         _gather_slices),
                   in_shardings=in_sh, out_shardings=out_sh)


def make_pool_window_multi_step(loss_fn, optimizer: optax.GradientTransformation):
    """K-step scan dispatch whose batches are (slot, frame-index) tuples
    gathered from a :class:`DeviceCinePool` snapshot on device.

    ``batches``: {"slot": (K, B) int32, "tidx": (K, B, TW) int32,
    "lidx": (K, B, TW) int32} (see :func:`_gather_windows`).  The gather
    builds the exact {"image": (B, TW, X, Y, 1) f16, "label":
    (B, TW, X, Y) uint8} batch the host window samplers would have
    shipped, so ``loss_fn`` (``train.ao.make_ao_loss``) is reused
    unchanged.

    Returns ``step(params, state, opt_state, pool_img, pool_lab,
    batches, keys) -> (params, state, opt_state, losses[K], last_aux)``.
    """
    return jax.jit(_make_pool_multi_step(loss_fn, optimizer,
                                         _gather_windows))


def make_pool_window_multi_dp_step(loss_fn,
                                   optimizer: optax.GradientTransformation,
                                   mesh, axis: str = "data"):
    """Mesh data-parallel :func:`make_pool_window_multi_step`: pool
    replicated over the mesh, (K, B[, TW]) index batches sharded over
    ``axis`` on B — the aortic twin of
    :func:`make_pool_slice_multi_dp_step`."""
    in_sh, out_sh = _dp_shardings(mesh, axis,
                                  {"slot": (None, axis),
                                   "tidx": (None, axis, None),
                                   "lidx": (None, axis, None)})
    return jax.jit(_make_pool_multi_step(loss_fn, optimizer,
                                         _gather_windows),
                   in_shardings=in_sh, out_shardings=out_sh)
