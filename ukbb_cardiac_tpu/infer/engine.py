"""Batched segmentation inference engine.

Replaces the reference's per-frame ``sess.run`` loop
(``common/deploy_network.py:103-116``) with a single jitted forward over
the whole (Z*T)-slice batch of a cine, chunked to bound HBM footprint.

TPU-native design:
- **Static shapes**: spatial dims pad exactly like the reference (centred,
  to a multiple of 16, ``deploy_network.py:97-100``) so voxel outputs are
  parity-comparable; the batch dim pads up to a fixed chunk size so every
  chunk reuses one compiled program.
- **One compile per (chunk, X2, Y2)**: compiled executables are cached on
  the engine; all subjects with the same padded shape share them.
- **Device-side argmax**: only the int8 ``pred`` ships back to host unless
  probabilities are requested (prob is ~n_class x the bytes).
- bfloat16 compute is available via ``compute_dtype`` (conv accumulation
  stays f32 — see ``models/layers.py``); default f32 for checkpoint parity.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ukbb_cardiac_tpu.infer import transfer
from ukbb_cardiac_tpu.models import fcn as fcn_mod
from ukbb_cardiac_tpu.models import unet as unet_mod


@dataclass
class SegmentationModel:
    """A deployable slice-segmentation model: pure forward + weights.

    ``forward(params, state, images)`` maps (N, X, Y, C) float images to
    logits (N, X, Y, n_class); ``params``/``state`` are pytrees.
    """

    forward: Callable
    params: dict
    state: dict
    n_class: int
    in_ch: int = 1

    @staticmethod
    def from_fcn(params, state, names, cfg: fcn_mod.FCNConfig,
                 compute_dtype=jnp.float32) -> "SegmentationModel":
        def forward(p, s, images):
            logits, _ = fcn_mod.apply_fcn(p, s, names, cfg, images, train=False,
                                          compute_dtype=compute_dtype)
            return logits
        return SegmentationModel(forward, params, state, cfg.n_class, cfg.in_ch)

    @staticmethod
    def from_resnet(params, state, names, cfg,
                    compute_dtype=jnp.float32) -> "SegmentationModel":
        def forward(p, s, images):
            logits, _ = fcn_mod.apply_resnet(p, s, names, cfg, images,
                                             train=False,
                                             compute_dtype=compute_dtype)
            return logits
        return SegmentationModel(forward, params, state, cfg.n_class, cfg.in_ch)

    @staticmethod
    def from_unet(params, state, names, cfg: unet_mod.UNetConfig,
                  compute_dtype=jnp.float32) -> "SegmentationModel":
        def forward(p, s, images):
            logits, _, _ = unet_mod.apply_unet(p, s, names, cfg, images,
                                               train=False,
                                               compute_dtype=compute_dtype)
            return logits
        return SegmentationModel(forward, params, state, cfg.n_class, cfg.in_ch)


class PendingSegmentation:
    """Handle for an in-flight fused cine segmentation.

    Dispatch is asynchronous: the device owns a packed-label array that
    may still be computing/transferring.  ``result()`` blocks on the
    device→host fetch and unpacks to (X, Y, Z, T) uint8 labels.  Keeping
    several handles in flight pipelines H2D, compute and D2H of
    different cines — the deploy loop reads and dispatches the next
    subject while the previous one drains (the reference's per-frame
    ``sess.run`` loop is fully synchronous, ``deploy_network.py:103-116``).
    """

    def __init__(self, packed_dev, out_shape, bits: int, stats=None):
        self._packed = packed_dev
        self._shape = tuple(out_shape)
        self._bits = bits
        self._stats = stats

    def result(self) -> np.ndarray:
        import time

        from ukbb_cardiac_tpu import native

        t0 = time.perf_counter()
        packed = np.asarray(self._packed)  # blocks until ready
        if self._stats is not None:
            # wall blocked here includes any compute still in flight —
            # an upper bound on the pure D2H time (bench.py measures
            # the pure link rate separately with a re-fetch)
            self._stats.record_d2h(packed.nbytes,
                                   time.perf_counter() - t0)
        n = int(np.prod(self._shape))
        # single-pass C++ unpack (numpy fallback inside): the numpy
        # expression materialised a (bytes, 8/bits) temporary plus two
        # copies per cine — measurable on the 1-core cohort host
        return native.unpack_bits(packed, self._bits, n).reshape(self._shape)


def pad_stack_to_multiple(stack: np.ndarray, n: int):
    """Pad a leading subject axis up to a multiple of ``n`` by cycling the
    existing subjects (works when the stack is SMALLER than ``n``, unlike
    a plain ``stack[:pad_n]`` slice).  Returns (padded, original_count)."""
    S = stack.shape[0]
    if S == 0:
        raise ValueError("empty subject stack: nothing to pad or cycle")
    pad_n = (-S) % n
    if pad_n:
        reps = -(-pad_n // S)
        extra = np.concatenate([stack] * reps, axis=0)[:pad_n]
        stack = np.concatenate([stack, extra], axis=0)
    return stack, S


def pad_to_factor(X: int, Y: int, factor: int = 16):
    """Centred padding amounts to make X, Y multiples of ``factor``
    (mirrors ``deploy_network.py:97-100`` exactly).  Thin shim over
    :func:`ukbb_cardiac_tpu.ops.crop.pad_to_multiple` — one source for
    the deploy-critical padding arithmetic."""
    from ukbb_cardiac_tpu.ops.crop import pad_to_multiple

    x_pre, x_post, y_pre, y_post = pad_to_multiple(X, Y, factor)
    return (x_pre, x_post), (y_pre, y_post)


class InferenceEngine:
    """Chunked, shape-bucketed jit executor for slice segmentation.

    Parameters
    ----------
    model : SegmentationModel
    chunk : batch chunk size (slices per device program). 64 keeps the
        full-resolution multiscale concat (~160ch at 192x208) under ~2 GB.
    pad_factor : spatial padding multiple (16 = FCN's 2^(n_level-1)).
    """

    def __init__(self, model: SegmentationModel, chunk: int = 64,
                 pad_factor: int = 16):
        self.model = model
        self.chunk = chunk
        self.pad_factor = pad_factor
        self._compiled = {}
        # Observed H2D bandwidth (EMA); drives the adaptive lossless
        # packing of the cine up-leg (see infer/transfer.py)
        self._bw = transfer.BandwidthTracker()
        # Cumulative byte/time accounting for the bench artifact
        self._stats = transfer.TransferStats()
        # Weights go to device once, not per call.
        self._params = jax.device_put(model.params)
        self._state = jax.device_put(model.state)

    def _fn(self, shape, want_prob: bool):
        key = (shape, want_prob)
        if key not in self._compiled:
            forward = self.model.forward

            @partial(jax.jit)
            def run(params, state, images):
                logits = forward(params, state, images)
                pred = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
                if want_prob:
                    return jax.nn.softmax(logits, axis=-1), pred
                return pred

            self._compiled[key] = run
        return self._compiled[key]

    def run_slices(self, slices: np.ndarray, want_prob: bool = False):
        """Segment a stack of 2D slices.

        slices: (N, X, Y) or (N, X, Y, C) float array, already intensity-
        normalised. X, Y need not be padded; padding/cropping is handled
        here. Returns pred (N, X, Y) uint8, and prob (N, X, Y, n_class)
        float32 if requested.
        """
        slices = np.asarray(slices, dtype=np.float32)
        if slices.ndim == 3:
            slices = slices[..., None]
        N, X, Y = slices.shape[:3]
        (x_pre, x_post), (y_pre, y_post) = pad_to_factor(X, Y, self.pad_factor)
        padded = np.pad(slices, ((0, 0), (x_pre, x_post), (y_pre, y_post), (0, 0)))

        preds = []
        probs = []
        for i in range(0, N, self.chunk):
            block = padded[i:i + self.chunk]
            n = block.shape[0]
            if n < self.chunk:
                block = np.pad(block, ((0, self.chunk - n), (0, 0), (0, 0), (0, 0)))
            out = self._fn(block.shape, want_prob)(self._params, self._state,
                                                   jnp.asarray(block))
            if want_prob:
                prob, pred = out
                probs.append(np.asarray(prob[:n]))
                preds.append(np.asarray(pred[:n]))
            else:
                preds.append(np.asarray(out[:n]))

        pred = np.concatenate(preds, axis=0)
        pred = pred[:, x_pre:x_pre + X, y_pre:y_pre + Y]
        if want_prob:
            prob = np.concatenate(probs, axis=0)
            prob = prob[:, x_pre:x_pre + X, y_pre:y_pre + Y]
            return pred, prob
        return pred

    def segment_sequence(self, image: np.ndarray, want_prob: bool = False):
        """Segment a full 4D cine (X, Y, Z, T) in one batched pass.

        The reference loops t over T with a per-frame device round-trip
        (``deploy_network.py:103-116``); here all Z*T slices form one
        batch.  Returns seg (X, Y, Z, T) uint8 (+ prob (X,Y,Z,T,n_class)).
        """
        X, Y, Z, T = image.shape
        # (X, Y, Z, T) -> (Z*T, X, Y): frame-major order t, then slice z.
        slices = np.transpose(image, (3, 2, 0, 1)).reshape(T * Z, X, Y)
        out = self.run_slices(slices, want_prob)
        if want_prob:
            pred, prob = out
            seg = np.transpose(pred.reshape(T, Z, X, Y), (2, 3, 1, 0))
            prob4 = np.transpose(prob.reshape(T, Z, X, Y, -1), (2, 3, 1, 0, 4))
            return seg, prob4
        return np.transpose(out.reshape(T, Z, X, Y), (2, 3, 1, 0))

    # -- fused device path --------------------------------------------------
    # The whole deploy pipeline (percentile rescale, pad, batch, forward,
    # argmax, crop, label bit-packing) as ONE jitted program: a single
    # host→device transfer of the raw cine and a single device→host
    # transfer of 2-bit-packed labels.  The tunnel d2h path is the
    # bottleneck on this setup (~25 MB/s), so packing 4 voxels/byte is a
    # direct 4x on the dominant cost.

    # One piece per cine when possible: in the tunnel's degraded mode
    # (see DESIGN.md) each additional transfer costs ~0.25 s of fixed
    # overhead, dominating any size effect.
    _H2D_PIECE_BYTES = 128 * 1024 * 1024

    def _pack_bits(self):
        n = self.model.n_class
        return 2 if n <= 4 else (4 if n <= 16 else 8)

    def _cine_fns(self, cine_shape, n_pieces, rescale):
        """Three small jitted stages (prep → chunked forward → pack) with
        device-resident intermediates.  A single monolithic jit of the
        whole pipeline compiles pathologically slowly (~10 min: the
        percentile sort + 500-slice conv graph blow up XLA's scheduling),
        while these compile in seconds and run at the same steady-state
        speed — intermediates never leave HBM.

        ``n_pieces``: an int for the raw path (pieces are contiguous
        X-slabs), or a :class:`transfer.PackPlan` for the packed up-leg
        (degraded-tunnel mode; ONE uint8 buffer) — prep then starts with
        the exact device-side reconstruction to the original int dtype."""
        key = ("cine", cine_shape, n_pieces, rescale)
        if key not in self._compiled:
            X, Y, Z, T = cine_shape
            (x_pre, x_post), (y_pre, y_post) = pad_to_factor(X, Y, self.pad_factor)
            N = T * Z
            # don't pad a short cine up to a full chunk (a 50-slice LA cine
            # would waste 60% of the compute at chunk=125); cap at the next
            # multiple of 8 for TPU sublane alignment
            chunk = min(self.chunk, -(-N // 8) * 8)
            nc = -(-N // chunk)
            bits = self._pack_bits()
            per_byte = 8 // bits
            from ukbb_cardiac_tpu.ops import (normalise_intensity_jax,
                                              rescale_intensity_jax)

            plan = n_pieces if isinstance(n_pieces, transfer.PackPlan) \
                else None

            @jax.jit
            def prep(*pieces):
                # pieces split along X (axis 0): contiguous host slabs →
                # full-bandwidth transfers (a T-axis split would need a
                # strided host copy ~20x slower than the transfer itself)
                # keep the cine's own dtype into the intensity op: int16
                # input (UKB cines ship untouched) takes the 16-round
                # percentile fast path; both ops return f32
                if plan is not None:
                    cine = transfer.unpack_jax(pieces[0], plan)
                else:
                    cine = jnp.concatenate(pieces, axis=0)
                if rescale == "percentile":
                    cine = rescale_intensity_jax(cine, (1.0, 99.0))
                elif rescale == "zscore":
                    cine = normalise_intensity_jax(cine, 10.0)
                else:
                    cine = cine.astype(jnp.float32)
                cine = jnp.pad(cine, ((x_pre, x_post), (y_pre, y_post),
                                      (0, 0), (0, 0)))
                slices = jnp.transpose(cine, (3, 2, 0, 1)).reshape(
                    N, X + x_pre + x_post, Y + y_pre + y_post, 1)
                slices = jnp.pad(slices, ((0, nc * chunk - N), (0, 0),
                                          (0, 0), (0, 0)))
                return slices.reshape((nc, chunk) + slices.shape[1:])

            # one chunk per dispatch: compiles ~6x faster than a lax.map
            # over all chunks, runs at the same speed (host dispatch is
            # async and ~1ms against a ~25ms chunk).  The chunk forward is
            # the SHARED self._fn program — keyed by the padded chunk
            # shape, so subjects whose Z/T differ but pad to the same
            # in-plane grid reuse one network compile.
            chunk_shape = (chunk, X + x_pre + x_post, Y + y_pre + y_post, 1)
            fwd_chunk = self._fn(chunk_shape, want_prob=False)

            def fmap(params, state, chunks):
                preds = [fwd_chunk(params, state, chunks[i])
                         for i in range(nc)]
                return jnp.stack(preds)

            @jax.jit
            def pack(preds):
                preds = preds.reshape((nc * chunk,) + preds.shape[2:])[:N]
                preds = preds[:, x_pre:x_pre + X, y_pre:y_pre + Y]
                seg = jnp.transpose(preds.reshape(T, Z, X, Y), (2, 3, 1, 0))
                flat = seg.reshape(-1)
                pad_n = (-flat.shape[0]) % per_byte
                flat = jnp.pad(flat, (0, pad_n)).reshape(-1, per_byte)
                shifts = jnp.arange(per_byte, dtype=jnp.uint8) * bits
                return jnp.sum(
                    flat.astype(jnp.uint32) << shifts.astype(jnp.uint32),
                    axis=-1).astype(jnp.uint8)

            def run(params, state, *pieces):
                return pack(fmap(params, state, prep(*pieces)))

            self._compiled[key] = run
        return self._compiled[key]

    def _split_pieces(self, image: np.ndarray, host_only: bool = False):
        """Transfer a raw cine to device as contiguous X-slabs.

        Returns (pieces, shape): device arrays plus the original (X,Y,Z,T).
        Exposed separately so callers (e.g. ``bench.py``'s device-compute
        estimator) can pin the input on device once and re-dispatch the
        compiled pipeline without re-paying host→device transfers.
        ``host_only``: return the numpy slab views instead of device
        arrays (the dispatcher then times the first transfer itself).
        """
        # transfer in the array's own dtype (demo NIfTIs are int16 — half
        # the bytes of f32, and the device percentile takes its 16-round
        # integer fast path); the device program ends up f32 after the
        # intensity op
        if image.dtype not in (np.float32, np.int16, np.uint16, np.uint8,
                               np.int8, np.int32):
            image = image.astype(np.float32)
        image = np.ascontiguousarray(image)
        X, Y, Z, T = image.shape
        # split along X (axis 0): slabs are contiguous views of the input,
        # so each transfer runs at full tunnel bandwidth with no host copy
        row_bytes = Y * Z * T * image.dtype.itemsize
        rows_per_piece = max(1, self._H2D_PIECE_BYTES // row_bytes)
        bounds = list(range(0, X, rows_per_piece)) + [X]
        make = (lambda a: a) if host_only else jnp.asarray
        pieces = [make(image[a:b])
                  for a, b in zip(bounds[:-1], bounds[1:])]
        return pieces, (X, Y, Z, T)

    def segment_sequence_dispatch(self, image: np.ndarray,
                                  rescale: str = "percentile"
                                  ) -> PendingSegmentation:
        """Asynchronously dispatch a fused cine segmentation.

        Returns a :class:`PendingSegmentation`; call ``result()`` for the
        labels.  Dispatching several cines before resolving any lets the
        runtime overlap their transfers and compute.

        When the observed H2D bandwidth is degraded (tunnel slow mode)
        and the cine is non-negative <=12-bit integer data, the up-leg
        ships packed into ONE uint8 buffer (plane-split, or temporal-
        delta when the planner prices it cheaper) — exactly
        reconstructed on device, so labels are bit-identical to the raw
        path (tests/test_transfer.py) while moving 25-50% fewer bytes
        in ONE transfer (each extra transfer costs ~0.25 s fixed in the
        tunnel's degraded mode).
        """
        image = np.ascontiguousarray(image)
        plan = transfer.plan_pack(image, self._bw) if image.ndim == 4 \
            else None
        if plan is None:
            host_pieces, shape = self._split_pieces(image, host_only=True)
            self._stats.record_h2d(image.nbytes, image.nbytes, None)
            pieces = transfer.dispatch_sampled(host_pieces, self._bw)
            meta = len(pieces)
        else:
            shape = plan.shape
            pieces = transfer.pack_and_dispatch(image, plan, self._bw,
                                                self._stats)
            meta = plan
        fn = self._cine_fns(shape, meta, rescale)
        packed = fn(self._params, self._state, *pieces)
        return PendingSegmentation(packed, shape, self._pack_bits(),
                                   stats=self._stats)

    def segment_sequence_fused(self, image: np.ndarray,
                               rescale: str = "percentile") -> np.ndarray:
        """Rescale + segment a raw cine (X, Y, Z, T) as one device program.

        ``rescale``: 'percentile' (deploy_network.py:89), 'zscore'
        (deploy_network_ao.py:94) or 'none' (already normalised).
        Returns seg (X, Y, Z, T) uint8.
        """
        return self.segment_sequence_dispatch(image, rescale).result()

    def make_sharded_forward(self, mesh, axis: str = "data"):
        """Build a mesh-sharded slice forward: (N, X, Y, 1) with N sharded
        over ``axis``, params replicated — fleet-mode inference where the
        slice batch of many subjects spans chips (SURVEY.md §2.4(a)).
        XLA partitions the convs; no collectives are needed in the forward
        so scaling is embarrassingly parallel over ICI-attached chips.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        shard = NamedSharding(mesh, P(axis))
        forward = self.model.forward

        @partial(jax.jit, in_shardings=(repl, repl, shard),
                 out_shardings=shard)
        def run(params, state, images):
            logits = forward(params, state, images)
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

        return run

    def make_sharded_cine_forward(self, mesh, cine_shape, rescale="percentile",
                                  axis: str = "data"):
        """Fused fleet inference: S same-shape raw cines sharded over chips.

        The full deploy pipeline (per-subject percentile/z-score rescale,
        centred pad, batched forward, argmax) runs as ONE sharded program
        with the subject axis partitioned on ``axis`` — each chip owns
        whole subjects, so there are no halo exchanges and scaling over
        ICI is embarrassingly parallel (SURVEY.md §2.4(a): the reference's
        scale-out story is the user hand-sharding subject ranges over
        processes, ``eval_strain_sax.py:26-34``).

        Returns ``run(params, state, cines)`` mapping (S, X, Y, Z, T) raw
        cines to (S, X, Y, Z, T) uint8 labels; S must divide by the mesh
        axis size.  Use :meth:`segment_subjects_sharded` for the
        host-array convenience wrapper.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        X, Y, Z, T = cine_shape
        (x_pre, x_post), (y_pre, y_post) = pad_to_factor(X, Y, self.pad_factor)
        Xp, Yp = X + x_pre + x_post, Y + y_pre + y_post
        forward = self.model.forward
        repl = NamedSharding(mesh, P())
        shard = NamedSharding(mesh, P(axis))
        from ukbb_cardiac_tpu.ops import (normalise_intensity_jax,
                                          rescale_intensity_jax)

        @partial(jax.jit, in_shardings=(repl, repl, shard),
                 out_shardings=shard)
        def run(params, state, cines):
            # raw dtype into the intensity ops (int16 → 16-round
            # percentile fast path); both return f32
            x = cines
            if rescale == "percentile":
                x = jax.vmap(lambda c: rescale_intensity_jax(c, (1.0, 99.0)))(x)
            elif rescale == "zscore":
                x = jax.vmap(lambda c: normalise_intensity_jax(c, 10.0))(x)
            else:
                x = x.astype(jnp.float32)
            x = jnp.pad(x, ((0, 0), (x_pre, x_post), (y_pre, y_post),
                            (0, 0), (0, 0)))
            S = x.shape[0]
            slices = jnp.transpose(x, (0, 4, 3, 1, 2)).reshape(
                S * T * Z, Xp, Yp, 1)
            logits = forward(params, state, slices)
            pred = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
            pred = pred[:, x_pre:x_pre + X, y_pre:y_pre + Y]
            return jnp.transpose(pred.reshape(S, T, Z, X, Y),
                                 (0, 3, 4, 2, 1))

        return run

    def segment_subjects_sharded(self, images: np.ndarray, mesh,
                                 rescale: str = "percentile",
                                 axis: str = "data") -> np.ndarray:
        """Segment a stack of S same-shape raw cines (S, X, Y, Z, T) with
        subjects sharded over the mesh.  Returns (S, X, Y, Z, T) uint8.
        S need not divide the mesh axis (or even reach it) — the stack
        pads up by cycling subjects; the padding is sliced off the
        result."""
        images, S = pad_stack_to_multiple(np.asarray(images),
                                          mesh.shape[axis])
        key = ("fleet", images.shape, rescale, mesh, axis)
        if key not in self._compiled:
            self._compiled[key] = self.make_sharded_cine_forward(
                mesh, images.shape[1:], rescale, axis)
        run = self._compiled[key]
        out = np.asarray(run(self._params, self._state, jnp.asarray(images)))
        return out[:S]

    def segment_volume(self, volume: np.ndarray, want_prob: bool = False):
        """Segment a 3D volume (X, Y, Z) slice-wise. Returns (X, Y, Z)."""
        X, Y, Z = volume.shape
        slices = np.transpose(volume, (2, 0, 1))
        out = self.run_slices(slices, want_prob)
        if want_prob:
            pred, prob = out
            return np.transpose(pred, (1, 2, 0)), np.transpose(prob, (1, 2, 0, 3))
        return np.transpose(out, (1, 2, 0))
