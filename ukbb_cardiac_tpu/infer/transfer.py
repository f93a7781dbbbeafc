"""Adaptive lossless host→device transfer packing.

The deploy engines ship raw int16 cines to the device (UKB DICOM
convention; ``common/deploy_network.py:80-89`` reads them with nibabel
and feeds float straight into ``sess.run``).  On a directly-attached
TPU the transfer is negligible; through this environment's tunnel the
H2D link oscillates between ~1.3 GB/s and ~40 MB/s (measured), and in
the degraded mode the up-leg dominates the whole per-cine wall clock
(BENCH_r03: 0.98 s of a 1.09 s SAX deploy).

Bytes are the only lever the software controls, so: **plane-split
lossless packing**.  A non-negative int16 cine with max < 2^(8+h)
splits into a low byte (pure truncating cast — ~5 ms for a 20M-voxel
cine on this 1-core host) and an h-bit high plane packed 8/h values per
byte (~35 ms).  Real UKB cines are 12-bit DICOM (h=4 → 25% fewer
bytes); typical windowed data is 10-bit (h=2 → 37.5% fewer).  The
device reconstructs exactly: integer shift-or, so voxel outputs are
bit-identical to the raw path (pinned by tests/test_transfer.py).

Packing costs host CPU, so it only pays when the link is slow; the
:class:`BandwidthTracker` keeps an EMA of observed H2D bandwidth (one
sample per dispatch, from blocking on the first piece — the pieces
serialise through one tunnel, so piece 0's latency is a clean sample)
and the engines pack only below ``PACK_BELOW_MBPS``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

# Pack below this observed H2D bandwidth: at >=400 MB/s a 40 MB cine
# moves in <100 ms and the ~45 ms single-core pack would be pure
# overhead; at the degraded ~40 MB/s it saves ~250-370 ms per cine.
PACK_BELOW_MBPS = 400.0
# Piece size while packing: small enough that packing piece i+1
# overlaps the (network-bound) transfer of piece i, large enough that
# per-transfer fixed overhead stays negligible (measured: <=4 pieces of
# a 40 MB cine add no overhead; 16 pieces double the wall).
PACK_PIECE_BYTES = 10 * 1024 * 1024


@dataclass(frozen=True)
class PackPlan:
    """Static description of a plane-split packed transfer (hashable —
    part of the compiled-program cache key)."""

    shape: tuple          # original array shape
    dtype: str            # original dtype str, e.g. '<i2'
    hi_bits: int          # high-plane width: 0 (pure uint8), 2 or 4
    bounds: tuple         # flat voxel boundaries of the pieces

    @property
    def n_pieces(self) -> int:
        return len(self.bounds) - 1


class BandwidthTracker:
    """EMA of observed host→device bandwidth (MB/s); None until the
    first sample.  0.5 weighting: recovers from the tunnel's mode flips
    (and from the first-transfer session-setup penalty) in ~2 samples."""

    # Sampling means blocking the dispatching thread on one piece's
    # transfer, which stops it from pipelining the next cine's host-side
    # pack under this one's transfer — so sample at most this often.
    SAMPLE_EVERY_S = 2.0

    def __init__(self):
        self.mbps: Optional[float] = None
        self._last_sample_t = 0.0

    def want_sample(self) -> bool:
        import time

        return time.monotonic() - self._last_sample_t >= self.SAMPLE_EVERY_S

    def update(self, n_bytes: int, seconds: float) -> None:
        import time

        self._last_sample_t = time.monotonic()
        if seconds <= 0 or n_bytes <= 0:
            return
        sample = n_bytes / 1e6 / seconds
        self.mbps = sample if self.mbps is None else (
            0.5 * self.mbps + 0.5 * sample)

    @property
    def degraded(self) -> bool:
        """Unknown bandwidth counts as degraded: a process that
        dispatches once (single-subject deploy CLI) should get the
        packed up-leg if the tunnel happens to be slow; if it is fast,
        the ~45 ms pack is noise."""
        return self.mbps is None or self.mbps < PACK_BELOW_MBPS


_TOUCH_CACHE = {}


def touch(dev):
    """Force materialisation of a dispatched host→device array.

    On the axon backend ``jnp.asarray``/``device_put`` is lazy: the
    transfer does not start until a computation consumes the array, so
    without this (a) host-side packing of piece i+1 cannot overlap the
    transfer of piece i, and (b) blocking on the array returns
    immediately and reads as infinite bandwidth.  A trivial jitted
    reduction (scalar out, ~1 ms for a 10 MB piece) makes the transfer
    eager; block on the returned scalar to time the transfer.
    """
    import jax

    key = (dev.shape, str(dev.dtype))
    fn = _TOUCH_CACHE.get(key)
    if fn is None:
        fn = jax.jit(lambda x: jnp.sum(x.astype(jnp.int32)) if
                     np.issubdtype(np.dtype(dev.dtype), np.integer)
                     else jnp.sum(x))
        _TOUCH_CACHE[key] = fn
    return fn(dev)


def dispatch_sampled(arrs, bw: Optional[BandwidthTracker]) -> List:
    """``jnp.asarray`` each host array in order; on the first piece (if
    the tracker's throttle allows) time a :func:`touch` round trip as the
    bandwidth sample.

    Blocking on the dispatched array itself is NOT a valid sample on this
    backend: ``block_until_ready`` can return at transport handoff
    (measured: a 3 MB piece "transfers" in 0.12 ms = 25 GB/s), which
    would read a degraded tunnel as fast and wrongly disable packing.
    The touch reduction's scalar can only come back after the bytes
    actually landed, so its latency bounds the true link rate.  The
    first sample per piece shape pays the touch program's ~0.7 s compile
    and reads slow — that biases toward packing once, which is lossless
    and ~45 ms of host work: harmless.
    """
    import threading
    import time

    sample = bw is not None and bw.want_sample()
    out = []
    for arr in arrs:
        dev = jnp.asarray(arr)
        if sample:
            sample = False
            # stamp at sample START so concurrent dispatches during the
            # (possibly slow) resolve don't all decide to sample too
            bw._last_sample_t = time.monotonic()
            t0 = time.perf_counter()
            handle = touch(dev)

            def _resolve(handle=handle, nbytes=dev.nbytes, t0=t0):
                handle.block_until_ready()
                bw.update(nbytes, time.perf_counter() - t0)

            # resolve the sample OFF the dispatching thread: blocking
            # here (0.4 s on a degraded link) would stall the pipeline
            # stage this dispatch is feeding — the sample's only
            # consumer is the NEXT dispatch's pack decision
            threading.Thread(target=_resolve, daemon=True).start()
        out.append(dev)
    return out


def pack_and_dispatch(image: np.ndarray, plan: Optional[PackPlan],
                      bw: Optional[BandwidthTracker]) -> List:
    """Dispatch a cine to device: raw (plan None → single piece) or
    plane-split packed.  Packing is lazy per piece, so the host packs
    piece i+1 while the (network-bound) transport moves piece i."""
    if plan is None:
        return dispatch_sampled([image], bw)
    flat = image.reshape(-1)
    return dispatch_sampled(
        (a for i in range(plan.n_pieces) for a in pack_piece(flat, plan, i)),
        bw)


def plan_pack(image: np.ndarray, bw: Optional[BandwidthTracker]
              ) -> Optional[PackPlan]:
    """Decide whether/how to pack ``image`` for transfer.

    Returns a :class:`PackPlan`, or None for the raw path (fast link,
    non-integer dtype, negative values, or >12-bit range).
    """
    if bw is not None and not bw.degraded:
        return None
    dt = image.dtype
    if dt == np.uint8 or dt.kind not in "iu" or dt.itemsize > 2:
        return None
    mn = int(image.min())
    if mn < 0:
        return None
    mx = int(image.max())
    if mx < 256:
        hi_bits = 0
    elif mx < 1024:
        hi_bits = 2
    elif mx < 4096:
        hi_bits = 4
    else:
        return None
    n = int(np.prod(image.shape))
    per = max(8, (PACK_PIECE_BYTES // 8) * 8)  # voxels, 8-aligned
    bounds = list(range(0, n, per)) + [n]
    # merge a tiny tail piece into its neighbour
    if len(bounds) > 2 and bounds[-1] - bounds[-2] < per // 4:
        del bounds[-2]
    return PackPlan(tuple(image.shape), dt.str, hi_bits, tuple(bounds))


def _pack_hi(hi: np.ndarray, hi_bits: int) -> np.ndarray:
    """Pack a uint8 high plane at ``hi_bits`` per value (length must be
    a multiple of 8/hi_bits is NOT required — pads internally)."""
    per = 8 // hi_bits
    pad = (-hi.size) % per
    if pad:
        hi = np.concatenate([hi, np.zeros(pad, np.uint8)])
    hi = hi.reshape(-1, per)
    out = hi[:, 0].copy()
    for j in range(1, per):
        out |= hi[:, j] << (hi_bits * j)
    return out


def pack_piece(image_flat: np.ndarray, plan: PackPlan, i: int
               ) -> List[np.ndarray]:
    """Pack piece ``i`` of the flat array: [lo_u8] or [lo_u8, hi_packed]."""
    a, b = plan.bounds[i], plan.bounds[i + 1]
    piece = image_flat[a:b]
    if plan.hi_bits and piece.dtype in (np.int16, np.uint16):
        # one-pass native pack (int16 is the UKB cine dtype; the planner
        # only packs values < 4096, so a uint16 view as int16 is exact)
        from ukbb_cardiac_tpu import native

        packed = native.pack_lo_hi_i16(piece.view(np.int16), plan.hi_bits)
        if packed is not None:
            return list(packed)
    lo = piece.astype(np.uint8)  # truncating cast == & 0xFF
    if plan.hi_bits == 0:
        return [lo]
    hi = (piece >> 8).astype(np.uint8)
    return [lo, _pack_hi(hi, plan.hi_bits)]


def packed_nbytes(plan: PackPlan) -> int:
    """Total bytes a packed transfer ships (for bandwidth accounting)."""
    n = plan.bounds[-1]
    if plan.hi_bits == 0:
        return n
    return n + -(-n * plan.hi_bits // 8)


def unpack_jax(arrs: Sequence, plan: PackPlan):
    """Device-side exact reconstruction: the jnp twin of
    :func:`pack_piece` over all pieces.  Returns the original-shape
    array in the original (integer) dtype — downstream intensity ops
    keep their int16 percentile fast path."""
    per_piece = 1 if plan.hi_bits == 0 else 2
    los, his = [], []
    for i in range(plan.n_pieces):
        los.append(arrs[per_piece * i])
        if per_piece == 2:
            his.append(arrs[per_piece * i + 1])
    lo = jnp.concatenate(los)
    x = lo.astype(jnp.int32)
    if plan.hi_bits:
        per = 8 // plan.hi_bits
        mask = (1 << plan.hi_bits) - 1
        shifts = jnp.arange(per, dtype=jnp.uint8) * plan.hi_bits
        n = plan.bounds[-1]
        hi = jnp.concatenate(his)
        hi = ((hi[:, None] >> shifts) & mask).reshape(-1)[:n]
        x = x | (hi.astype(jnp.int32) << 8)
    return x.astype(np.dtype(plan.dtype)).reshape(plan.shape)
