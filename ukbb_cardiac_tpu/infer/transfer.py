"""Adaptive lossless host→device transfer packing + link telemetry.

The deploy engines ship raw int16 cines to the device (UKB DICOM
convention; ``common/deploy_network.py:80-89`` reads them with nibabel
and feeds float straight into ``sess.run``).  On a directly-attached
TPU the transfer is negligible; through this environment's tunnel the
H2D link oscillates between ~1.3 GB/s and ~40 MB/s (measured), and in
the degraded mode the up-leg dominates the whole per-cine wall clock
(BENCH_r03: 0.98 s of a 1.09 s SAX deploy).

Bytes AND transfer count are the levers the software controls:

- **Plane-split lossless packing.**  A non-negative int16 cine with
  max < 2^(8+h) splits into a low byte (pure truncating cast) and an
  h-bit high plane packed 8/h values per byte.  Real UKB cines are
  12-bit DICOM (h=4 → 25% fewer bytes); typical windowed data is
  10-bit (h=2 → 37.5% fewer).
- **Temporal-delta mode.**  Cine frames are temporally redundant, so
  the planner also prices frame-0 + zigzag(Δt) at their own plane
  widths (device reconstructs by cumsum — bit-exact) and picks the
  cheaper encoding.  Measured on the bench SAX phantom (MRI-realistic
  noise σ≈50) deltas need MORE bits than the raw values (moving edges
  set the max; noise floors the low byte), so delta engages only on
  quiet data where it genuinely wins — see DESIGN.md round 5.
- **One buffer, one transfer.**  All planes land in a SINGLE uint8
  buffer shipped as one ``jnp.asarray``: in the tunnel's degraded mode
  each transfer carries ~0.25 s of fixed overhead, so the round-4
  pieces×planes layout (4 transfers/cine) cost ~0.75 s more than its
  byte savings bought back.  Packing is one native pass (~45 ms for a
  40 MB cine on this 1-core host) — cheap against one saved transfer.

The device reconstructs exactly — integer shift-or (+ cumsum for
delta), so voxel outputs are bit-identical to the raw path (pinned by
tests/test_transfer.py).

Packing costs host CPU, so it only pays when the link is slow; the
:class:`BandwidthTracker` keeps an EMA of observed H2D bandwidth and
the engines pack only below ``PACK_BELOW_MBPS``.  :class:`TransferStats`
accumulates bytes/seconds per direction so the bench artifact can show
wall = f(bandwidth) arithmetic (VERDICT r4 #1).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

# Pack below this observed H2D bandwidth: at >=400 MB/s a 40 MB cine
# moves in <100 ms and the ~45 ms single-core pack would be pure
# overhead; at the degraded ~40 MB/s it saves ~250-370 ms per cine.
PACK_BELOW_MBPS = 400.0
# Delta mode must beat plane mode by at least this byte ratio to engage
# (covers its extra host pass computing the diffs).
DELTA_MIN_SAVING = 0.92


@dataclass(frozen=True)
class PackPlan:
    """Static description of a packed transfer (hashable — part of the
    compiled-program cache key).

    mode 'plane': every value plane-split at width 8+hi_bits.
    mode 'delta': frame-0 section (prod(shape[:-1]) values at width
    8+f0_hi_bits) followed by zigzag temporal deltas (at 8+hi_bits);
    the device reconstructs with an exact int32 cumsum along the last
    axis.
    """

    shape: tuple          # original array shape (..., T)
    dtype: str            # original dtype str, e.g. '<i2'
    mode: str             # 'plane' | 'delta'
    hi_bits: int          # main-section high-plane width: 0, 2 or 4
    f0_hi_bits: int = 0   # delta mode: frame-0 section width

    @property
    def n(self) -> int:
        return int(np.prod(self.shape))

    @property
    def m(self) -> int:
        """Voxels per frame (delta mode's frame-0 section length)."""
        return int(np.prod(self.shape[:-1]))

    def sections(self):
        """[(length, hi_bits), ...] in buffer order."""
        if self.mode == "plane":
            return [(self.n, self.hi_bits)]
        return [(self.m, self.f0_hi_bits),
                (self.n - self.m, self.hi_bits)]


def _section_nbytes(k: int, hi_bits: int) -> int:
    return k + ((k * hi_bits + 7) // 8 if hi_bits else 0)


def packed_nbytes(plan: PackPlan) -> int:
    """Total bytes a packed transfer ships (for bandwidth accounting)."""
    return sum(_section_nbytes(k, h) for k, h in plan.sections())


def _width_for(mx: int) -> Optional[int]:
    """hi_bits for non-negative values bounded by ``mx``; None if the
    data exceeds the 12-bit packable range."""
    if mx < 256:
        return 0
    if mx < 1024:
        return 2
    if mx < 4096:
        return 4
    return None


class BandwidthTracker:
    """EMA of observed host→device bandwidth (MB/s); None until the
    first sample.  0.5 weighting: recovers from the tunnel's mode flips
    (and from the first-transfer session-setup penalty) in ~2 samples."""

    # Sampling means blocking the dispatching thread on one transfer,
    # which stops it from pipelining the next cine's host-side pack
    # under this one's transfer — so sample at most this often.
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


@dataclass
class TransferStats:
    """Cumulative transfer accounting (bench artifact: VERDICT r4 #1 —
    bytes shipped + observed bandwidth per direction, so a wall-clock
    regression is attributable from the artifact alone)."""

    h2d_bytes: int = 0         # bytes actually shipped up
    h2d_raw_bytes: int = 0     # bytes the unpacked path would have shipped
    h2d_dispatches: int = 0
    packed_dispatches: int = 0
    delta_dispatches: int = 0
    d2h_bytes: int = 0         # packed label bytes fetched
    d2h_seconds: float = 0.0   # wall blocked in fetches (incl. compute wait)
    d2h_fetches: int = 0

    def record_h2d(self, shipped: int, raw: int, plan) -> None:
        self.h2d_bytes += shipped
        self.h2d_raw_bytes += raw
        self.h2d_dispatches += 1
        if plan is not None:
            self.packed_dispatches += 1
            if plan.mode == "delta":
                self.delta_dispatches += 1

    def record_d2h(self, n_bytes: int, seconds: float) -> None:
        self.d2h_bytes += n_bytes
        self.d2h_seconds += seconds
        self.d2h_fetches += 1

    def snapshot(self, bw: Optional[BandwidthTracker] = None) -> dict:
        out = {
            "h2d_bytes": self.h2d_bytes,
            "h2d_raw_bytes": self.h2d_raw_bytes,
            "h2d_dispatches": self.h2d_dispatches,
            "packed_dispatches": self.packed_dispatches,
            "delta_dispatches": self.delta_dispatches,
            "d2h_bytes": self.d2h_bytes,
            "d2h_seconds": round(self.d2h_seconds, 3),
            "d2h_fetches": self.d2h_fetches,
        }
        if bw is not None and bw.mbps is not None:
            out["h2d_mbps_ema"] = round(bw.mbps, 1)
        return out


_TOUCH_CACHE = {}


def touch(dev):
    """Force materialisation of a dispatched host→device array.

    On the axon backend ``jnp.asarray``/``device_put`` is lazy: the
    transfer does not start until a computation consumes the array, so
    without this (a) blocking on the array returns immediately and
    reads as infinite bandwidth, and (b) a bandwidth sample would time
    nothing.  A trivial jitted reduction (scalar out, ~1 ms for a 10 MB
    piece) makes the transfer eager; block on the returned scalar to
    time the transfer.
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
    """``jnp.asarray`` each host array in order; on the first one (if
    the tracker's throttle allows) time a :func:`touch` round trip as the
    bandwidth sample.

    Blocking on the dispatched array itself is NOT a valid sample on this
    backend: ``block_until_ready`` can return at transport handoff
    (measured: a 3 MB piece "transfers" in 0.12 ms = 25 GB/s), which
    would read a degraded tunnel as fast and wrongly disable packing.
    The touch reduction's scalar can only come back after the bytes
    actually landed, so its latency bounds the true link rate.  The
    first sample per shape pays the touch program's ~0.7 s compile
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
                      bw: Optional[BandwidthTracker],
                      stats: Optional[TransferStats] = None) -> List:
    """Dispatch a cine to device: raw (plan None) or packed into one
    uint8 buffer → exactly ONE host→device transfer either way (in the
    tunnel's degraded mode every extra transfer costs ~0.25 s fixed)."""
    if plan is None:
        if stats is not None:
            stats.record_h2d(image.nbytes, image.nbytes, None)
        return dispatch_sampled([image], bw)
    buf = pack_buffer(image, plan)
    if stats is not None:
        stats.record_h2d(buf.nbytes, image.nbytes, plan)
    return dispatch_sampled([buf], bw)


def plan_pack(image: np.ndarray, bw: Optional[BandwidthTracker]
              ) -> Optional[PackPlan]:
    """Decide whether/how to pack ``image`` for transfer.

    Returns a :class:`PackPlan`, or None for the raw path (fast link,
    non-integer dtype, negative values, or >12-bit range).  When the
    last axis looks like time (>=8 frames) the temporal-delta encoding
    is priced too and chosen if it ships ``DELTA_MIN_SAVING``× fewer
    bytes than the plane pack.
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
    w = _width_for(mx)
    if w is None:
        return None
    shape = tuple(image.shape)
    plan = PackPlan(shape, dt.str, "plane", w)
    best_bytes = packed_nbytes(plan)
    T = shape[-1] if image.ndim else 1
    if image.ndim >= 2 and T >= 8 and image.size >= (1 << 16):
        # price the temporal-delta encoding: frame 0 at its own width,
        # zigzag deltas at theirs.  Prescreen on a row subsample first
        # (~2% of a cine): the subsample's max only UNDERestimates the
        # true max, so "subsample already needs >= the plane width"
        # safely skips the full pass — on noise-dominated data (the
        # common case, DESIGN.md round 5) this keeps the per-dispatch
        # pricing cost at ~2 ms instead of a full 40 MB pass.
        a = image.reshape(-1, T)
        if a.dtype == np.uint16:
            a = a.view(np.int16)  # exact: planner only packs < 4096
        m = a.shape[0]
        sub = a[::max(1, m // 4096)]
        wd_sub = _delta_width(sub)
        if wd_sub is not None and wd_sub < w:
            wd = _delta_width(a)
            wf0 = _width_for(int(a[:, 0].max()))
            if wd is not None and wd < w and wf0 is not None:
                delta_bytes = (_section_nbytes(m, wf0) +
                               _section_nbytes(image.size - m, wd))
                if delta_bytes < DELTA_MIN_SAVING * best_bytes:
                    plan = PackPlan(shape, dt.str, "delta", wd, wf0)
    return plan


def _delta_width(a16: np.ndarray) -> Optional[int]:
    """Plane width for the zigzag temporal deltas of int16 rows
    (voxels, T); None if they exceed the packable range."""
    d = np.diff(a16, axis=-1)  # int16-exact: values < 4096
    if d.size == 0:
        return 0
    # zigzag(v) is 2v (v>=0) or 2|v|-1 (v<0)
    return _width_for(max(2 * int(d.max()), -2 * int(d.min()) - 1, 0))


def _pack_section_into(vals: np.ndarray, hi_bits: int,
                       out: np.ndarray) -> None:
    """Plane-split ``vals`` (non-negative int16/uint16, flat) into the
    ``out`` uint8 slice: [lo (k)] + [hi packed] when hi_bits > 0."""
    from ukbb_cardiac_tpu import native

    k = vals.size
    vals = np.ascontiguousarray(vals)
    if vals.dtype == np.uint16:
        # planner only packs values < 4096, so an int16 view is exact
        vals = vals.view(np.int16)
    if hi_bits == 0:
        np.copyto(out[:k], vals.astype(np.uint8))  # truncating == exact
        return
    if vals.dtype == np.int16 and native.pack_lo_hi_i16_into(
            vals, hi_bits, out[:k], out[k:]):
        return
    lo = vals.astype(np.uint8)
    hi = (vals >> 8).astype(np.uint8)
    per = 8 // hi_bits
    pad = (-k) % per
    if pad:
        hi = np.concatenate([hi, np.zeros(pad, np.uint8)])
    hi = hi.reshape(-1, per)
    acc = hi[:, 0].copy()
    for j in range(1, per):
        acc |= hi[:, j] << (hi_bits * j)
    np.copyto(out[:k], lo)
    np.copyto(out[k:], acc)


def pack_buffer(image: np.ndarray, plan: PackPlan) -> np.ndarray:
    """Pack the whole array into ONE uint8 buffer per ``plan``."""
    buf = np.empty(packed_nbytes(plan), np.uint8)
    if plan.mode == "plane":
        _pack_section_into(image.reshape(-1), plan.hi_bits, buf)
        return buf
    T = plan.shape[-1]
    a = image.reshape(-1, T)
    if a.dtype == np.uint16:
        a = a.view(np.int16)  # exact: planner only packs < 4096
    f0 = np.ascontiguousarray(a[:, 0])
    d = np.diff(a, axis=-1)  # int16-exact: |d| <= 4095
    zz = ((d << 1) ^ (d >> 15)).reshape(-1)
    o = _section_nbytes(plan.m, plan.f0_hi_bits)
    _pack_section_into(f0, plan.f0_hi_bits, buf[:o])
    _pack_section_into(zz, plan.hi_bits, buf[o:])
    return buf


def _unpack_section_jax(buf, offset: int, k: int, hi_bits: int):
    """Device-side exact inverse of :func:`_pack_section_into` →
    int32 values of length ``k``."""
    x = buf[offset:offset + k].astype(jnp.int32)
    if hi_bits:
        per = 8 // hi_bits
        mask = (1 << hi_bits) - 1
        hs = (k * hi_bits + 7) // 8
        hi = buf[offset + k:offset + k + hs]
        shifts = jnp.arange(per, dtype=jnp.uint8) * hi_bits
        hi = ((hi[:, None] >> shifts) & mask).reshape(-1)[:k]
        x = x | (hi.astype(jnp.int32) << 8)
    return x


def unpack_jax(buf, plan: PackPlan):
    """Device-side exact reconstruction of the single packed buffer.
    Returns the original-shape array in the original (integer) dtype —
    downstream intensity ops keep their int16 percentile fast path."""
    if plan.mode == "plane":
        x = _unpack_section_jax(buf, 0, plan.n, plan.hi_bits)
    else:
        m, T = plan.m, plan.shape[-1]
        o = _section_nbytes(m, plan.f0_hi_bits)
        f0 = _unpack_section_jax(buf, 0, m, plan.f0_hi_bits)
        zz = _unpack_section_jax(buf, o, plan.n - m, plan.hi_bits)
        d = (zz >> 1) ^ -(zz & 1)  # un-zigzag
        x = jnp.concatenate([f0[:, None], d.reshape(m, T - 1)], axis=1)
        x = jnp.cumsum(x, axis=1)  # int32-exact temporal reconstruction
    return x.astype(np.dtype(plan.dtype)).reshape(plan.shape)
