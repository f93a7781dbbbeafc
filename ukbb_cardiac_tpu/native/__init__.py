"""Native host-ops library (C++, ctypes-bound) with numpy fallback.

Builds ``libhostops.so`` on first import (g++ -O3, cached next to the
source).  If the toolchain is unavailable the pure-scipy implementations
in ``ops/cc.py`` are used instead — behaviour is identical, this is a
speed path for the per-frame connected-component loops in QC gates
(SURVEY.md §2.2 QC rows).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "hostops.cc")
_LIB = os.path.join(_HERE, "libhostops.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False
_lock = threading.Lock()


def _build() -> bool:
    # Build to a temp path and os.replace (atomic) so concurrent
    # builders/loaders never see a half-written .so.  Plain -O3, NOT
    # -march=native: a .so cached on shared storage and loaded on a
    # different CPU would SIGILL at call time (dlopen cannot catch it).
    tmp = f"{_LIB}.build.{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", tmp],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB)
        return True
    except (OSError, subprocess.SubprocessError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded library, building it if needed; None if unavailable.
    Thread-safe: run_fleet drives subjects from a thread pool, and an
    unsynchronized first-use build raced g++ against CDLL."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        return _load_locked()


def _load_locked() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    _tried = True
    if not os.path.exists(_LIB) or (os.path.getmtime(_LIB)
                                    < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None

    i8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")

    lib.largest_cc_2d.restype = ctypes.c_int64
    lib.largest_cc_2d.argtypes = [i8p, ctypes.c_int32, ctypes.c_int32,
                                  ctypes.c_int32, i8p]
    lib.count_significant_cc_2d.restype = ctypes.c_int32
    lib.count_significant_cc_2d.argtypes = [i8p, ctypes.c_int32,
                                            ctypes.c_int32, ctypes.c_int32,
                                            ctypes.c_int64]
    lib.remove_small_cc_2d.restype = None
    lib.remove_small_cc_2d.argtypes = [i8p, ctypes.c_int32, ctypes.c_int32,
                                       ctypes.c_int32, ctypes.c_int64, i8p]
    lib.label_areas_per_frame.restype = None
    lib.label_areas_per_frame.argtypes = [i16p, ctypes.c_int64,
                                          ctypes.c_int32, ctypes.c_int32,
                                          i64p]
    lib.dicom_scan.restype = ctypes.c_int64
    lib.dicom_scan.argtypes = [ctypes.c_char_p, ctypes.c_int64, i64p,
                               ctypes.c_int64]
    u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    i32_ref = ctypes.POINTER(ctypes.c_int32)
    for fn in (lib.jpeg_sof3_decode, lib.jpegls_decode):
        fn.restype = ctypes.c_int32
        fn.argtypes = [ctypes.c_char_p, ctypes.c_int64, u16p,
                       ctypes.c_int64, i32_ref, i32_ref]
    lib.unpack_bits.restype = None
    lib.unpack_bits.argtypes = [i8p, ctypes.c_int64, ctypes.c_int32, i8p,
                                ctypes.c_int64]
    lib.pack_lo_hi_i16.restype = None
    lib.pack_lo_hi_i16.argtypes = [i16p, ctypes.c_int64, ctypes.c_int32,
                                   i8p, i8p]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _require_2d(binary: np.ndarray) -> np.ndarray:
    b = np.ascontiguousarray(np.asarray(binary).astype(np.uint8))
    if b.ndim != 2:
        raise ValueError(f"native CC kernels take 2D masks, got shape "
                         f"{b.shape} (use ops/cc.py for 3D — it routes "
                         f"to scipy)")
    return b


def _require_lib():
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native hostops library unavailable (no g++ or "
                           "build failed); guard calls with "
                           "native.available() or use ops/cc.py")
    return lib


def largest_cc_2d(binary: np.ndarray, connectivity: int = 1) -> np.ndarray:
    """Largest connected component (native); binary 2D array → bool mask."""
    lib = _require_lib()
    b = _require_2d(binary)
    ny, nx = b.shape[0], b.shape[1]
    out = np.empty_like(b)
    # the kernel is orientation-agnostic: pass (nx=cols, ny=rows)
    lib.largest_cc_2d(b, np.int32(nx), np.int32(ny), np.int32(connectivity),
                      out)
    return out.astype(bool)


def count_significant_cc_2d(binary: np.ndarray, pixel_thres: int = 10,
                            connectivity: int = 2) -> int:
    lib = _require_lib()
    b = _require_2d(binary)
    ny, nx = b.shape[0], b.shape[1]
    return int(lib.count_significant_cc_2d(
        b, np.int32(nx), np.int32(ny), np.int32(connectivity),
        np.int64(pixel_thres)))


def remove_small_cc_2d(binary: np.ndarray, thres: int = 10,
                       connectivity: int = 1) -> np.ndarray:
    lib = _require_lib()
    b = _require_2d(binary)
    ny, nx = b.shape[0], b.shape[1]
    out = np.empty_like(b)
    lib.remove_small_cc_2d(b, np.int32(nx), np.int32(ny),
                           np.int32(connectivity), np.int64(thres), out)
    return out


def label_areas_per_frame(volume: np.ndarray, n_labels: int) -> np.ndarray:
    """Per-frame per-label voxel counts for an (X, Y, Z, T) int volume.
    Returns (T, n_labels) int64."""
    lib = _require_lib()
    volume = np.asarray(volume)
    if volume.min() < np.iinfo(np.int16).min or \
            volume.max() > np.iinfo(np.int16).max:
        raise ValueError("label values exceed int16 range")
    v = np.ascontiguousarray(
        np.transpose(volume, (3, 0, 1, 2)).astype(np.int16))
    T = v.shape[0]
    frame_voxels = v.size // T
    counts = np.empty((T, n_labels), dtype=np.int64)
    lib.label_areas_per_frame(v.reshape(-1), np.int64(frame_voxels),
                              np.int32(T), np.int32(n_labels),
                              counts.reshape(-1))
    return counts


def _jpeg_decode(fn_name: str, data: bytes, expected_pixels):
    lib = get_lib()
    if lib is None:
        return None
    cap = int(expected_pixels) if expected_pixels else (1 << 22)
    out = np.empty(cap, dtype=np.uint16)
    rows = ctypes.c_int32(0)
    cols = ctypes.c_int32(0)
    rc = getattr(lib, fn_name)(data, np.int64(len(data)), out,
                               np.int64(cap), ctypes.byref(rows),
                               ctypes.byref(cols))
    if rc == -3 and expected_pixels:  # header dims exceed the caller's hint
        return _jpeg_decode(fn_name, data, None)
    if rc == -3:
        # larger than the default working buffer: let the caller fall
        # back to the pure-Python decoder rather than fail the frame
        return None
    if rc != 0:
        from ukbb_cardiac_tpu.data.jpegcodec import JpegDecodeError
        kind = {-1: "malformed", -2: "unsupported"}.get(rc, f"error {rc}")
        raise JpegDecodeError(f"native {fn_name}: {kind} stream")
    return out[:rows.value * cols.value].reshape(rows.value, cols.value)


def jpeg_sof3_decode(data: bytes, expected_pixels=None):
    """Native JPEG lossless (SOF3) decode → (rows, cols) uint16, or None
    when the library is unavailable (callers fall back to
    data/jpegcodec.py).  Raises JpegDecodeError on bad streams."""
    return _jpeg_decode("jpeg_sof3_decode", data, expected_pixels)


def jpegls_decode(data: bytes, expected_pixels=None):
    """Native JPEG-LS decode → (rows, cols) uint16, or None when the
    library is unavailable."""
    return _jpeg_decode("jpegls_decode", data, expected_pixels)


def dicom_scan(buf: bytes):
    """Walk a DICOM byte stream natively; rows (tag_index, offset, length,
    vr_code) for the Biobank attribute subset.  Returns the (k, 4) int64
    array, or None if the stream needs the pure-Python path (unsupported
    transfer syntax / encapsulated pixels / malformed)."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((64, 4), dtype=np.int64)
    k = lib.dicom_scan(buf, np.int64(len(buf)), out.reshape(-1),
                       np.int64(out.shape[0]))
    if k < 0:
        return None
    return out[:k]


def unpack_bits(packed: np.ndarray, bits: int, n: int) -> np.ndarray:
    """Unpack ``bits``-wide fields (low field first) from a uint8 byte
    array into ``n`` uint8 values — the host-side inverse of the deploy
    engines' device-side label pack (``infer/engine.py``).  Native
    single-pass kernel when the library is available; vectorised numpy
    otherwise (identical output, ~4x the memory traffic)."""
    if bits not in (1, 2, 4):
        raise ValueError(f"bits must be 1, 2 or 4, got {bits}")
    packed = np.ascontiguousarray(packed, dtype=np.uint8).reshape(-1)
    per = 8 // bits
    if n > packed.size * per:
        raise ValueError(f"{packed.size} packed bytes hold at most "
                         f"{packed.size * per} values, asked for {n}")
    lib = get_lib()
    if lib is not None:
        out = np.empty(n, dtype=np.uint8)
        lib.unpack_bits(packed, np.int64(packed.size), np.int32(bits),
                        out, np.int64(n))
        return out
    shifts = np.arange(per, dtype=np.uint8) * bits
    mask = (1 << bits) - 1
    unpacked = (packed[:, None] >> shifts) & mask
    return unpacked.reshape(-1)[:n].astype(np.uint8)


def pack_lo_hi_i16(piece: np.ndarray, hi_bits: int):
    """One-pass plane-split pack of a non-negative int16 array:
    (lo_u8, hi_packed_u8) with the high bytes packed ``hi_bits`` per
    value (the H2D transfer pack, ``infer/transfer.py``).  Returns None
    when the native library is unavailable (caller uses its numpy path)."""
    lib = get_lib()
    if lib is None:
        return None
    if hi_bits not in (1, 2, 4):
        raise ValueError(f"hi_bits must be 1, 2 or 4, got {hi_bits}")
    piece = np.ascontiguousarray(piece, dtype=np.int16).reshape(-1)
    per = 8 // hi_bits
    lo = np.empty(piece.size, dtype=np.uint8)
    hi = np.empty(-(-piece.size // per), dtype=np.uint8)
    lib.pack_lo_hi_i16(piece, np.int64(piece.size), np.int32(hi_bits),
                       lo, hi)
    return lo, hi


def pack_lo_hi_i16_into(piece: np.ndarray, hi_bits: int,
                        lo_out: np.ndarray, hi_out: np.ndarray) -> bool:
    """:func:`pack_lo_hi_i16` writing straight into caller-provided
    uint8 slices (the single-buffer transfer layout, infer/transfer.py —
    zero extra copies).  ``lo_out`` must hold ``piece.size`` bytes and
    ``hi_out`` at least ``ceil(size*hi_bits/8)``; both must be
    contiguous views (slices of one contiguous buffer are).  Returns
    False when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    if hi_bits not in (1, 2, 4):
        raise ValueError(f"hi_bits must be 1, 2 or 4, got {hi_bits}")
    piece = np.ascontiguousarray(piece, dtype=np.int16).reshape(-1)
    n = piece.size
    if (lo_out.dtype != np.uint8 or hi_out.dtype != np.uint8
            or not lo_out.flags.c_contiguous
            or not hi_out.flags.c_contiguous
            or lo_out.size < n or hi_out.size < (n * hi_bits + 7) // 8):
        raise ValueError("pack_lo_hi_i16_into: bad output buffers")
    lib.pack_lo_hi_i16(piece, np.int64(n), np.int32(hi_bits),
                       lo_out, hi_out)
    return True
