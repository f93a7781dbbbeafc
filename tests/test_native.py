"""Native host-ops: correctness vs scipy and fallback behaviour."""

import numpy as np
import pytest
from scipy import ndimage

from ukbb_cardiac_tpu import native
from ukbb_cardiac_tpu.ops import cc


@pytest.mark.skipif(not native.available(), reason="toolchain unavailable")
def test_native_matches_scipy():
    rng = np.random.RandomState(0)
    for density in (0.3, 0.5, 0.7):
        b = rng.rand(48, 56) > density
        # largest CC (4-connectivity)
        lab, n = ndimage.label(b)
        if n:
            areas = np.bincount(lab.ravel())[1:]
            ref = lab == (np.argmax(areas) + 1)
        else:
            ref = np.zeros_like(b)
        np.testing.assert_array_equal(native.largest_cc_2d(b, 1), ref)
        # significant-CC count (8-connectivity)
        s = ndimage.generate_binary_structure(2, 2)
        lab8, n8 = ndimage.label(b, structure=s)
        ref_count = int(np.sum(np.bincount(lab8.ravel())[1:] > 10)) if n8 else 0
        assert native.count_significant_cc_2d(b, 10, 2) == ref_count
        # remove-small (4-connectivity)
        ref_rm = b.copy()
        if n:
            small = np.bincount(lab.ravel()) < 10
            small[0] = False
            ref_rm[small[lab]] = 0
        np.testing.assert_array_equal(
            native.remove_small_cc_2d(b, 10, 1).astype(bool), ref_rm)


def test_ops_cc_fallback(monkeypatch):
    """ops.cc works identically with the native path disabled."""
    rng = np.random.RandomState(1)
    b = rng.rand(32, 32) > 0.5
    with_native = (cc.get_largest_cc(b), cc.count_significant_cc(b),
                   cc.remove_small_cc(b))
    monkeypatch.setattr(native, "available", lambda: False)
    without = (cc.get_largest_cc(b), cc.count_significant_cc(b),
               cc.remove_small_cc(b))
    np.testing.assert_array_equal(with_native[0], without[0])
    assert with_native[1] == without[1]
    np.testing.assert_array_equal(np.asarray(with_native[2], dtype=bool),
                                  np.asarray(without[2], dtype=bool))


@pytest.mark.skipif(not native.available(), reason="toolchain unavailable")
def test_label_areas_per_frame():
    rng = np.random.RandomState(2)
    vol = rng.randint(0, 4, (10, 12, 2, 5)).astype(np.int16)
    counts = native.label_areas_per_frame(vol, 4)
    assert counts.shape == (5, 4)
    for t in range(5):
        for k in range(4):
            assert counts[t, k] == np.sum(vol[:, :, :, t] == k)


def test_dicom_scan_matches_pure_python(tmp_path):
    """Native DICOM scanner parity with the pure-Python parser on an
    explicit-VR file (with a nested undefined-length SQ), an implicit-VR
    raw dataset, and pixel-data round-trip."""
    import struct

    from ukbb_cardiac_tpu import native
    from ukbb_cardiac_tpu.data.dicom import (_dcmread_pure, dcmread,
                                             dcmwrite_minimal)

    if not native.available():
        import pytest
        pytest.skip("native toolchain unavailable")

    # explicit-VR file through the writer
    pixel = (np.arange(16 * 20) % 251).astype(np.int16).reshape(16, 20)
    attrs = {"Rows": 16, "Columns": 20, "BitsAllocated": 16,
             "PixelRepresentation": 1, "PixelSpacing": [1.8, 1.8],
             "ImagePositionPatient": [1.0, 2.0, 3.0],
             "ImageOrientationPatient": [1, 0, 0, 0, 1, 0],
             "TriggerTime": 123.5, "CardiacNumberOfImages": 50,
             "InstanceNumber": 7, "SeriesInstanceUID": "1.2.3.4",
             "SeriesDescription": "CINE_segmented_SAX_b1"}
    p1 = str(tmp_path / "explicit.dcm")
    dcmwrite_minimal(p1, attrs, pixel)
    # inject an undefined-length SQ before the dataset body to exercise
    # the skip logic in both parsers
    raw = open(p1, "rb").read()
    meta_end = raw.index(b"DICM") + 4
    # find end of group-0002 meta (first tag with group != 0x0002)
    pos = meta_end
    while pos + 8 <= len(raw):
        group, = struct.unpack_from("<H", raw, pos)
        if group != 0x0002:
            break
        vr = raw[pos + 4:pos + 6]
        if vr in (b"OB", b"OW", b"OF", b"SQ", b"UT", b"UN"):
            ln, = struct.unpack_from("<I", raw, pos + 8)
            pos += 12 + ln
        else:
            ln, = struct.unpack_from("<H", raw, pos + 6)
            pos += 8 + ln
    sq = bytearray()
    sq.extend(struct.pack("<HH", 0x0008, 0x1140))       # ReferencedImageSeq
    sq.extend(b"SQ\x00\x00")
    sq.extend(struct.pack("<I", 0xFFFFFFFF))            # undefined length
    sq.extend(struct.pack("<HHI", 0xFFFE, 0xE000, 0xFFFFFFFF))  # item, undef
    sq.extend(struct.pack("<HH", 0x0008, 0x1155))       # nested UI element
    sq.extend(b"UI")
    sq.extend(struct.pack("<H", 4))
    sq.extend(b"9.9\x00")
    sq.extend(struct.pack("<HHI", 0xFFFE, 0xE00D, 0))   # item delimiter
    sq.extend(struct.pack("<HHI", 0xFFFE, 0xE0DD, 0))   # sequence delimiter
    patched = raw[:pos] + bytes(sq) + raw[pos:]
    p2 = str(tmp_path / "explicit_sq.dcm")
    open(p2, "wb").write(patched)

    for path in (p1, p2):
        buf = open(path, "rb").read()
        via_native = dcmread(path)          # native path (available)
        via_pure = _dcmread_pure(buf)
        assert via_native._attrs.keys() == via_pure._attrs.keys()
        for k in via_pure._attrs:
            if k == "PixelData":
                assert via_native._attrs[k] == via_pure._attrs[k]
            else:
                assert via_native._attrs[k] == via_pure._attrs[k], k
        np.testing.assert_array_equal(via_native.pixel_array, pixel)

    # implicit-VR raw dataset (no preamble)
    body = bytearray()

    def put(group, elem, raw_v):
        if len(raw_v) % 2:
            raw_v += b"\x00"
        body.extend(struct.pack("<HHI", group, elem, len(raw_v)))
        body.extend(raw_v)

    put(0x0018, 0x1090, b"50")
    put(0x0028, 0x0010, struct.pack("<H", 16))
    put(0x0028, 0x0011, struct.pack("<H", 20))
    p3 = str(tmp_path / "implicit.dcm")
    open(p3, "wb").write(bytes(body))
    d_native = dcmread(p3)
    d_pure = _dcmread_pure(bytes(body))
    assert d_native._attrs == d_pure._attrs
    assert int(d_native.CardiacNumberOfImages) == 50


def test_dicom_scan_truncated_never_crashes(tmp_path):
    """Truncating a DICOM stream at every byte offset must yield a clean
    result (rows or None), never a crash/overread — guards the bounds
    checks in hostops.cc's long-VR length reads (dicom_scan, the file-meta
    loop, and dicom_skip_undefined)."""
    import struct

    from ukbb_cardiac_tpu import native
    from ukbb_cardiac_tpu.data.dicom import dcmwrite_minimal

    if not native.available():
        pytest.skip("native toolchain unavailable")

    pixel = np.zeros((4, 4), dtype=np.int16)
    attrs = {"Rows": 4, "Columns": 4, "BitsAllocated": 16,
             "PixelRepresentation": 1, "SeriesInstanceUID": "1.2.3"}
    p = str(tmp_path / "t.dcm")
    dcmwrite_minimal(p, attrs, pixel)
    raw = bytearray(open(p, "rb").read())
    # splice in an undefined-length SQ with a nested long-VR (OB) element so
    # the truncation sweep also walks dicom_skip_undefined's long-VR branch
    sq = bytearray()
    sq.extend(struct.pack("<HH", 0x0008, 0x1140))
    sq.extend(b"SQ\x00\x00")
    sq.extend(struct.pack("<I", 0xFFFFFFFF))
    sq.extend(struct.pack("<HHI", 0xFFFE, 0xE000, 0xFFFFFFFF))
    sq.extend(struct.pack("<HH", 0x0008, 0x1155))
    sq.extend(b"OB\x00\x00")
    sq.extend(struct.pack("<I", 4))
    sq.extend(b"abcd")
    sq.extend(struct.pack("<HHI", 0xFFFE, 0xE00D, 0))
    sq.extend(struct.pack("<HHI", 0xFFFE, 0xE0DD, 0))
    raw = raw[:0x84 + 0] + raw[0x84:]  # no-op; keep preamble explicit
    full = bytes(raw[:len(raw) // 2]) + bytes(sq) + bytes(raw[len(raw) // 2:])
    for n in range(len(full) + 1):
        res = native.dicom_scan(full[:n])
        assert res is None or res.ndim == 2


def test_remove_small_cc_preserves_values_native_and_scipy():
    """Both backends must preserve the input's voxel values in kept
    components (the reference copies the input, image_utils.py:244)."""
    from ukbb_cardiac_tpu import native
    from ukbb_cardiac_tpu.ops import remove_small_cc

    mask = np.zeros((20, 20), np.uint8)
    mask[2:12, 2:12] = 3      # big component, value 3
    mask[15:17, 15:17] = 3    # small component (4 px < thres)
    out = remove_small_cc(mask, thres=10)
    assert out.dtype == mask.dtype
    assert set(np.unique(out)) == {0, 3}, np.unique(out)
    assert np.all(out[2:12, 2:12] == 3) and np.all(out[15:17, 15:17] == 0)


def test_native_cc_rejects_non_2d():
    """The CC kernels take 2D masks only — a 3D mask must raise, not be
    silently flattened into one raster line (which merged components
    across row/slice boundaries)."""
    from ukbb_cardiac_tpu import native

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    with np.testing.assert_raises(ValueError):
        native.largest_cc_2d(np.ones((4, 4, 2), np.uint8))
    with np.testing.assert_raises(ValueError):
        native.remove_small_cc_2d(np.ones((4, 4, 2), np.uint8))


def test_label_areas_per_frame_rejects_out_of_range():
    from ukbb_cardiac_tpu import native

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    vol = np.zeros((4, 4, 1, 2), np.int32)
    vol[0, 0, 0, 0] = 40000  # outside int16
    with np.testing.assert_raises(ValueError):
        native.label_areas_per_frame(vol, 3)


def test_dicom_scan_declines_when_table_overflows():
    """>64 wanted-tag occurrences must return None (decline to the
    pure-Python parser), not silently truncate — PixelData comes last in
    a stream and would be the first thing silently lost."""
    import struct

    from ukbb_cardiac_tpu import native

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    # raw implicit-VR-LE dataset (no preamble): 70 valid Rows elements —
    # a well-formed stream whose wanted-tag count exceeds the 64-row table
    el = struct.pack("<HHI", 0x0028, 0x0010, 2) + struct.pack("<H", 7)
    stream = el * 70
    assert native.dicom_scan(stream) is None
    # just below the cap the scanner still handles it
    assert native.dicom_scan(el * 60).shape == (60, 4)


def test_unpack_bits_matches_numpy_fallback():
    """Native single-pass unpack == the vectorised numpy fallback == the
    original values, for every supported field width (the deploy
    engines' packed-label readback depends on this exactness)."""
    import numpy as np

    from ukbb_cardiac_tpu import native

    rng = np.random.RandomState(0)
    for bits in (1, 2, 4):
        per = 8 // bits
        for n in (1, 7, 8, 12345):
            vals = rng.randint(0, 1 << bits, size=n).astype(np.uint8)
            pad = (-n) % per
            v = np.concatenate([vals, np.zeros(pad, np.uint8)])
            v = v.reshape(-1, per)
            packed = np.zeros(v.shape[0], np.uint8)
            for j in range(per):
                packed |= v[:, j] << (bits * j)
            out = native.unpack_bits(packed, bits, n)
            assert out.dtype == np.uint8
            np.testing.assert_array_equal(out, vals)
    # numpy fallback (library forced away) gives the same bytes
    import unittest.mock as mock
    vals = rng.randint(0, 4, size=1001).astype(np.uint8)
    v = np.concatenate([vals, np.zeros((-1001) % 4, np.uint8)]).reshape(-1, 4)
    packed = np.zeros(v.shape[0], np.uint8)
    for j in range(4):
        packed |= v[:, j] << (2 * j)
    with mock.patch.object(native, "get_lib", return_value=None):
        out = native.unpack_bits(packed, 2, 1001)
    np.testing.assert_array_equal(out, vals)
