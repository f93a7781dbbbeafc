"""Cross-check the native C++ JPEG decoders against the independent
Python reference implementation (data/jpegcodec.py).

Two implementations of each spec (encoder+decoder in Python, decoder in
C++) written separately from ITU-T T.81 Annex H / T.87; bit-exact
agreement on random and structured images pins both.
"""

import numpy as np
import pytest

from ukbb_cardiac_tpu import native
from ukbb_cardiac_tpu.data import jpegcodec as jc

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native hostops unavailable")


def _images():
    rng = np.random.RandomState(42)
    y, x = np.mgrid[0:48, 0:56]
    smooth = np.clip(3000 * np.exp(-((x - 28) ** 2 + (y - 24) ** 2) / 300.0)
                     + rng.randn(48, 56) * 30, 0, 4095).astype(np.uint16)
    smooth[:5] = 0
    return [
        (smooth, 12),
        (rng.randint(0, 65536, (23, 31)).astype(np.uint16), 16),
        (np.full((9, 40), 123, np.uint16), 8),
        (np.tile(np.array([0, 4095], np.uint16), (7, 13)), 12),
        (rng.randint(0, 256, (1, 64)).astype(np.uint16), 8),
        (rng.randint(0, 1024, (64, 1)).astype(np.uint16), 10),
    ]


def test_native_sof3_matches_python():
    for img, P in _images():
        blob = jc.encode_jpeg_lossless(img, P)
        got = native.jpeg_sof3_decode(blob, img.size)
        np.testing.assert_array_equal(got, img, err_msg=f"P={P}")
        np.testing.assert_array_equal(got, jc.decode_jpeg_lossless(blob))


def test_native_sof3_all_predictors():
    img, P = _images()[0]
    for sv in range(1, 8):
        blob = jc.encode_jpeg_lossless(img, P, sv=sv)
        np.testing.assert_array_equal(
            native.jpeg_sof3_decode(blob, img.size), img, err_msg=f"sv={sv}")


def test_native_jpegls_matches_python():
    for img, P in _images():
        blob = jc.encode_jpegls(img, P)
        got = native.jpegls_decode(blob, img.size)
        np.testing.assert_array_equal(got, img, err_msg=f"P={P}")
        np.testing.assert_array_equal(got, jc.decode_jpegls(blob))


def test_native_jpegls_near_lossless():
    img, P = _images()[0]
    blob = jc.encode_jpegls(img, P, near=2)
    got = native.jpegls_decode(blob, img.size)
    # near-lossless reconstruction must match the Python decoder EXACTLY
    np.testing.assert_array_equal(got, jc.decode_jpegls(blob))
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 2


def test_native_rejects_malformed():
    with pytest.raises(jc.JpegDecodeError):
        native.jpeg_sof3_decode(b"\xff\xd8\xff\xc0\x00\x04\x00\x00", 100)
    with pytest.raises(jc.JpegDecodeError):
        native.jpegls_decode(b"not a jpeg", 100)


def test_native_output_capacity_retry():
    """A too-small expected_pixels hint falls back to header-sized output."""
    img, P = _images()[0]
    blob = jc.encode_jpegls(img, P)
    got = native.jpegls_decode(blob, expected_pixels=4)
    np.testing.assert_array_equal(got, img)


def test_native_sof3_honors_table_selector():
    """A stream with TWO Huffman tables (SOS selects id 0; id 1 appears
    last) must decode with the selected table — the native decoder
    previously kept whichever table was parsed last (round-3 review)."""
    img = (np.arange(35, dtype=np.uint16) % 200).reshape(5, 7)
    data = bytearray(jc.encode_jpeg_lossless(img, 8))
    # craft a second, DIFFERENT table with id 1: one 1-bit code for
    # category 0 (valid but wrong for this scan)
    bits = [0] * 16
    bits[0] = 1
    dht1 = bytes([0x01]) + bytes(bits) + bytes([0])
    seg = b"\xff\xc4" + (len(dht1) + 2).to_bytes(2, "big") + dht1
    sos = bytes(data).rfind(b"\xff\xda")
    patched = bytes(data[:sos]) + seg + bytes(data[sos:])
    np.testing.assert_array_equal(jc.decode_jpeg_lossless(patched), img)
    got = native.jpeg_sof3_decode(patched, img.size)
    np.testing.assert_array_equal(got, img)
