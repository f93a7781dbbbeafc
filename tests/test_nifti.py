"""Round-trip and header tests for the pure-numpy NIfTI reader/writer."""

import numpy as np
import pytest

from ukbb_cardiac_tpu.io import nifti


@pytest.mark.parametrize("ext", [".nii", ".nii.gz"])
@pytest.mark.parametrize(
    "dtype", [np.uint8, np.int16, np.int32, np.float32, np.float64]
)
def test_roundtrip(tmp_path, ext, dtype, rng):
    shape = (7, 9, 3, 5)
    if np.issubdtype(dtype, np.integer):
        data = rng.randint(0, 100, size=shape).astype(dtype)
    else:
        data = rng.rand(*shape).astype(dtype)
    affine = np.array(
        [[1.8, 0, 0, -100.0], [0, -1.8, 0, 50.0], [0, 0, 10.0, 5.0], [0, 0, 0, 1]]
    )
    img = nifti.Nifti1Image(data, affine)
    img.header["pixdim"][4] = 0.03  # temporal spacing
    path = str(tmp_path / f"x{ext}")
    nifti.save(img, path)

    img2 = nifti.load(path)
    np.testing.assert_array_equal(np.asanyarray(img2.dataobj), data)
    np.testing.assert_allclose(img2.affine, affine, atol=1e-5)
    assert img2.header["dim"][0] == 4
    assert tuple(img2.header["dim"][1:5]) == shape
    np.testing.assert_allclose(img2.header["pixdim"][4], 0.03, atol=1e-6)


def test_fortran_order(tmp_path):
    # Voxel (x, y, z) must land at offset x + X*y + X*Y*z in the file.
    data = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    img = nifti.Nifti1Image(data, np.eye(4))
    path = str(tmp_path / "f.nii")
    nifti.save(img, path)
    raw = open(path, "rb").read()
    voxels = np.frombuffer(raw, dtype=np.int16, offset=352)
    assert voxels[0] == data[0, 0, 0]
    assert voxels[1] == data[1, 0, 0]  # x fastest


def test_3d_roundtrip_bool(tmp_path):
    data = np.zeros((4, 4, 2), dtype=bool)
    data[1:3, 1:3, :] = True
    img = nifti.Nifti1Image(data, np.eye(4))
    path = str(tmp_path / "b.nii.gz")
    nifti.save(img, path)
    img2 = nifti.load(path)
    np.testing.assert_array_equal(np.asanyarray(img2.dataobj) > 0, data)


def test_deterministic_gzip(tmp_path):
    data = np.ones((3, 3, 3), dtype=np.float32)
    img = nifti.Nifti1Image(data, np.eye(4))
    p1, p2 = str(tmp_path / "a.nii.gz"), str(tmp_path / "b.nii.gz")
    nifti.save(img, p1)
    nifti.save(img, p2)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_big_endian_roundtrip(tmp_path):
    """Saving an image loaded from a big-endian file must byte-swap the
    voxels (relabelling the dtype alone writes a LE header over BE bytes
    — every value silently corrupted)."""
    import gzip
    import struct

    from ukbb_cardiac_tpu.io import nifti

    # hand-build a minimal big-endian NIfTI-1: int16 data 0..23
    data = np.arange(24, dtype=">i2").reshape(2, 3, 4, order="F")
    hdr = bytearray(348)
    struct.pack_into(">i", hdr, 0, 348)
    struct.pack_into(">8h", hdr, 40, 3, 2, 3, 4, 1, 1, 1, 1)
    struct.pack_into(">h", hdr, 70, 4)   # datatype int16
    struct.pack_into(">h", hdr, 72, 16)  # bitpix
    struct.pack_into(">8f", hdr, 76, 1, 1, 1, 1, 1, 1, 1, 1)
    struct.pack_into(">f", hdr, 108, 352.0)  # vox_offset
    struct.pack_into(">h", hdr, 252, 1)      # sform_code
    struct.pack_into(">4f", hdr, 280, 1, 0, 0, 0)
    struct.pack_into(">4f", hdr, 296, 0, 1, 0, 0)
    struct.pack_into(">4f", hdr, 312, 0, 0, 1, 0)
    hdr[344:348] = b"n+1\x00"
    payload = bytes(hdr) + b"\x00" * 4 + data.tobytes(order="F")
    p = tmp_path / "be.nii.gz"
    with gzip.open(p, "wb") as f:
        f.write(payload)

    img = nifti.load(str(p))
    np.testing.assert_array_equal(np.asarray(img.dataobj).reshape(-1, order="F"),
                                  np.arange(24))
    out = tmp_path / "out.nii.gz"
    nifti.save(img, str(out))
    img2 = nifti.load(str(out))
    np.testing.assert_array_equal(np.asarray(img2.dataobj),
                                  np.asarray(img.dataobj))


def test_nan_scl_slope_means_no_scaling(tmp_path):
    """nibabel semantics: a NaN scl_slope is 'unset', not multiply-by-NaN."""
    import gzip
    import struct

    from ukbb_cardiac_tpu.io import nifti

    img = nifti.Nifti1Image(np.arange(12, dtype=np.int16).reshape(3, 4),
                            np.eye(4))
    p = tmp_path / "a.nii.gz"
    nifti.save(img, str(p))
    raw = bytearray(gzip.open(p, "rb").read())
    struct.pack_into("<f", raw, 112, float("nan"))  # scl_slope field
    with gzip.open(p, "wb") as f:
        f.write(bytes(raw))
    back = nifti.load(str(p))
    np.testing.assert_array_equal(np.asarray(back.dataobj).reshape(-1),
                                  np.arange(12))


def test_read_bytes_cache_invalidation(tmp_path):
    """The decompressed-bytes LRU returns fresh data after a rewrite."""
    import numpy as np

    from ukbb_cardiac_tpu.io import nifti

    p = str(tmp_path / "x.nii.gz")
    a = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    nifti.save(nifti.Nifti1Image(a, np.eye(4)), p)
    first = np.asanyarray(nifti.load(p).dataobj)
    np.testing.assert_array_equal(first, a)
    # cached second read
    np.testing.assert_array_equal(np.asanyarray(nifti.load(p).dataobj), a)
    # rewrite with different contents -> must NOT serve the stale bytes
    import os
    b = a * 7
    nifti.save(nifti.Nifti1Image(b, np.eye(4)), p)
    os.utime(p, ns=(os.stat(p).st_atime_ns, os.stat(p).st_mtime_ns + 1))
    np.testing.assert_array_equal(np.asanyarray(nifti.load(p).dataobj), b)
    # loaded arrays are read-only views over the cache
    arr = np.asanyarray(nifti.load(p).dataobj)
    assert not arr.flags.writeable


@pytest.mark.parametrize("order", ["C", "F"])
def test_save_bytes_identical_across_memory_orders(tmp_path, order, rng):
    """The zero-copy F-contiguous write path produces byte-identical
    files to the serialising (tobytes) path — the two must never
    diverge (golden CSV/NIfTI fixtures pin the byte stream)."""
    data = rng.randint(0, 500, size=(11, 7, 3, 4)).astype(np.int16)
    arr = np.asfortranarray(data) if order == "F" else np.ascontiguousarray(data)
    assert arr.flags.f_contiguous == (order == "F")
    img = nifti.Nifti1Image(arr, np.eye(4))
    p = str(tmp_path / f"x_{order}.nii.gz")
    nifti.save(img, p)
    # compare loaded voxels AND the full compressed byte stream across
    # memory orders (deterministic: mtime=0, same compressor inputs)
    back = nifti.load(p)
    np.testing.assert_array_equal(np.asanyarray(back.dataobj), data)
    other = str(tmp_path / "other.nii.gz")
    nifti.save(nifti.Nifti1Image(
        np.ascontiguousarray(data) if order == "F"
        else np.asfortranarray(data), np.eye(4)), other)
    assert open(p, "rb").read() == open(other, "rb").read()


def test_save_noncontiguous_slice(tmp_path, rng):
    """A strided view (neither C- nor F-contiguous) still writes
    correct F-order voxels via the tobytes fallback."""
    base = rng.randint(0, 500, size=(12, 8, 6)).astype(np.int16)
    view = base[::2, 1:7, ::3]
    assert not view.flags.c_contiguous and not view.flags.f_contiguous
    p = str(tmp_path / "v.nii")
    nifti.save(nifti.Nifti1Image(view, np.eye(4)), p)
    np.testing.assert_array_equal(
        np.asanyarray(nifti.load(p).dataobj), view)
