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
