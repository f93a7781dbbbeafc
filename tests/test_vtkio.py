"""Legacy-VTK polydata I/O round-trip tests."""

import numpy as np

from ukbb_cardiac_tpu.io.vtkio import PolyData, append_polydata, load_polydata, save_polydata


def test_full_roundtrip(tmp_path):
    pts = np.arange(15, dtype=float).reshape(5, 3)
    pd = PolyData(
        points=pts,
        lines=[np.array([0, 1]), np.array([1, 2, 3])],
        point_scalars={"Thickness": np.linspace(0, 1, 5),
                       "Segment_ID": np.arange(5, dtype=np.int32)},
        point_vectors={"Direction_Radial": np.eye(5, 3)},
        cell_scalars={"Direction_ID": np.array([1, 2], np.int32)},
    )
    path = str(tmp_path / "p.vtk")
    save_polydata(pd, path)
    with open(path, "rb") as f:
        head = f.readline().decode()
    assert "4.0" in head  # MIRTK-compatible version natively

    pd2 = load_polydata(path)
    np.testing.assert_allclose(pd2.points, pts)
    assert [list(l) for l in pd2.lines] == [[0, 1], [1, 2, 3]]
    np.testing.assert_allclose(pd2.point_scalars["Thickness"],
                               pd.point_scalars["Thickness"], atol=1e-6)
    np.testing.assert_array_equal(pd2.point_scalars["Segment_ID"],
                                  pd.point_scalars["Segment_ID"])
    np.testing.assert_allclose(pd2.point_vectors["Direction_Radial"],
                               pd.point_vectors["Direction_Radial"], atol=1e-6)
    np.testing.assert_array_equal(pd2.cell_scalars["Direction_ID"], [1, 2])


def test_append_offsets_and_arrays():
    a = PolyData(points=np.zeros((3, 3)), lines=[np.array([0, 1])],
                 point_scalars={"S": np.array([1.0, 2.0, 3.0])},
                 cell_scalars={"C": np.array([7])})
    b = PolyData(points=np.ones((2, 3)), lines=[np.array([0, 1])],
                 point_scalars={"S": np.array([4.0, 5.0])},
                 cell_scalars={"C": np.array([8])})
    m = append_polydata([a, b])
    assert m.n_points == 5
    assert list(m.lines[1]) == [3, 4]  # offset by a's point count
    np.testing.assert_allclose(m.point_scalars["S"], [1, 2, 3, 4, 5])
    np.testing.assert_array_equal(m.cell_scalars["C"], [7, 8])
    # empty blocks are dropped
    empty = PolyData(points=np.zeros((0, 3)))
    m2 = append_polydata([empty, a])
    assert m2.n_points == 3


def test_binary_ascii_equivalence(tmp_path):
    """Binary (default) and ASCII encodings load back the same polydata;
    binary points round-trip bit-exact (they feed the strain tables)."""
    rng = np.random.RandomState(3)
    pts = rng.randn(40, 3) * 100
    pd = PolyData(
        points=pts,
        lines=[np.array([i, i + 1]) for i in range(39)],
        point_scalars={"Label": rng.randint(1, 3, 40)},
        point_vectors={"Direction_Radial": rng.randn(40, 3)},
        cell_scalars={"Segment_ID": rng.randint(1, 17, 39).astype(np.int32),
                      "W": rng.rand(39)},
    )
    pb, pa = str(tmp_path / "b.vtk"), str(tmp_path / "a.vtk")
    save_polydata(pd, pb)
    save_polydata(pd, pa, ascii=True)
    rb, ra = load_polydata(pb), load_polydata(pa)
    np.testing.assert_array_equal(rb.points, pts)  # bit-exact
    np.testing.assert_allclose(ra.points, pts, atol=1e-6)
    np.testing.assert_array_equal(rb.point_scalars["Label"],
                                  pd.point_scalars["Label"])
    np.testing.assert_array_equal(rb.point_vectors["Direction_Radial"],
                                  pd.point_vectors["Direction_Radial"])
    np.testing.assert_array_equal(rb.cell_scalars["Segment_ID"],
                                  pd.cell_scalars["Segment_ID"])
    np.testing.assert_allclose(rb.cell_scalars["W"], pd.cell_scalars["W"])
    assert [list(l) for l in rb.lines] == [list(l) for l in pd.lines]
    assert [list(l) for l in ra.lines] == [list(l) for l in pd.lines]
