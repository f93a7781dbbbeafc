"""Long-axis strain pipeline tests."""

import os

import numpy as np
import pytest

from ukbb_cardiac_tpu.io import nifti
from ukbb_cardiac_tpu.io.vtkio import load_polydata
from ukbb_cardiac_tpu.phenotype.strain_la import (
    cine_2d_la_motion_and_strain_analysis,
    determine_la_aha_part,
    determine_la_aha_segment_id,
    extract_la_myocardial_contour,
    remove_mitral_valve_points,
)
from ukbb_cardiac_tpu.reg import RegConfig

from phantom import sax_phantom, seg4_la_phantom


def _write_la_subject(root):
    """4ch phantom whose in-plane y axis runs along the world long axis,
    plus a SAX ED segmentation for the AHA coordinate system."""
    os.makedirs(root, exist_ok=True)
    X = Y = 96
    T = 6
    image, seg = seg4_la_phantom(X, Y, T)
    # LA affine: world x = -1.8 vox_x, world z = 1.8 vox_y (long axis in
    # plane), world y = 0
    affine_la = np.array([[-1.8, 0, 0, 80.0],
                          [0, 0, 10.0, 0.0],
                          [0, -1.8, 0, 90.0],
                          [0, 0, 0, 1.0]])
    hdr = nifti.Nifti1Header()
    hdr.dim[0] = 4
    hdr.dim[1:5] = image.shape
    hdr.pixdim[1:5] = (1.8, 1.8, 10.0, 0.04)
    nifti.save(nifti.Nifti1Image(image, affine_la, hdr),
               os.path.join(root, "la_4ch.nii.gz"))
    nifti.save(nifti.Nifti1Image(seg.astype(np.float64), affine_la, hdr.copy()),
               os.path.join(root, "seg4_la_4ch.nii.gz"))
    nifti.save(nifti.Nifti1Image(seg[:, :, :, 0].astype(np.float64), affine_la),
               os.path.join(root, "seg4_la_4ch_ED.nii.gz"))

    sa_img, sa_seg = sax_phantom(96, 96, 8, 4)
    affine_sa = np.diag([-1.8, -1.8, 10.0, 1.0])
    affine_sa[:3, 3] = (80.0, 90.0, -40.0)
    nifti.save(nifti.Nifti1Image(sa_seg[:, :, :, 0].astype(np.float64), affine_sa),
               os.path.join(root, "seg_sa_ED.nii.gz"))
    return affine_la, affine_sa, seg


def test_remove_mitral_valve_points():
    # a square contour crossing a "valve plane" marked on two points
    contour = np.array([[0, 0], [1, 0], [2, 0], [2, 1], [2, 2], [1, 2],
                        [0, 2], [0, 1]])  # (y, x) pairs
    plane = np.zeros((3, 3))
    plane[0, 0] = 1  # (x=0, y=0)
    endo, epi = remove_mitral_valve_points(contour.copy(), contour.copy(), plane)
    # the valve point is removed and the contour is open
    assert len(endo) == len(contour) - 1
    assert not any((plane[x, y] for y, x in endo))


def test_la_aha_part_and_segments(tmp_path):
    affine_la, affine_sa, seg = _write_la_subject(str(tmp_path))
    part_z, mid_line = determine_la_aha_part(seg[:, :, 0, 0], affine_la, affine_sa)
    assert set(part_z.values()) == {"basal", "mid", "apical"}
    assert set(mid_line.keys()) >= set(part_z.keys())
    axis = {"lv_to_sep": np.array([1.0, 0, 0])}
    some_idx = sorted(part_z.keys())[len(part_z) // 2]
    p = mid_line[some_idx] + np.array([5.0, 0, 0])
    sid = determine_la_aha_segment_id(p, some_idx, axis, mid_line, part_z)
    assert 1 <= sid <= 6


def test_extract_la_contour(tmp_path):
    _write_la_subject(str(tmp_path))
    out = str(tmp_path / "la_contour.vtk")
    extract_la_myocardial_contour(str(tmp_path / "seg4_la_4ch_ED.nii.gz"),
                                  str(tmp_path / "seg_sa_ED.nii.gz"), out)
    poly = load_polydata(out)
    assert poly.n_points > 50
    assert set(np.unique(poly.cell_scalars["Direction_ID"])) == {3}
    assert set(np.unique(poly.cell_scalars["Segment_ID"])) <= set(range(1, 7))


def test_full_la_strain_driver(tmp_path):
    _write_la_subject(str(tmp_path))
    out_dir = tmp_path / "motion"
    out_dir.mkdir()
    cfg = RegConfig(spacing=8, levels=2, iters=30, lr=0.5, be_weight=1e-2)
    df = cine_2d_la_motion_and_strain_analysis(
        str(tmp_path), str(out_dir), str(tmp_path / "strain_la_4ch"), cfg,
        eval_dice=True)
    import pandas as pd
    tab = pd.read_csv(str(tmp_path / "strain_la_4ch_longit.csv"), index_col=0)
    assert tab.shape == (7, 6)
    assert np.isfinite(tab.loc["Global"].values).all()
    assert df is not None and np.nanmean(df.values[:, 0]) > 0.6


def test_eval_strain_lax_cli_two_subjects(tmp_path):
    """The LA strain CLI's one-deep pipeline handles a 2-subject cohort
    (subject 2 dispatches while subject 1 finishes on host) and writes
    the reference's Ell column schema."""
    import pandas as pd

    from ukbb_cardiac_tpu.cli import eval_strain_lax

    data_root = tmp_path / "data"
    for eid in ("11", "12"):
        _write_la_subject(str(data_root / eid))
    out_csv = tmp_path / "strain.csv"
    eval_strain_lax.main(["--data_dir", str(data_root),
                          "--output_csv", str(out_csv)])
    df = pd.read_csv(out_csv, index_col=0)
    assert list(df.index.astype(str)) == ["11", "12"]
    assert list(df.columns) == ([f"Ell_{i} (%)" for i in range(1, 7)]
                                + ["Ell_Global (%)"])
    assert np.isfinite(df.values).all()
    assert not (data_root / "11" / "cine_motion").exists()
