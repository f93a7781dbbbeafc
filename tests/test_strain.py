"""Strain pipeline tests: contour extraction, strain-by-length, motion."""

import os

import numpy as np
import pytest

from ukbb_cardiac_tpu.io import nifti
from ukbb_cardiac_tpu.io.vtkio import PolyData, load_polydata, save_polydata
from ukbb_cardiac_tpu.phenotype.myo_contour import extract_myocardial_contour
from ukbb_cardiac_tpu.phenotype.strain import (
    cine_2d_sa_motion_and_strain_analysis,
    evaluate_strain_by_length,
    track_slice_fields,
)
from ukbb_cardiac_tpu.reg import RegConfig

from phantom import write_subject


@pytest.fixture(scope="module")
def sax_subject(tmp_path_factory):
    root = tmp_path_factory.mktemp("strain")
    write_subject(str(root / "1000001"), seqs=("sa",), X=96, Y=96, Z=8, T=6,
                  with_seg=True)
    # extract ED files the strain driver expects
    subj = root / "1000001"
    for name in ("sa", "seg_sa"):
        nim = nifti.load(str(subj / f"{name}.nii.gz"))
        data = np.asanyarray(nim.dataobj)
        ed = nifti.Nifti1Image(data[:, :, :, 0], nim.affine)
        nifti.save(ed, str(subj / f"{name}_ED.nii.gz"))
    return subj


def test_extract_myocardial_contour(sax_subject, tmp_path):
    stem = str(tmp_path / "myo_contour_ED_z")
    extract_myocardial_contour(str(sax_subject / "seg_sa_ED.nii.gz"), stem,
                               three_slices=True)
    written = [z for z in range(8) if os.path.exists(f"{stem}{z:02d}.vtk")]
    assert len(written) == 3
    poly = load_polydata(f"{stem}{written[0]:02d}.vtk")
    assert poly.n_points > 50
    assert set(poly.point_scalars["Label"]) == {1, 2}
    dir_ids = poly.cell_scalars["Direction_ID"]
    assert set(dir_ids) == {1, 2}
    # ~36 radial lines
    assert 20 <= np.sum(dir_ids == 1) <= 50
    assert "Direction_Radial" in poly.point_vectors


def test_strain_by_length_analytic(tmp_path):
    """Two frames: frame 1 scales all points by 1.1 about the origin →
    every line strain is exactly +10%."""
    pts = np.array([[0, 0, 0], [10, 0, 0], [10, 10, 0], [0, 10, 0]], float)
    lines = [np.array([0, 1]), np.array([1, 2]), np.array([2, 3])]
    cells = {"Segment_ID": np.array([1, 1, 2], np.int32),
             "Direction_ID": np.array([1, 2, 2], np.int32)}
    stem = str(tmp_path / "c_fr")
    save_polydata(PolyData(points=pts, lines=lines, cell_scalars=dict(cells)),
                  f"{stem}00.vtk")
    save_polydata(PolyData(points=pts * 1.1, lines=lines,
                           cell_scalars=dict(cells)), f"{stem}01.vtk")
    out = str(tmp_path / "strain")
    evaluate_strain_by_length(stem, 2, 0.03, out)

    import pandas as pd
    rad = pd.read_csv(out + "_radial.csv", index_col=0)
    cir = pd.read_csv(out + "_circum.csv", index_col=0)
    assert rad.shape == (17, 2) and cir.shape == (17, 2)
    assert rad.loc["Global"].iloc[1] == pytest.approx(10.0, abs=1e-6)
    assert cir.loc["Global"].iloc[1] == pytest.approx(10.0, abs=1e-6)
    assert rad.loc["Global"].iloc[0] == pytest.approx(0.0, abs=1e-9)
    # columns are time in ms
    assert float(rad.columns[1]) == pytest.approx(30.0)
    # Strain cell array written back into the frame VTK
    poly = load_polydata(f"{stem}01.vtk")
    np.testing.assert_allclose(poly.cell_scalars["Strain"], 10.0, atol=1e-6)


def test_track_slice_fields_recovers_motion():
    """Track a translating blob; the combined ED→fr field should move the
    blob centre approximately to its frame-fr position."""
    T, X, Y = 4, 48, 48
    frames = np.zeros((T, X, Y), np.float32)
    gx, gy = np.meshgrid(np.arange(X), np.arange(Y), indexing="ij")
    shifts = [0.0, 1.5, 3.0, 1.5]  # cyclic-ish motion
    for t in range(T):
        frames[t] = np.exp(-((gx - 24 - shifts[t]) ** 2 + (gy - 24) ** 2)
                           / (2 * 36.0))
    cfg = RegConfig(spacing=8, levels=2, iters=50, lr=0.5, be_weight=1e-2)
    fields = track_slice_fields(frames, cfg)
    assert fields.shape == (T, X, Y, 2)
    np.testing.assert_allclose(fields[0], 0.0)
    # ED (t=0) centre maps forward by ~ +shift in x at each frame
    for t in range(1, T):
        dx = fields[t][24, 24, 0]
        assert abs(dx - shifts[t]) < 1.0, (t, dx, shifts[t])


def test_full_sa_strain_driver(sax_subject, tmp_path):
    out_dir = tmp_path / "cine_motion"
    out_dir.mkdir()
    cfg = RegConfig(spacing=8, levels=2, iters=30, lr=0.5, be_weight=1e-2)
    df = cine_2d_sa_motion_and_strain_analysis(
        str(sax_subject), str(out_dir), str(tmp_path / "strain_sa"), cfg,
        eval_dice=True)
    assert os.path.exists(str(tmp_path / "strain_sa_radial.csv"))
    assert os.path.exists(str(tmp_path / "strain_sa_circum.csv"))
    import pandas as pd
    rad = pd.read_csv(str(tmp_path / "strain_sa_radial.csv"), index_col=0)
    assert rad.shape[0] == 17
    # contracting LV phantom: radial lines shorten? wall thickens →
    # at minimum the table is populated with finite global values
    assert np.isfinite(rad.loc["Global"].values).all()
    # the enabled eval_dice self-check: warped-seg Dice vs ED is high
    assert df is not None
    dice = df.values
    assert np.nanmean(dice[:, 0]) > 0.7, np.nanmean(dice, axis=0)


def test_eval_strain_sax_cli(tmp_path):
    """The strain CLI aggregates per-subject tables with the reference's
    Ecc/Err column schema (eval_strain_sax.py:72-86)."""
    import pandas as pd
    from ukbb_cardiac_tpu.cli import eval_strain_sax

    data_dir = tmp_path / "data"
    # TWO subjects: exercises the CLI's one-deep pipeline (subject 78
    # dispatches while 77 is finished on host)
    for eid in ("77", "78"):
        write_subject(str(data_dir / eid), seqs=("sa",), X=96, Y=96, Z=8,
                      T=4, with_seg=True)
        subj = data_dir / eid
        for name in ("sa", "seg_sa"):
            nim = nifti.load(str(subj / f"{name}.nii.gz"))
            nifti.save(nifti.Nifti1Image(
                np.asanyarray(nim.dataobj)[:, :, :, 0], nim.affine),
                str(subj / f"{name}_ED.nii.gz"))
    subj = data_dir / "77"

    out_csv = tmp_path / "strain.csv"
    eval_strain_sax.main(["--data_dir", str(data_dir),
                          "--output_csv", str(out_csv)])
    df = pd.read_csv(out_csv, index_col=0)
    assert len(df) == 2 and list(df.index.astype(str)) == ["77", "78"]
    assert "Ecc_Global (%)" in df.columns and "Err_Global (%)" in df.columns
    assert len(df.columns) == 34
    # intermediate dir removed, per-subject tables kept
    assert not (subj / "cine_motion").exists()
    assert (subj / "strain_sa_radial.csv").exists()


def test_reference_scheme_both_directions(sax_subject, tmp_path):
    """The reference's exact both-directions registration scheme
    (inverse_consistent=False; cardiac_utils.py:882-922) is exercised
    and agrees with the default inverse-consistent path: warp-Dice in
    tolerance and matching global strain signs/magnitudes (VERDICT r2 #5)."""
    import pandas as pd

    cfg = RegConfig(spacing=8, levels=2, iters=30, lr=0.5, be_weight=1e-2)
    results = {}
    for mode, inv in (("default", True), ("reference", False)):
        out_dir = tmp_path / f"motion_{mode}"
        out_dir.mkdir()
        df = cine_2d_sa_motion_and_strain_analysis(
            str(sax_subject), str(out_dir),
            str(tmp_path / f"strain_{mode}"), cfg, eval_dice=True,
            inverse_consistent=inv)
        assert df is not None
        circ = pd.read_csv(str(tmp_path / f"strain_{mode}_circum.csv"),
                           index_col=0)
        results[mode] = (np.nanmean(df.values[:, 0]), circ.loc["Global"])
    dice_default, circ_default = results["default"]
    dice_ref, circ_ref = results["reference"]
    # both schemes track well and agree closely
    assert dice_ref > 0.7, dice_ref
    assert abs(dice_ref - dice_default) < 0.05, (dice_ref, dice_default)
    # peak global circumferential strain within 3 percentage points
    assert abs(circ_ref.min() - circ_default.min()) < 3.0, \
        (circ_ref.min(), circ_default.min())


def test_finish_no_artifacts_same_tables(sax_subject, tmp_path):
    """``write_artifacts=False`` (the cohort driver's mode — it deletes
    the motion dir right after harvesting) produces byte-identical
    strain CSVs while writing NO per-frame contour VTKs."""
    from ukbb_cardiac_tpu.phenotype.strain import (finish_sa_motion,
                                                   start_sa_motion_dispatch)

    cfg = RegConfig(spacing=8, levels=2, iters=30, lr=0.5, be_weight=1e-2)
    outs = {}
    for mode in ("artifacts", "bare"):
        d = tmp_path / mode
        d.mkdir()
        ctx = start_sa_motion_dispatch(str(sax_subject), str(d), cfg)
        assert ctx is not None
        finish_sa_motion(ctx, str(d / "strain_sa"),
                         write_artifacts=(mode == "artifacts"))
        outs[mode] = d
        frame_vtks = [p for p in os.listdir(d)
                      if p.startswith("myo_contour_fr")
                      or "_fr" in p and p.endswith(".vtk")]
        if mode == "artifacts":
            assert frame_vtks
        else:
            assert not frame_vtks
    for name in ("strain_sa_radial.csv", "strain_sa_circum.csv"):
        a = (outs["artifacts"] / name).read_bytes()
        b = (outs["bare"] / name).read_bytes()
        assert a == b
