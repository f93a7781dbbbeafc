"""Phenotype-layer tests against analytic phantoms."""

import math
import os

import numpy as np
import pytest

from ukbb_cardiac_tpu.io import nifti
from ukbb_cardiac_tpu.io.vtkio import load_polydata
from ukbb_cardiac_tpu.phenotype import (
    aorta_pass_quality_control,
    atrium_pass_quality_control,
    determine_aha_coordinate_system,
    determine_aha_part,
    determine_aha_segment_id,
    determine_aha_segment_ids,
    evaluate_atrial_volume_dataset,
    evaluate_ventricular_volume_dataset,
    evaluate_wall_thickness,
    la_pass_quality_control,
    sa_pass_quality_control,
    bulls_eye_canvas,
)
from ukbb_cardiac_tpu.phenotype.aorta import evaluate_aortic_area_dataset

from phantom import (
    ao_phantom,
    sax_phantom,
    seg4_la_phantom,
    write_subject,
)


@pytest.fixture(scope="module")
def sax_subject(tmp_path_factory):
    """A phantom subject dir with sa image + ground-truth segmentation."""
    root = tmp_path_factory.mktemp("sax")
    data = write_subject(str(root / "1000001"), seqs=("sa", "la_2ch", "la_4ch"),
                         X=96, Y=96, Z=8, T=12, with_seg=True)
    return root, data


def test_sa_qc_passes_on_phantom(sax_subject):
    root, data = sax_subject
    assert sa_pass_quality_control(str(root / "1000001" / "seg_sa.nii.gz"))


def test_sa_qc_fails_on_empty():
    seg = np.zeros((32, 32, 8), np.int16)
    assert not sa_pass_quality_control(seg)


def test_la_qc_on_seg4_phantom():
    _, seg = seg4_la_phantom()
    assert la_pass_quality_control(seg[:, :, :, 0])
    assert not la_pass_quality_control(np.zeros((64, 64, 1), np.int16))


def test_atrium_qc():
    _, seg = ao_phantom()  # labels 1, 2 with smooth pulsation
    assert atrium_pass_quality_control(seg, {"AAo": 1, "DAo": 2})
    bad = seg.copy()
    bad[:, :, :, 3] = 0  # vanishes at t=3
    assert not atrium_pass_quality_control(bad, {"AAo": 1})


def test_aorta_qc():
    image, seg = ao_phantom(noise=0.01)
    assert aorta_pass_quality_control(image, seg)
    noisy = image.copy()
    noisy[:, :, 0, 5] *= 50  # intensity explosion at t=5
    assert not aorta_pass_quality_control(noisy, seg)


def test_aha_coordinate_system(sax_subject):
    root, data = sax_subject
    _, seg = data["sa"]
    affine = nifti.load(str(root / "1000001" / "sa.nii.gz")).affine
    axis = determine_aha_coordinate_system(seg[:, :, :, 0], affine)
    for k in ("lv_to_sep", "apex_to_base", "inf_to_ant"):
        assert np.isclose(np.linalg.norm(axis[k]), 1.0)
    assert axis["apex_to_base"][2] > 0
    # orthogonality of the in-plane axes
    assert abs(np.dot(axis["inf_to_ant"], axis["apex_to_base"])) < 1e-6
    # RV is at negative x in voxel space; affine negates x, so in world
    # space lv_to_sep points along +x
    assert abs(axis["lv_to_sep"][2]) < 0.2


def test_aha_part_thirds(sax_subject):
    root, data = sax_subject
    _, seg = data["sa"]
    affine = nifti.load(str(root / "1000001" / "sa.nii.gz")).affine
    part_z = determine_aha_part(seg[:, :, :, 0], affine)
    assert set(part_z.values()) == {"basal", "mid", "apical"}
    assert len(part_z) == 8
    three = determine_aha_part(seg[:, :, :, 0], affine, three_slices=True)
    assert len(three) == 3 and set(three.values()) == {"basal", "mid", "apical"}


def test_aha_segment_id_scalar_vs_vector():
    axis = {"lv_to_sep": np.array([1.0, 0, 0]),
            "apex_to_base": np.array([0, 0, 1.0]),
            "inf_to_ant": np.array([0, 1.0, 0])}
    centre = np.zeros(3)
    rng = np.random.RandomState(0)
    pts = rng.randn(200, 3)
    for part in ("basal", "mid", "apical"):
        vec = determine_aha_segment_ids(pts, centre, axis, part)
        ref = [determine_aha_segment_id(p, centre, axis, part) for p in pts]
        np.testing.assert_array_equal(vec, ref)
    assert determine_aha_segment_id(pts[0], centre, axis, "apex") == 17


def test_ventricular_volume_csv(sax_subject, tmp_path):
    root, data = sax_subject
    out_csv = tmp_path / "vol.csv"
    df = evaluate_ventricular_volume_dataset(str(root), str(out_csv))
    assert out_csv.exists()
    assert list(df.columns)[0] == "LVEDV (mL)"
    row = df.loc["1000001"]
    # analytic LV ED volume: pi * r^2 * Z slices * voxel volume
    image, seg = data["sa"]
    vol_per_pix = 1.8 * 1.8 * 10.0 * 1e-3
    lv_edv_true = np.sum(seg[:, :, :, 0] == 1) * vol_per_pix
    assert row["LVEDV (mL)"] == pytest.approx(lv_edv_true)
    assert 0 < row["LVEF (%)"] < 100
    assert row["LVEDV (mL)"] > row["LVESV (mL)"]


def test_wall_thickness_on_phantom(sax_subject, tmp_path):
    root, data = sax_subject
    stem = str(tmp_path / "wt")
    evaluate_wall_thickness(str(root / "1000001" / "seg_sa.nii.gz"), stem)
    assert os.path.exists(stem + ".csv")
    assert os.path.exists(stem + "_max.csv")
    assert os.path.exists(stem + ".vtk")
    import pandas as pd
    df = pd.read_csv(stem + ".csv", index_col=0)
    assert len(df) == 17
    # phantom wall = 5 px * 1.8 mm = 9 mm; smoothing keeps it in range
    g = df.loc["Global"].values[0]
    assert 6.0 < g < 12.0, g
    # polydata round-trips
    pd_endo = load_polydata(stem + ".vtk")
    assert pd_endo.n_points > 100
    assert "Thickness" in pd_endo.point_scalars
    assert set(np.unique(pd_endo.point_scalars["Segment_ID"])) <= set(range(1, 17))


def test_atrial_volume_dataset(sax_subject, tmp_path):
    root, data = sax_subject
    # write seg files for la views (ground truth as stand-in for deploy)
    out_csv = tmp_path / "atrium.csv"
    df = evaluate_atrial_volume_dataset(str(root), str(out_csv))
    assert out_csv.exists()
    if len(df):  # QC may reject the synthetic phantom; schema still checked
        assert "LAV max (mL)" in df.columns
        row = df.iloc[0]
        assert row["LAV max (mL)"] > row["LAV min (mL)"]


def test_aortic_area_dataset(tmp_path):
    root = tmp_path / "data"
    write_subject(str(root / "3000000"), seqs=("ao",), T=16, with_seg=True)
    # two-level-header pressure CSV like the UKB spreadsheet
    import pandas as pd
    pp = pd.DataFrame(
        [[50.0, 52.0]], index=[3000000],
        columns=pd.MultiIndex.from_tuples(
            [("Central pulse pressure during PWA", "12678-2.0"),
             ("Central pulse pressure during PWA", "12678-2.1")]))
    pp.index.name = "eid"
    pressure_csv = tmp_path / "bp.csv"
    pp.to_csv(pressure_csv)

    out_csv = tmp_path / "aorta.csv"
    df = evaluate_aortic_area_dataset(str(root), str(pressure_csv), str(out_csv))
    assert out_csv.exists()
    assert len(df) == 1
    row = df.iloc[0]
    assert row["AAo max area (mm2)"] > row["AAo min area (mm2)"]
    assert row["AAo distensibility (10-3 mmHg-1)"] > 0


def test_bulls_eye_canvas():
    data = np.arange(1, 17, dtype=float)
    canvas = bulls_eye_canvas(data)
    assert canvas.shape == (201, 201)
    vals = set(np.unique(canvas)) - {0.0}
    assert vals == set(data)


def test_resample_to_target_preserves_temporal_spacing(tmp_path):
    """The strain drivers read dt from the cropped cine; the crop chain
    must carry the SOURCE's pixdim[4] through resample_to_target (MIRTK
    keeps the source time axis for a 3D -target; losing it made the
    strain CSV time columns 0,1000,2000 ms instead of 0,~31,~63)."""
    import numpy as np

    from ukbb_cardiac_tpu.io import nifti
    from ukbb_cardiac_tpu.ops.sequence import (auto_crop_image, padding,
                                               resample_to_target)

    dt = 0.0315
    rng = np.random.RandomState(0)
    cine = (rng.rand(24, 26, 4, 5) * 100).astype(np.float32)
    seg = np.zeros((24, 26, 4), np.int16)
    seg[8:16, 9:17, 1:3] = 1
    affine = np.diag([1.8, -1.8, 10.0, 1.0])
    img = nifti.Nifti1Image(cine, affine)
    img.header["pixdim"][4] = dt
    nifti.save(img, str(tmp_path / "sa.nii.gz"))
    nifti.save(nifti.Nifti1Image(seg, affine), str(tmp_path / "seg_ED.nii.gz"))

    padding(str(tmp_path / "seg_ED.nii.gz"), str(tmp_path / "seg_ED.nii.gz"),
            str(tmp_path / "lv.nii.gz"), 3, 0)
    auto_crop_image(str(tmp_path / "lv.nii.gz"),
                    str(tmp_path / "crop_tgt.nii.gz"), 2)
    resample_to_target(str(tmp_path / "sa.nii.gz"),
                       str(tmp_path / "crop_tgt.nii.gz"),
                       str(tmp_path / "sa_crop.nii.gz"))
    out = nifti.load(str(tmp_path / "sa_crop.nii.gz"))
    assert abs(float(out.header["pixdim"][4]) - dt) < 1e-6
    # spatial spacing still comes from the target grid
    np.testing.assert_allclose(np.abs(out.header["pixdim"][1:4]),
                               [1.8, 1.8, 10.0], rtol=1e-5)


def test_atrial_volume_frame_count_mismatch_skips(tmp_path):
    """Mismatched 2ch/4ch frame counts must QC-skip the subject (the
    reference would crash the whole run) — phenotype/atrium.py."""
    import numpy as np

    from ukbb_cardiac_tpu.io import nifti
    from ukbb_cardiac_tpu.phenotype.atrium import atrial_volume_measures

    affine = np.diag([1.0, -1.0, 8.0, 1.0])
    d = str(tmp_path)

    def disk(label_vals, T):
        seg = np.zeros((48, 48, 1, T), np.int16)
        for lab, (cx, cy, r) in label_vals.items():
            gx, gy = np.meshgrid(np.arange(48), np.arange(48), indexing="ij")
            seg[(gx - cx) ** 2 + (gy - cy) ** 2 < r * r, 0, :] = lab
        return seg

    nifti.save(nifti.Nifti1Image(disk({1: (20, 20, 8)}, 6), affine),
               f"{d}/seg_la_2ch.nii.gz")
    nifti.save(nifti.Nifti1Image(disk({1: (16, 16, 7), 2: (32, 32, 7)}, 4),
                                 affine), f"{d}/seg_la_4ch.nii.gz")
    nifti.save(nifti.Nifti1Image(np.zeros((48, 48, 8), np.int16), affine),
               f"{d}/sa.nii.gz")
    out = atrial_volume_measures(d)
    assert out is None  # QC-style skip, not a crash
