"""Golden-value drift tests.

These pin the *exact* numerical output of the deterministic, host-side
phenotype paths (ventricular volumes, atrial area–length volumes, wall
thickness) on the standard synthetic phantom.  Unlike the geometry-level
assertions in test_phenotype.py (which allow tolerance against analytic
truth), these catch silent drift: any refactor that changes the numbers
at all — resampling, contouring, unit conversion — fails here first.

Values were generated once from the phantom at X=96, Y=96, Z=8, T=12
(pixdim 1.8/1.8/10 mm, dt 0.04 s) and are asserted to rtol=1e-6.
Registration-dependent quantities (strain, motion) are deliberately
excluded — they depend on optimizer iteration counts and float
reassociation across backends.
"""

import os

import numpy as np
import pandas as pd
import pytest

from phantom import write_subject

from ukbb_cardiac_tpu.io import nifti
from ukbb_cardiac_tpu.phenotype import (
    atrial_volume_measures,
    evaluate_wall_thickness,
    ventricular_volume_measures,
)

GOLDEN_VENTRICLE = {
    "LVEDV": 114.30720296502113,
    "LVESV": 57.28320148587227,
    "LVEF": 49.88662131519274,
    "LVEDM": 125.1936032474041,
    "LVCO": 7.128000184893608,
    "RVEDV": 115.34400299191475,
    "RVEF": 37.97752808988764,
}

GOLDEN_ATRIUM = {
    "LAV_bip_max": 55.236013921831834,
    "LAEF_bip": 54.9699418883511,
    "RAEF_4ch": 55.542845598880376,
}

GOLDEN_WT = {
    "Global": 9.09341850520301,
    "1": 9.2668712562161,
    "7": 9.2668712562161,
    "13": 9.094470858172285,
}


@pytest.fixture(scope="module")
def subject(tmp_path_factory):
    td = tmp_path_factory.mktemp("golden")
    subj = os.path.join(str(td), "1000001")
    write_subject(subj, seqs=("sa", "la_2ch", "la_4ch"), X=96, Y=96, Z=8,
                  T=12, with_seg=True)
    return subj


def test_golden_ventricular_volumes(subject):
    val = ventricular_volume_measures(os.path.join(subject, "sa.nii.gz"),
                                      os.path.join(subject, "seg_sa.nii.gz"))
    for k, expect in GOLDEN_VENTRICLE.items():
        np.testing.assert_allclose(float(val[k]), expect, rtol=1e-6,
                                   err_msg=f"ventricle.{k} drifted")


def test_golden_atrial_volumes(subject):
    av = atrial_volume_measures(subject)
    for k, expect in GOLDEN_ATRIUM.items():
        np.testing.assert_allclose(float(av[k]), expect, rtol=1e-6,
                                   err_msg=f"atrium.{k} drifted")


def test_golden_wall_thickness(subject, tmp_path):
    nim = nifti.load(os.path.join(subject, "seg_sa.nii.gz"))
    ed = nifti.Nifti1Image(np.asanyarray(nim.dataobj)[:, :, :, 0],
                           nim.affine)
    ed_name = os.path.join(subject, "seg_sa_ED.nii.gz")
    nifti.save(ed, ed_name)
    stem = str(tmp_path / "wt")
    evaluate_wall_thickness(ed_name, stem)
    df = pd.read_csv(stem + ".csv", index_col=0)
    for k, expect in GOLDEN_WT.items():
        np.testing.assert_allclose(float(df.loc[k].values[0]), expect,
                                   rtol=1e-6, err_msg=f"wt.{k} drifted")
    # max-thickness table (eval_wall_thickness.py:64-80 second output)
    dfm = pd.read_csv(stem + "_max.csv", index_col=0)
    np.testing.assert_allclose(float(dfm.loc["Global"].values[0]),
                               9.550113787318962, rtol=1e-6,
                               err_msg="wt_max.Global drifted")


GOLDEN_AORTA = {
    ("AAo", "max area"): 1104.839921951294,
    ("AAo", "min area"): 599.3999576568604,
    ("AAo", "distensibility"): 21.08108108108108,
    ("DAo", "max area"): 469.7999668121338,
    ("DAo", "min area"): 288.3599796295166,
    ("DAo", "distensibility"): 15.730337078651687,
}


def test_golden_aortic_areas(tmp_path):
    from ukbb_cardiac_tpu.phenotype import (aorta_pass_quality_control,
                                            aortic_area_measures)
    subj = os.path.join(str(tmp_path), "1000001")
    write_subject(subj, seqs=("ao",), X=96, Y=96, Z=1, T=12, with_seg=True)
    img = np.asanyarray(nifti.load(os.path.join(subj, "ao.nii.gz")).dataobj)
    seg = np.asanyarray(nifti.load(os.path.join(subj,
                                                "seg_ao.nii.gz")).dataobj)
    assert aorta_pass_quality_control(img, seg)
    val = aortic_area_measures(subj, central_pp_value=40.0)
    for (vessel, key), expect in GOLDEN_AORTA.items():
        np.testing.assert_allclose(float(val[vessel][key]), expect,
                                   rtol=1e-6,
                                   err_msg=f"aorta.{vessel}.{key} drifted")
