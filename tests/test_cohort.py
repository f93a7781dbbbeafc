"""Cohort driver tests: end-to-end per-subject chain with cross-stage
overlap (VERDICT r2 #2; replaces the reference's stage-by-stage cohort
walks, demo_pipeline.py:63-122)."""

import os

import numpy as np
import pandas as pd
import pytest

import jax

from phantom import write_subject


@pytest.fixture(scope="module")
def tiny_engine():
    from ukbb_cardiac_tpu.infer.engine import (InferenceEngine,
                                               SegmentationModel)
    from ukbb_cardiac_tpu.models import fcn as fcn_mod

    cfg = fcn_mod.FCNConfig(n_class=4, n_level=3, n_filter=(2, 4, 4),
                            n_block=(1, 1, 1), same_dim=4, fc=4)
    p, s, n = fcn_mod.init_fcn(jax.random.PRNGKey(0), cfg)
    return InferenceEngine(SegmentationModel.from_fcn(p, s, n, cfg))


def _cohort(tmp_path, n, with_seg=True, T=6):
    root = tmp_path / "cohort"
    for i in range(n):
        write_subject(str(root / f"subj{i:02d}"), seqs=("sa",), X=64, Y=64,
                      Z=8, T=T, with_seg=with_seg,
                      rng=np.random.RandomState(i))
        if with_seg:
            # the deploy stage would write ED/ES extracts; mirror it
            from ukbb_cardiac_tpu.io import nifti
            d = str(root / f"subj{i:02d}")
            nim = nifti.load(os.path.join(d, "seg_sa.nii.gz"))
            seg = np.asanyarray(nim.dataobj)
            es = int(np.argmin(np.sum(seg == 1, axis=(0, 1, 2))))
            for name, fr in (("ED", 0), ("ES", es)):
                nifti.save(nifti.Nifti1Image(seg[:, :, :, fr], nim.affine),
                           os.path.join(d, f"seg_sa_{name}.nii.gz"))
    return str(root)


def test_run_cohort_sa_end_to_end(tmp_path, tiny_engine):
    from ukbb_cardiac_tpu.parallel import run_cohort_sa

    root = _cohort(tmp_path, 3)
    out = str(tmp_path / "csv")
    res = run_cohort_sa(root, tiny_engine, workers=2, output_dir=out,
                        verbose=False)
    assert len(res.fleet.succeeded) == 3, res.fleet.failed
    assert not res.fleet.failed
    # every stage ran for every subject
    for subj, stages in res.stage_seconds.items():
        assert set(stages) == {"segment", "volumes", "wall_thickness",
                               "strain"}
    # aggregate CSVs in the reference schemas
    vol = pd.read_csv(os.path.join(out, "table_ventricular_volume.csv"),
                      index_col=0)
    assert len(vol) == 3 and "LVEF" in vol.columns
    wt = pd.read_csv(os.path.join(out, "table_wall_thickness.csv"),
                     index_col=0)
    assert wt.shape == (3, 17)
    strain = pd.read_csv(os.path.join(out, "table_strain_sax.csv"),
                         index_col=0)
    assert strain.shape == (3, 34)
    # phantom physiology: contraction → negative circumferential strain
    assert (strain["Ecc_Global (%)"] < 0).all()
    assert res.subjects_per_s > 0


def test_cohort_failure_isolation(tmp_path, tiny_engine):
    """A broken subject fails alone; the rest of the cohort completes."""
    from ukbb_cardiac_tpu.io import nifti
    from ukbb_cardiac_tpu.parallel import run_cohort_sa

    root = _cohort(tmp_path, 2)
    bad = os.path.join(root, "subj_bad")
    os.makedirs(bad)
    with open(os.path.join(bad, "sa.nii.gz"), "wb") as f:
        f.write(b"not a nifti")
    res = run_cohort_sa(root, tiny_engine, workers=2, verbose=False)
    assert set(res.fleet.succeeded) == {"subj00", "subj01"}
    assert set(res.fleet.failed) == {"subj_bad"}


def test_cohort_deploy_stage_runs_when_seg_missing(tmp_path, tiny_engine):
    """Without a seg file the deploy stage segments for real (random
    weights → QC fails → volumes row still produced, strain skipped)."""
    from ukbb_cardiac_tpu.parallel import run_cohort_sa

    root = _cohort(tmp_path, 1, with_seg=False)
    res = run_cohort_sa(root, tiny_engine, workers=1, verbose=False)
    assert res.fleet.succeeded == ["subj00"]
    d = os.path.join(root, "subj00")
    assert os.path.exists(os.path.join(d, "seg_sa.nii.gz"))
    assert os.path.exists(os.path.join(d, "seg_sa_ED.nii.gz"))
    assert "subj00" in res.volume_rows
