"""Plumbing test for the accuracy capstone (bench_accuracy.py).

The real measurement (production FCN, 2000 iterations, 192² phantoms on
the TPU) is reported in README.md; this test runs the same code path at
toy scale to keep it from rotting.  Converged Dice is NOT asserted here —
30 iterations cannot calibrate the BN moving statistics (momentum 0.99),
so eval-mode predictions are still meaningless; the learning signal
itself is covered by ``test_train.py::test_sa_training_converges_on_phantom``.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench_accuracy


def test_accuracy_capstone_training_smoke(tmp_path):
    out = bench_accuracy.run(iters=30, size=48, Z=3, T=4, n_train=3, n_val=1,
                             n_test=2, batch_slices=6, steps_per_dispatch=3,
                             num_filter=4, num_level=3, seed=0,
                             keep_dir=str(tmp_path))
    # every reported field exists; Dice/agreement are finite.  The
    # error fields may legitimately be NaN at this scale: a 30-iteration
    # net can predict zero LV voxels in eval mode, and the phenotype
    # layer's NaN-safe guard then yields LVEF = NaN rather than inf.
    for k in ("dice_lv", "dice_myo", "dice_rv", "lvedv_mae_pct",
              "lvm_mae_pct", "lvef_mae_pp", "rvef_mae_pp",
              "bf16_label_agreement", "bf16_dice_lv"):
        assert k in out, (k, out)
    for k in ("dice_lv", "dice_myo", "dice_rv", "bf16_label_agreement"):
        assert np.isfinite(out[k]), (k, out)
    assert 0.0 <= out["dice_lv"] <= 1.0
    # bf16 deploy agrees with f32 on almost all voxels even this early
    assert out["bf16_label_agreement"] > 0.9, out
    # the cohort was written in the trainer's expected layout
    assert os.path.exists(tmp_path / "train" / "train00" / "sa_ED.nii.gz")
    assert os.path.exists(tmp_path / "test" / "test00" / "label_sa_ES.nii.gz")


def test_accuracy_capstone_ao_training_smoke(tmp_path):
    out = bench_accuracy.run_ao(unet_iters=20, lstm_iters=20, size=48, T=6,
                                n_train=2, n_val=1, n_test=1,
                                batch_windows=2, steps_per_dispatch=2,
                                num_filter=2, num_level=3, num_hidden=4,
                                weight_R=2, seed=0, keep_dir=str(tmp_path))
    for k in ("dice_aa", "dice_da", "area_max_mae_pct", "area_min_mae_pct",
              "distensibility_mae_pct", "bf16_label_agreement",
              "bf16_dice_aa"):
        assert k in out, (k, out)
    assert np.isfinite(out["dice_aa"]) and 0.0 <= out["dice_aa"] <= 1.0
    assert out["bf16_label_agreement"] > 0.9, out
    # sparse label_ao: exactly two annotated frames, dense prop alongside
    from ukbb_cardiac_tpu.io import nifti
    lab = np.asanyarray(nifti.load(
        str(tmp_path / "train" / "train00" / "label_ao.nii.gz")).dataobj)
    annotated = [t for t in range(lab.shape[3]) if (lab[..., t] != 0).any()]
    assert annotated == [0, 3]
    assert os.path.exists(tmp_path / "train" / "train00" /
                          "label_ao_prop.nii.gz")
