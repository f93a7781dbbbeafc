"""Independent registration-accuracy oracles (VERDICT r1 #3).

Warp-Dice on self-registered phantom frames (test_strain.py) is a
necessary but self-referential check.  These tests add two *independent*
oracles:

1. **Analytic-warp recovery** — apply a known B-spline displacement to a
   textured image, register, and bound the mean endpoint error of the
   recovered dense field (< 0.5 px; measured ~0.04 px with the test
   config and ~0.10 px with the production ``cine_2d_motion`` preset).
2. **Physiological strain ranges** — run the full SA strain pipeline on
   an area-conserving (incompressible-myocardium) contracting phantom
   whose strain is known in closed form, and assert the measured peak
   global Ecc/Err land in the physiological window (peak Ecc in
   -15..-25%, Err positive and bounded) AND near the analytic truth.

Reference quality bar: MIRTK motion tracking
(``cardiac_utils.py:882-936``) with the dormant warp-Dice self-check
(``:944-967``); BASELINE.md demands warped-seg Dice >= MIRTK's.
"""

import math
import os

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp
from scipy import ndimage

from phantom import sax_phantom

from ukbb_cardiac_tpu.io import nifti
from ukbb_cardiac_tpu.phenotype.strain import (
    cine_2d_sa_motion_and_strain_analysis,
)
from ukbb_cardiac_tpu.reg import (
    RegConfig,
    bspline_dense_field,
    lattice_shape,
    make_register_pair,
    total_field,
    warp_image,
)


def test_analytic_bspline_warp_recovery():
    """Register a textured image against a known-B-spline-warped copy of
    itself; the recovered dense field must match the ground truth to
    sub-half-pixel mean endpoint error."""
    X = Y = 96
    rng = np.random.RandomState(0)
    src = ndimage.gaussian_filter(rng.rand(X, Y), 2.5)
    src = ((src - src.min()) / (src.max() - src.min()) * 1000.0).astype(
        np.float32)

    # ground-truth displacement: smooth random B-spline, ~1.1 px RMS,
    # 3.6 px max — representative of frame-to-frame cardiac motion
    s_true = 16
    Cx, Cy = lattice_shape((X, Y), s_true)
    ctrl = rng.randn(Cx, Cy, 2).astype(np.float32) * 2.0
    disp_true = np.asarray(bspline_dense_field(jnp.asarray(ctrl), (X, Y),
                                               s_true))
    tgt = np.asarray(warp_image(jnp.asarray(src), jnp.asarray(disp_true)))

    cfg = RegConfig(spacing=8, levels=2, iters=50, lr=0.5, be_weight=1e-2)
    reg = make_register_pair((X, Y), cfg)
    controls = reg(jnp.asarray(tgt), jnp.asarray(src))
    disp_est = np.asarray(total_field(controls, (X, Y), cfg))

    m = 12  # interior: B-spline support at the border is unconstrained
    epe = np.linalg.norm((disp_est - disp_true)[m:-m, m:-m], axis=-1)
    assert epe.mean() < 0.5, f"mean EPE {epe.mean():.3f} px"
    assert np.percentile(epe, 95) < 1.0, f"p95 EPE high"


def _write_incompressible_subject(subj, X=96, Y=96, Z=8, T=10,
                                  r_lv=14.0, wall=6.0, amp=0.25):
    os.makedirs(subj, exist_ok=True)
    image, seg = sax_phantom(X, Y, Z, T, r_lv=r_lv, wall=wall, amp=amp,
                             noise=0.05, incompressible=True)
    pixdim, dt = (1.8, 1.8, 10.0), 0.04
    affine = np.diag([-pixdim[0], -pixdim[1], pixdim[2], 1.0])
    affine[:3, 3] = (X * pixdim[0] / 2, Y * pixdim[1] / 2,
                     -Z * pixdim[2] / 2)
    hdr = nifti.Nifti1Header()
    hdr.dim[0] = 4
    hdr.dim[1:5] = image.shape
    hdr.pixdim[1:5] = (pixdim[0], pixdim[1], pixdim[2], dt)
    nifti.save(nifti.Nifti1Image(image, affine, hdr),
               os.path.join(subj, "sa.nii.gz"))
    nifti.save(nifti.Nifti1Image(seg.astype(np.float64), affine, hdr.copy()),
               os.path.join(subj, "seg_sa.nii.gz"))
    for name in ("sa", "seg_sa"):
        nim = nifti.load(os.path.join(subj, f"{name}.nii.gz"))
        nifti.save(nifti.Nifti1Image(np.asanyarray(nim.dataobj)[:, :, :, 0],
                                     nim.affine),
                   os.path.join(subj, f"{name}_ED.nii.gz"))


def test_strain_physiological_ranges_on_incompressible_phantom(tmp_path):
    """Full SA strain pipeline on an analytic incompressible phantom:
    peak global Ecc lands in the physiological -15..-25% window and near
    the closed-form truth; peak Err is positive, bounded, and near its
    truth; warp-Dice stays high."""
    r_lv, wall, amp = 14.0, 6.0, 0.25
    subj = str(tmp_path / "s")
    _write_incompressible_subject(subj, r_lv=r_lv, wall=wall, amp=amp)

    # closed-form ES strains of the phantom
    s = 1 - amp
    r_es = r_lv * s
    R0 = r_lv + wall
    R_es = math.sqrt(r_es ** 2 + R0 ** 2 - r_lv ** 2)
    ecc_truth = 0.5 * ((r_es / r_lv - 1) + (R_es / R0 - 1)) * 100  # -18.2
    err_truth = ((R_es - r_es) / wall - 1) * 100                   # +20.5

    out = tmp_path / "motion"
    out.mkdir()
    cfg = RegConfig(spacing=8, levels=2, iters=40, lr=0.5, be_weight=1e-2)
    df = cine_2d_sa_motion_and_strain_analysis(
        subj, str(out), str(tmp_path / "strain"), cfg, eval_dice=True)

    cir = pd.read_csv(str(tmp_path / "strain_circum.csv"), index_col=0)
    rad = pd.read_csv(str(tmp_path / "strain_radial.csv"), index_col=0)
    ecc_peak = float(cir.loc["Global"].min())
    err_peak = float(rad.loc["Global"].max())

    # physiological window (peak global Ecc of a healthy LV)
    assert -25.0 <= ecc_peak <= -15.0, f"peak Ecc {ecc_peak:.1f}%"
    assert 0.0 < err_peak < 40.0, f"peak Err {err_peak:.1f}%"
    # and close to the analytic truth (measured: -18.8 vs -18.2, 17.5 vs 20.5)
    assert abs(ecc_peak - ecc_truth) < 4.0, (ecc_peak, ecc_truth)
    assert abs(err_peak - err_truth) < 8.0, (err_peak, err_truth)
    # ED column is exactly zero strain
    assert cir.loc["Global"].iloc[0] == pytest.approx(0.0, abs=1e-9)
    # independent of the strain tables, motion quality stays high
    dice = np.nanmean(df.values, axis=0)
    assert dice[0] > 0.95 and dice[1] > 0.90, dice


def test_nmi_contrast_shifted_recovery():
    """NMI's actual job (VERDICT r2 #7): recover a known warp when the
    source's intensities are remapped through a monotone nonlinearity —
    SSD's brightness-constancy assumption is broken, NMI's is not.
    Operating point mirrors ``par/ffd_aortic_motion.cfg`` (NMI + small
    bending energy)."""
    X = Y = 96
    rng = np.random.RandomState(3)
    base = ndimage.gaussian_filter(rng.rand(X, Y), 2.5)
    base = (base - base.min()) / (base.max() - base.min())
    tgt_gray = (base * 1000.0).astype(np.float32)

    # monotone, strongly nonlinear remap: gamma + offset + rescale
    src_gray = (np.power(base, 2.2) * 430.0 + 200.0).astype(np.float32)

    s_true = 16
    Cx, Cy = lattice_shape((X, Y), s_true)
    ctrl = rng.randn(Cx, Cy, 2).astype(np.float32) * 2.0
    disp_true = np.asarray(bspline_dense_field(jnp.asarray(ctrl), (X, Y),
                                               s_true))
    # target = warped ORIGINAL contrast; source = unwarped REMAPPED one
    tgt = np.asarray(warp_image(jnp.asarray(tgt_gray),
                                jnp.asarray(disp_true)))

    cfg = RegConfig(spacing=8, levels=2, iters=60, lr=0.5, be_weight=1e-3,
                    metric="nmi")
    reg = make_register_pair((X, Y), cfg)
    controls = reg(jnp.asarray(tgt), jnp.asarray(src_gray))
    disp_est = np.asarray(total_field(controls, (X, Y), cfg))

    m = 12
    epe = np.linalg.norm((disp_est - disp_true)[m:-m, m:-m], axis=-1)
    true_mag = np.linalg.norm(disp_true[m:-m, m:-m], axis=-1)
    assert epe.mean() < 0.75, f"mean EPE {epe.mean():.3f} px"
    assert epe.mean() < true_mag.mean(), "no better than identity"

    # control experiment: SSD on the same contrast-shifted pair must do
    # clearly worse than NMI (it chases brightness, not structure)
    cfg_ssd = RegConfig(spacing=8, levels=2, iters=60, lr=0.5,
                        be_weight=1e-3, metric="ssd")
    reg_ssd = make_register_pair((X, Y), cfg_ssd)
    disp_ssd = np.asarray(total_field(
        reg_ssd(jnp.asarray(tgt), jnp.asarray(src_gray)), (X, Y), cfg_ssd))
    epe_ssd = np.linalg.norm((disp_ssd - disp_true)[m:-m, m:-m], axis=-1)
    assert epe.mean() < epe_ssd.mean(), (epe.mean(), epe_ssd.mean())
