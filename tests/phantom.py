"""Synthetic cardiac phantoms with analytically known geometry.

The reference has no test suite (SURVEY.md §4); correctness there is
enforced only by runtime QC gates.  These generators provide ground truth
for ours: ellipsoidal "ventricles" whose volumes, areas and wall
thicknesses are known in closed form, with a cyclic contraction over time
so ED/ES selection, volume curves and strain have known answers.

Label conventions follow the reference (``train_network.py:157-167``):
  SA:  0=BG, 1=LV cavity, 2=Myocardium, 3=RV cavity
  LA 2ch: 0=BG, 1=LA;  LA 4ch: 0=BG, 1=LA, 2=RA
  seg4 LA 4ch: 0=BG, 1=LV, 2=Myo, 3=RV, 4=LA, 5=RA
  Aortic: 0=BG, 1=AAo, 2=DAo
"""

from __future__ import annotations

import math
import os

import numpy as np

from ukbb_cardiac_tpu.io import nifti


def _disk(X, Y, cx, cy, r):
    xx, yy = np.meshgrid(np.arange(X), np.arange(Y), indexing="ij")
    return ((xx - cx) ** 2 + (yy - cy) ** 2) <= r * r


def contraction(T, amp=0.3):
    """Cyclic radius scale over the cardiac cycle: 1 at t=0 (ED), minimum
    (1-amp) mid-cycle (ES)."""
    t = np.arange(T) / float(T)
    return 1.0 - amp * np.sin(np.pi * t) ** 2


def sax_phantom(X=96, Y=96, Z=8, T=12, r_lv=12.0, wall=5.0, amp=0.3,
                noise=0.05, rng=None, incompressible=False):
    """Short-axis cine: LV disk + myocardial annulus + RV crescent.

    Returns (image, seg) of shape (X, Y, Z, T) with image in [0, 1000].
    ED = frame 0 (max LV area); ES = argmin of the contraction curve.

    ``incompressible=True`` conserves the myocardial annulus area over
    the cycle (outer radius R(t) = sqrt(r(t)^2 + R0^2 - r0^2)), so the
    wall thickens as the cavity contracts — the analytic mid-wall
    circumferential strain is (r_mid(ES)/r_mid(ED) - 1) * 100 and radial
    strain (wall(ES)/wall(ED) - 1) * 100 is positive, like a real LV.
    """
    rng = rng or np.random.RandomState(0)
    cx, cy = X // 2, Y // 2
    scale = contraction(T, amp)
    image = np.zeros((X, Y, Z, T), np.float32)
    seg = np.zeros((X, Y, Z, T), np.int16)
    R0 = r_lv + wall
    for t in range(T):
        r = r_lv * scale[t]
        R = (math.sqrt(r * r + R0 * R0 - r_lv * r_lv) if incompressible
             else r + wall)
        lv = _disk(X, Y, cx, cy, r)
        epi = _disk(X, Y, cx, cy, R)
        myo = epi & ~lv
        # RV: crescent to the "left" (negative x) of the LV
        rv_full = _disk(X, Y, cx - (R + 4), cy, r * 0.9 + 3)
        rv = rv_full & ~epi
        for z in range(Z):
            sl = np.zeros((X, Y), np.int16)
            sl[rv] = 3
            sl[myo] = 2
            sl[lv] = 1
            seg[:, :, z, t] = sl
            img = np.zeros((X, Y), np.float32)
            img[lv] = 800.0
            img[myo] = 300.0
            img[rv] = 700.0
            img += rng.randn(X, Y).astype(np.float32) * noise * 1000.0
            image[:, :, z, t] = np.clip(img, 0, 1000)
    return image, seg


def la_phantom(X=96, Y=96, T=12, n_class=2, amp=0.3, noise=0.05, rng=None,
               r_la=10.0):
    """Long-axis cine (single slice): LA ellipse (+ RA for 4ch).

    Atria EXPAND when ventricles contract: area is max mid-cycle, so the
    reference's argmax-of-label-1 ES rule picks mid-cycle.
    ``r_la``: baseline LA radius in px (RA scales with it).
    Returns (image, seg) of shape (X, Y, 1, T).
    """
    rng = rng or np.random.RandomState(1)
    cx, cy = X // 2, Y // 2
    scale = 2.0 - contraction(T, amp)  # expands when ventricle contracts
    image = np.zeros((X, Y, 1, T), np.float32)
    seg = np.zeros((X, Y, 1, T), np.int16)
    off = max(12, int(math.ceil(r_la * 2.0 * 0.6)))
    for t in range(T):
        r = r_la * scale[t]
        la = _disk(X, Y, cx - off, cy, r)
        seg[:, :, 0, t][la] = 1
        img = np.zeros((X, Y), np.float32)
        img[la] = 750.0
        if n_class >= 3:
            ra = _disk(X, Y, cx + max(14, int(math.ceil(r_la * 1.4))), cy,
                       r * 0.8)
            seg[:, :, 0, t][ra & ~la] = 2
            img[ra & ~la] = 650.0
        img += rng.randn(X, Y).astype(np.float32) * noise * 1000.0
        image[:, :, 0, t] = np.clip(img, 0, 1000)
    return image, seg


def seg4_la_phantom(X=96, Y=96, T=12, amp=0.3, noise=0.05, rng=None,
                    zoom=1.0):
    """4-chamber long-axis phantom with all 5 foreground classes
    (LV, Myo, RV, LA, RA) for `la_pass_quality_control` paths.
    ``zoom`` scales every chamber radius and centre offset together, so
    the anatomy stays consistent while its size varies."""
    rng = rng or np.random.RandomState(2)
    cx, cy = X // 2, Y // 2
    scale = contraction(T, amp)
    image = np.zeros((X, Y, 1, T), np.float32)
    seg = np.zeros((X, Y, 1, T), np.int16)
    z = zoom
    for t in range(T):
        r = 11.0 * z * scale[t]
        lv = _disk(X, Y, cx - 10 * z, cy - 12 * z, r)
        epi = _disk(X, Y, cx - 10 * z, cy - 12 * z, r + 4 * z)
        myo = epi & ~lv
        rv = _disk(X, Y, cx + 14 * z, cy - 12 * z, r * 0.9) & ~epi
        la = _disk(X, Y, cx - 10 * z, cy + 16 * z,
                   8.0 * z * (2.0 - scale[t])) & ~epi
        ra = _disk(X, Y, cx + 14 * z, cy + 16 * z,
                   7.0 * z * (2.0 - scale[t])) & ~(epi | la | rv)
        sl = np.zeros((X, Y), np.int16)
        sl[rv] = 3
        sl[myo] = 2
        sl[lv] = 1
        sl[la] = 4
        sl[ra] = 5
        seg[:, :, 0, t] = sl
        img = np.zeros((X, Y), np.float32)
        for lab, inten in ((1, 800), (2, 300), (3, 700), (4, 750), (5, 650)):
            img[sl == lab] = inten
        img += rng.randn(X, Y).astype(np.float32) * noise * 1000.0
        image[:, :, 0, t] = np.clip(img, 0, 1000)
    return image, seg


def ao_phantom(X=96, Y=96, T=16, noise=0.05, rng=None,
               r_aa=9.0, r_da=6.0, pulse_amp=0.15):
    """Aortic cine (single slice): pulsating ascending (label 1) and
    descending (label 2) aortic cross-sections.

    ``r_aa``/``r_da``: baseline vessel radii (px); ``pulse_amp``:
    fractional radius pulsation over the cycle — analytic max/min areas
    and distensibility follow in closed form, which the accuracy
    capstone (bench_accuracy.py) scores against."""
    rng = rng or np.random.RandomState(3)
    image = np.zeros((X, Y, 1, T), np.float32)
    seg = np.zeros((X, Y, 1, T), np.int16)
    pulse = 1.0 + pulse_amp * np.sin(2 * np.pi * np.arange(T) / T)
    # centre offsets grow with the peak radii so randomised large vessels
    # can never overlap (they'd paint contradictory image/label data);
    # at the default geometry these evaluate to the historical 14/16
    peak = 1.0 + pulse_amp
    off_aa = max(14, int(math.ceil(r_aa * peak)) + 2)
    off_da = max(16, int(math.ceil(r_da * peak)) + 2)
    for t in range(T):
        aa = _disk(X, Y, X // 2 - off_aa, Y // 2, r_aa * pulse[t])
        da = _disk(X, Y, X // 2 + off_da, Y // 2, r_da * pulse[t])
        seg[:, :, 0, t][aa] = 1
        seg[:, :, 0, t][da & ~aa] = 2
        img = np.zeros((X, Y), np.float32)
        img[aa] = 900.0
        img[da] = 850.0
        img += rng.randn(X, Y).astype(np.float32) * noise * 1000.0
        image[:, :, 0, t] = np.clip(img, 0, 1000)
    return image, seg


def write_subject(subject_dir: str, seqs=("sa",), X=96, Y=96, Z=8, T=12,
                  pixdim=(1.8, 1.8, 10.0), dt=0.04, with_seg=False,
                  rng=None):
    """Write phantom NIfTIs into a subject directory, mirroring the
    UK Biobank layout ``<dir>/<eid>/{sa,la_2ch,la_4ch,ao}.nii.gz``.

    Returns {seq: (image, seg)}.  If ``with_seg``, also writes
    ``seg_<seq>.nii.gz`` ground truth (as the deploy step would).
    """
    os.makedirs(subject_dir, exist_ok=True)
    out = {}
    for seq in seqs:
        if seq == "sa":
            image, seg = sax_phantom(X, Y, Z, T, rng=rng)
            dz = pixdim[2]
        elif seq == "la_2ch":
            image, seg = la_phantom(X, Y, T, n_class=2, rng=rng)
            dz = pixdim[2]
        elif seq == "la_4ch":
            image, seg = la_phantom(X, Y, T, n_class=3, rng=rng)
            dz = pixdim[2]
        elif seq == "ao":
            image, seg = ao_phantom(X, Y, T, rng=rng)
            dz = pixdim[2]
        else:
            raise ValueError(seq)
        affine = np.diag([-pixdim[0], -pixdim[1], dz, 1.0])
        affine[:3, 3] = (X * pixdim[0] / 2, Y * pixdim[1] / 2, -seg.shape[2] * dz / 2)
        hdr = nifti.Nifti1Header()
        hdr.dim[0] = 4
        hdr.dim[1:5] = image.shape
        hdr.pixdim[1:5] = (pixdim[0], pixdim[1], dz, dt)
        nifti.save(nifti.Nifti1Image(image, affine, hdr),
                   os.path.join(subject_dir, f"{seq}.nii.gz"))
        if with_seg:
            nifti.save(nifti.Nifti1Image(seg.astype(np.float64), affine, hdr.copy()),
                       os.path.join(subject_dir, f"seg_{seq}.nii.gz"))
        out[seq] = (image, seg)
    return out
