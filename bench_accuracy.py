"""End-to-end accuracy capstone: train → deploy → phenotypes vs truth.

Trains the production SA FCN configuration FROM SCRATCH on a cohort of
randomised short-axis phantoms (cavity radius, wall thickness,
contraction amplitude, noise level and heart position all vary per
subject), deploys the trained network on held-out subjects through the
batched inference engine, and scores against the analytic ground truth:

- segmentation Dice (LV / Myo / RV) over the full held-out cines,
- clinical measures (LVEDV / LVEF / LVM / RVEF,
  ``phenotype/ventricle.py``) of the predicted segmentation against the
  same measures of the ground-truth segmentation,
- bf16 deploy agreement with f32 on the SAME trained weights — real
  decision boundaries, the measurement the README's mixed-precision
  claim rests on (a random-weight net produces near-uniform logits,
  which *overstates* disagreement).

The reference has no such check: it ships no tests and no synthetic
truth (SURVEY.md §4); its training quality is only observable through
TensorBoard Dice on private UKB data (``train_network.py:276-308``).
Here the whole loop — sampler, augmentation, optimiser, BN statistics,
checkpoint store, batched deploy, phenotype reductions — is verified
against closed-form anatomy in one command.

Usage:
    python bench_accuracy.py                 # production scale (TPU)
    python bench_accuracy.py --smoke         # tiny CPU-sized run

Prints ONE JSON line with the scores.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import tempfile
import time

import numpy as np


def _mean_or_none(values, digits=2):
    """nan-mean rounded, or None when every entry is NaN (degenerate
    predictions) — keeps the printed line strict JSON (no bare NaN)."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        m = float(np.nanmean(np.asarray(values, np.float64)))
    return None if np.isnan(m) else round(m, digits)


def _cohort_geometry(shape4):
    """The cohorts' shared NIfTI geometry: 1.8 mm in-plane, 10 mm slices,
    40 ms frames, RAS-negated in-plane axes (one definition so the SA and
    aortic writers cannot diverge).  Returns (affine, 4D header)."""
    from ukbb_cardiac_tpu.io import nifti

    X, Y, Z = shape4[0], shape4[1], shape4[2]
    affine = np.diag([-1.8, -1.8, 10.0, 1.0])
    affine[:3, 3] = (X * 1.8 / 2, Y * 1.8 / 2, -Z * 10.0 / 2)
    hdr = nifti.Nifti1Header()
    hdr.dim[0] = 4
    hdr.dim[1:5] = shape4
    hdr.pixdim[1:5] = (1.8, 1.8, 10.0, 0.04)
    return affine, hdr


def make_phantom_cohort(root: str, n_train: int, n_val: int, n_test: int,
                        size: int, Z: int, T: int, seed: int = 0):
    """Write a randomised phantom cohort in the trainer's dataset layout
    (``train/sa.py::scan_dataset``): ``{train,validation,test}/<eid>/``
    with ``sa_{ED,ES}.nii.gz`` + ``label_sa_{ED,ES}.nii.gz``; test
    subjects additionally keep their full cine + ground-truth seg in
    memory (returned) for deploy-time scoring.

    Geometry varies per subject — radius, wall, contraction amplitude,
    noise, and the heart's position in the frame (so the network cannot
    learn a fixed-location prior).
    """
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    from phantom import sax_phantom

    from ukbb_cardiac_tpu.io import nifti

    test_cines = []
    idx = 0
    for subset, n in (("train", n_train), ("validation", n_val),
                      ("test", n_test)):
        for i in range(n):
            rng = np.random.RandomState(seed + idx)
            idx += 1
            r_lv = size * (0.08 + 0.05 * rng.rand())
            wall = size * (0.030 + 0.018 * rng.rand())
            amp = 0.20 + 0.20 * rng.rand()
            noise = 0.03 + 0.04 * rng.rand()
            image, seg = sax_phantom(size, size, Z, T, r_lv=r_lv, wall=wall,
                                     amp=amp, noise=noise, rng=rng)
            image = np.round(image).astype(np.int16)  # UKB cines are int16
            # randomise the heart's position (torus roll keeps the
            # anatomy intact; offsets stay clear of the RV's left extent)
            dx, dy = rng.randint(-size // 10, size // 10 + 1, size=2)
            image = np.roll(image, (dx, dy), axis=(0, 1))
            seg = np.roll(seg, (dx, dy), axis=(0, 1))

            d = os.path.join(root, subset, f"{subset}{i:02d}")
            os.makedirs(d, exist_ok=True)
            affine, hdr = _cohort_geometry(image.shape)
            es = int(np.argmin(np.sum(seg == 1, axis=(0, 1, 2))))
            for fr, t in (("ED", 0), ("ES", es)):
                nifti.save(nifti.Nifti1Image(image[:, :, :, t], affine),
                           os.path.join(d, f"sa_{fr}.nii.gz"))
                nifti.save(
                    nifti.Nifti1Image(seg[:, :, :, t].astype(np.int16),
                                      affine),
                    os.path.join(d, f"label_sa_{fr}.nii.gz"))
            if subset == "test":
                test_cines.append((image, seg, hdr))
    return test_cines


def run(iters=2000, size=192, Z=8, T=16, n_train=16, n_val=2, n_test=4,
        batch_slices=20, steps_per_dispatch=10, num_filter=16, num_level=5,
        seed=0, keep_dir=None, progress_every=200):
    import jax.numpy as jnp

    from ukbb_cardiac_tpu.infer.engine import (InferenceEngine,
                                               SegmentationModel)
    from ukbb_cardiac_tpu.ops.metrics import np_categorical_dice
    from ukbb_cardiac_tpu.phenotype.ventricle import (
        ventricular_volume_measures_from_seg)
    from ukbb_cardiac_tpu.train.sa import SATrainConfig, train

    root = keep_dir or tempfile.mkdtemp(prefix="bench_accuracy_")
    try:
        test_cines = make_phantom_cohort(root, n_train, n_val, n_test,
                                         size, Z, T, seed=seed)

        cfg = SATrainConfig(
            seq_name="sa", image_size=size, num_filter=num_filter,
            num_level=num_level, learning_rate=1e-3,
            dataset_dir=root, checkpoint_dir=os.path.join(root, "ckpt"),
            batch_slices=batch_slices,
            steps_per_dispatch=steps_per_dispatch,
            device_augment=True, bf16=True, compact_transfer=True,
            cache_gb=1.0,
            validation_every=max(steps_per_dispatch * 50, 100),
            checkpoint_every=10 ** 9, seed=seed)
        t0 = time.time()
        params, state, names, model_cfg = train(cfg, max_iterations=iters,
                                                progress_every=progress_every)
        train_s = time.time() - t0

        engines = {
            "f32": InferenceEngine(SegmentationModel.from_fcn(
                params, state, names, model_cfg, jnp.float32)),
            "bf16": InferenceEngine(SegmentationModel.from_fcn(
                params, state, names, model_cfg, jnp.bfloat16)),
        }

        dice = {k: [] for k in ("lv", "myo", "rv")}
        bf16_dice_lv, agree, es_match = [], [], []
        errs = {"LVEDV": [], "LVEF": [], "LVM": [], "RVEF": []}
        for image, seg_gt, hdr in test_cines:
            # the fused deploy path (percentile rescale + forward + argmax
            # in one program) — the trainer rescales every batch to [0,1]
            # (train/sa.py), so deploy must apply the same normalisation
            pred = {name: eng.segment_sequence_fused(image)
                    for name, eng in engines.items()}
            for k, lab in (("lv", 1), ("myo", 2), ("rv", 3)):
                dice[k].append(np_categorical_dice(pred["f32"], seg_gt, lab))
            bf16_dice_lv.append(np_categorical_dice(pred["bf16"], seg_gt, 1))
            agree.append(float(np.mean(pred["bf16"] == pred["f32"])))

            m_pred = ventricular_volume_measures_from_seg(pred["f32"], hdr)
            m_gt = ventricular_volume_measures_from_seg(seg_gt, hdr)
            # the deploy ES rule (argmin LV count, deploy_network.py:127)
            # must pick the same frame on the prediction as on the truth
            es_match.append(
                int(np.argmin(np.sum(pred["f32"] == 1, axis=(0, 1, 2))))
                == int(np.argmin(np.sum(seg_gt == 1, axis=(0, 1, 2)))))
            # volumes/mass as relative %, ejection fractions as
            # percentage-point differences (EF is already a percentage)
            errs["LVEDV"].append(100 * abs(m_pred["LVEDV"] - m_gt["LVEDV"])
                                 / m_gt["LVEDV"])
            errs["LVM"].append(100 * abs(m_pred["LVEDM"] - m_gt["LVEDM"])
                               / m_gt["LVEDM"])
            errs["LVEF"].append(abs(m_pred["LVEF"] - m_gt["LVEF"]))
            errs["RVEF"].append(abs(m_pred["RVEF"] - m_gt["RVEF"]))

        out = {
            "metric": "trained_phantom_accuracy",
            "iters": iters, "image_size": size,
            "train_subjects": n_train, "test_subjects": n_test,
            "train_s": round(train_s, 1),
            "dice_lv": round(float(np.mean(dice["lv"])), 4),
            "dice_myo": round(float(np.mean(dice["myo"])), 4),
            "dice_rv": round(float(np.mean(dice["rv"])), 4),
            "lvedv_mae_pct": _mean_or_none(errs["LVEDV"]),
            "lvm_mae_pct": _mean_or_none(errs["LVM"]),
            "lvef_mae_pp": _mean_or_none(errs["LVEF"]),
            "rvef_mae_pp": _mean_or_none(errs["RVEF"]),
            "es_frame_match": round(float(np.mean(es_match)), 3),
            "bf16_label_agreement": round(float(np.mean(agree)), 5),
            "bf16_dice_lv": round(float(np.mean(bf16_dice_lv)), 4),
        }
        return out
    finally:
        if keep_dir is None:
            shutil.rmtree(root, ignore_errors=True)


def make_la_cohort(root: str, n_train: int, n_val: int, n_test: int,
                   size: int, T: int, seed: int = 0):
    """Write a randomised long-axis phantom cohort for all three LA
    networks in the trainer's layout (``train/sa.py::scan_dataset``):
    per subject ``la_2ch_{ED,ES}`` (+labels), ``la_4ch_{ED,ES}`` and
    ``la_4ch_seg4_{ED,ES}``.  The 4ch 3-class labels are DERIVED from
    the 6-class seg4 phantom (LA=4→1, RA=5→2) so the two 4ch networks
    see the same anatomy, exactly like the reference's annotation
    pipeline (one cvi42 contour set rasterised at two granularities).

    Atrial radii, contraction amplitude, noise and position vary per
    subject.  Test subjects keep their full cines + ground truth in
    memory for deploy-time scoring.  ED = frame 0; ES per the deploy
    rules (``deploy_network.py:127-130``): argmax label-1 for la views,
    argmin LV for seg4.
    """
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    from phantom import la_phantom, seg4_la_phantom

    from ukbb_cardiac_tpu.io import nifti

    # world-consistent planes (same construction as tests/test_cohort.py):
    # the LA plane maps its in-plane y axis onto the world long axis z
    affine_la = np.array([[-1.8, 0, 0, size * 1.8 / 2],
                          [0, 0, 10.0, 0.0],
                          [0, -1.8, 0, size * 1.8 / 2],
                          [0, 0, 0, 1.0]])

    test_cines = []
    idx = 0
    for subset, n in (("train", n_train), ("validation", n_val),
                      ("test", n_test)):
        for i in range(n):
            rng = np.random.RandomState(3000 + seed + idx)
            idx += 1
            amp = 0.20 + 0.20 * rng.rand()
            noise = 0.03 + 0.04 * rng.rand()
            r_la = size * (0.08 + 0.05 * rng.rand())
            zoom = size / 96.0 * (0.8 + 0.4 * rng.rand())
            la2_img, la2_seg = la_phantom(size, size, T, n_class=2, amp=amp,
                                          noise=noise, rng=rng, r_la=r_la)
            s4_img, s4_seg = seg4_la_phantom(size, size, T, amp=amp,
                                             noise=noise, rng=rng, zoom=zoom)
            la4_seg = np.zeros_like(s4_seg)
            la4_seg[s4_seg == 4] = 1
            la4_seg[s4_seg == 5] = 2
            subj = {"la_2ch": (la2_img, la2_seg),
                    "la_4ch": (s4_img, la4_seg),
                    "la_4ch_seg4": (s4_img, s4_seg)}

            d = os.path.join(root, subset, f"{subset}{i:02d}")
            os.makedirs(d, exist_ok=True)
            hdr = nifti.Nifti1Header()
            hdr.dim[0] = 4
            hdr.dim[1:5] = (size, size, 1, T)
            hdr.pixdim[1:5] = (1.8, 1.8, 10.0, 0.04)
            kept = {}
            # one translation per SUBJECT applied to every sequence, so
            # la_4ch and la_4ch_seg4 really do see the same anatomy (one
            # cvi42 contour set rasterised at two granularities)
            dx, dy = rng.randint(-size // 10, size // 10 + 1, size=2)
            for seq, (image, seg) in subj.items():
                image = np.round(image).astype(np.int16)
                image = np.roll(image, (dx, dy), axis=(0, 1))
                seg = np.roll(seg, (dx, dy), axis=(0, 1))
                if seq == "la_4ch_seg4":
                    es = int(np.argmin(np.sum(seg == 1, axis=(0, 1, 2))))
                else:
                    es = int(np.argmax(np.sum(seg == 1, axis=(0, 1, 2))))
                for fr, t in (("ED", 0), ("ES", es)):
                    nifti.save(
                        nifti.Nifti1Image(image[:, :, :, t], affine_la),
                        os.path.join(d, f"{seq}_{fr}.nii.gz"))
                    nifti.save(
                        nifti.Nifti1Image(seg[:, :, :, t].astype(np.int16),
                                          affine_la),
                        os.path.join(d, f"label_{seq}_{fr}.nii.gz"))
                kept[seq] = (image, seg)
            if subset == "test":
                test_cines.append((kept, hdr.copy()))
    return test_cines, affine_la


def run_la(iters=1000, size=192, T=16, n_train=16, n_val=2, n_test=4,
           batch_slices=20, steps_per_dispatch=10, num_filter=16,
           num_level=5, seed=0, keep_dir=None, progress_every=200):
    """Long-axis twin of :func:`run`: train the THREE LA networks the
    reference releases (``FCN_la_2ch``, ``FCN_la_4ch``,
    ``FCN_la_4ch_seg4``, ``demo_pipeline.py:50-54``) from scratch on
    randomised LA phantoms, deploy through the fused engine, and score
    Dice + the atrial area–length measures (biplane LA volume, RA
    volume, EFs — ``eval_atrial_volume.py``) of the predicted
    segmentations against the same measures of the ground truth."""
    import jax.numpy as jnp

    from ukbb_cardiac_tpu.infer.engine import (InferenceEngine,
                                               SegmentationModel)
    from ukbb_cardiac_tpu.io import nifti
    from ukbb_cardiac_tpu.ops.metrics import np_categorical_dice
    from ukbb_cardiac_tpu.phenotype.atrium import atrial_volume_measures
    from ukbb_cardiac_tpu.train.sa import SATrainConfig, train

    root = keep_dir or tempfile.mkdtemp(prefix="bench_accuracy_la_")
    try:
        test_cines, affine_la = make_la_cohort(root, n_train, n_val, n_test,
                                               size, T, seed=seed)

        engines = {}
        train_s = 0.0
        for seq in ("la_2ch", "la_4ch", "la_4ch_seg4"):
            cfg = SATrainConfig(
                seq_name=seq, image_size=size, num_filter=num_filter,
                num_level=num_level, learning_rate=1e-3,
                dataset_dir=root, checkpoint_dir=os.path.join(root, "ckpt"),
                batch_slices=batch_slices,
                steps_per_dispatch=steps_per_dispatch,
                device_augment=True, bf16=True, compact_transfer=True,
                cache_gb=1.0,
                validation_every=max(steps_per_dispatch * 50, 100),
                checkpoint_every=10 ** 9, seed=seed)
            t0 = time.time()
            params, state, names, model_cfg = train(
                cfg, max_iterations=iters, progress_every=progress_every)
            train_s += time.time() - t0
            engines[seq] = {
                "f32": InferenceEngine(SegmentationModel.from_fcn(
                    params, state, names, model_cfg, jnp.float32)),
                "bf16": InferenceEngine(SegmentationModel.from_fcn(
                    params, state, names, model_cfg, jnp.bfloat16)),
            }

        dice = {"la_2ch": [], "la_4ch_la": [], "la_4ch_ra": [], "seg4": []}
        agree, es_match = [], []
        errs = {"LAV_bip_max": [], "RAV_4ch_max": [], "LAEF_bip": [],
                "RAEF_4ch": []}
        # a stub SA volume supplies the long-axis direction (its affine's
        # z column), exactly what atrial_volume_measures reads from it
        affine_sa = np.diag([-1.8, -1.8, 10.0, 1.0])
        for si, (kept, hdr) in enumerate(test_cines):
            pred = {}
            for seq, engs in engines.items():
                image = kept[seq][0]
                pred[seq] = {name: eng.segment_sequence_fused(image)
                             for name, eng in engs.items()}
                agree.append(float(np.mean(pred[seq]["bf16"]
                                           == pred[seq]["f32"])))
            dice["la_2ch"].append(np_categorical_dice(
                pred["la_2ch"]["f32"], kept["la_2ch"][1], 1))
            dice["la_4ch_la"].append(np_categorical_dice(
                pred["la_4ch"]["f32"], kept["la_4ch"][1], 1))
            dice["la_4ch_ra"].append(np_categorical_dice(
                pred["la_4ch"]["f32"], kept["la_4ch"][1], 2))
            dice["seg4"].append(np.mean([np_categorical_dice(
                pred["la_4ch_seg4"]["f32"], kept["la_4ch_seg4"][1], k)
                for k in range(1, 6)]))
            # the LA deploy ES rule (argmax label-1, deploy_network.py:130)
            es_match.append(
                int(np.argmax(np.sum(pred["la_2ch"]["f32"] == 1,
                                     axis=(0, 1, 2))))
                == int(np.argmax(np.sum(kept["la_2ch"][1] == 1,
                                        axis=(0, 1, 2)))))

            # atrial measures of pred vs truth through the real
            # file-level entry point (eval_atrial_volume.py semantics)
            vals = {}
            for which in ("pred", "gt"):
                d = os.path.join(root, f"score_{which}_{si}")
                os.makedirs(d, exist_ok=True)
                src = (lambda seq: pred[seq]["f32"]) if which == "pred" \
                    else (lambda seq: kept[seq][1])
                for seq in ("la_2ch", "la_4ch"):
                    nifti.save(nifti.Nifti1Image(
                        src(seq).astype(np.int16), affine_la, hdr.copy()),
                        os.path.join(d, f"seg_{seq}.nii.gz"))
                nifti.save(nifti.Nifti1Image(
                    np.zeros((2, 2, 2), np.int16), affine_sa),
                    os.path.join(d, "sa.nii.gz"))
                vals[which] = atrial_volume_measures(d)
            if vals["pred"] is not None and vals["gt"] is not None:
                for k in ("LAV_bip_max", "RAV_4ch_max"):
                    if vals["gt"][k] > 0:
                        errs[k].append(100 * abs(vals["pred"][k]
                                                 - vals["gt"][k])
                                       / vals["gt"][k])
                for k in ("LAEF_bip", "RAEF_4ch"):
                    errs[k].append(abs(vals["pred"][k] - vals["gt"][k]))

        return {
            "metric": "trained_phantom_accuracy_la",
            "iters": iters, "image_size": size,
            "train_subjects": n_train, "test_subjects": n_test,
            "train_s": round(train_s, 1),
            "dice_la_2ch": round(float(np.mean(dice["la_2ch"])), 4),
            "dice_la_4ch_la": round(float(np.mean(dice["la_4ch_la"])), 4),
            "dice_la_4ch_ra": round(float(np.mean(dice["la_4ch_ra"])), 4),
            "dice_seg4_mean": round(float(np.mean(dice["seg4"])), 4),
            "lav_bip_max_mae_pct": _mean_or_none(errs["LAV_bip_max"]),
            "rav_4ch_max_mae_pct": _mean_or_none(errs["RAV_4ch_max"]),
            "laef_mae_pp": _mean_or_none(errs["LAEF_bip"]),
            "raef_mae_pp": _mean_or_none(errs["RAEF_4ch"]),
            "es_frame_match": round(float(np.mean(es_match)), 3),
            "bf16_label_agreement": round(float(np.mean(agree)), 5),
            "atrial_measures_scored": sum(len(v) for v in errs.values()) > 0,
        }
    finally:
        if keep_dir is None:
            shutil.rmtree(root, ignore_errors=True)


def make_ao_cohort(root: str, n_train: int, n_val: int, n_test: int,
                   size: int, T: int, seed: int = 0):
    """Write a randomised aortic phantom cohort in the aortic trainer's
    layout (``train/ao.py::scan_dataset_ao``): ``ao.nii.gz`` + sparse
    ``label_ao`` (two annotated frames, reference-style) + dense
    ``label_ao_prop`` (the propagated labels the reference trainer
    consumes, ``train_network_ao.py:121-124``).  Vessel radii, pulsation,
    noise and position vary per subject."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    from phantom import ao_phantom

    from ukbb_cardiac_tpu.io import nifti

    test_cines = []
    idx = 0
    for subset, n in (("train", n_train), ("validation", n_val),
                      ("test", n_test)):
        for i in range(n):
            rng = np.random.RandomState(7000 + seed + idx)
            idx += 1
            r_aa = size * (0.055 + 0.035 * rng.rand())
            r_da = size * (0.035 + 0.022 * rng.rand())
            pulse = 0.10 + 0.10 * rng.rand()
            noise = 0.03 + 0.04 * rng.rand()
            image, seg = ao_phantom(size, size, T, noise=noise, rng=rng,
                                    r_aa=r_aa, r_da=r_da, pulse_amp=pulse)
            image = np.round(image).astype(np.int16)  # UKB cines are int16
            dx, dy = rng.randint(-size // 12, size // 12 + 1, size=2)
            image = np.roll(image, (dx, dy), axis=(0, 1))
            seg = np.roll(seg, (dx, dy), axis=(0, 1))

            d = os.path.join(root, subset, f"{subset}{i:02d}")
            os.makedirs(d, exist_ok=True)
            affine, hdr = _cohort_geometry(image.shape)
            nifti.save(nifti.Nifti1Image(image, affine, hdr),
                       os.path.join(d, "ao.nii.gz"))
            sparse = seg.copy()
            keep = (0, T // 2)  # the reference's two annotated frames
            sparse[:, :, :, [t for t in range(T) if t not in keep]] = 0
            nifti.save(nifti.Nifti1Image(sparse.astype(np.int16), affine,
                                         hdr.copy()),
                       os.path.join(d, "label_ao.nii.gz"))
            nifti.save(nifti.Nifti1Image(seg.astype(np.int16), affine,
                                         hdr.copy()),
                       os.path.join(d, "label_ao_prop.nii.gz"))
            if subset == "test":
                test_cines.append((image, seg))
    return test_cines


def run_ao(unet_iters=400, lstm_iters=400, size=160, T=24,
           n_train=12, n_val=2, n_test=4, batch_windows=5,
           steps_per_dispatch=4, num_filter=16, num_level=5, num_hidden=16,
           weight_R=5, seed=0, keep_dir=None, progress_every=100):
    """Aortic twin of :func:`run`: two-phase UNet → UNet-LSTM training
    (``train_network_ao.py`` semantics) on randomised aortic phantoms,
    full-sequence scan deploy, scored on Dice + aortic areas +
    distensibility against the analytic truth (PP fixed at 50 mmHg)."""
    import jax.numpy as jnp

    from ukbb_cardiac_tpu.infer.deploy_ao import AorticEngine
    from ukbb_cardiac_tpu.ops.metrics import np_categorical_dice
    from ukbb_cardiac_tpu.train.ao import AoTrainConfig
    from ukbb_cardiac_tpu.train.ao import train as train_ao

    root = keep_dir or tempfile.mkdtemp(prefix="bench_accuracy_ao_")
    try:
        test_cines = make_ao_cohort(root, n_train, n_val, n_test, size, T,
                                    seed=seed)
        common = dict(
            image_size=size, num_filter=num_filter, num_level=num_level,
            num_hidden=num_hidden, weight_R=weight_R,
            dataset_dir=root, checkpoint_dir=os.path.join(root, "ckpt"),
            batch_windows=batch_windows,
            steps_per_dispatch=steps_per_dispatch, device_augment=True,
            bf16=True, compact_transfer=True, cache_gb=1.0,
            validation_every=max(steps_per_dispatch * 50, 100),
            checkpoint_every=10 ** 9, seed=seed, z_score=True)
        t0 = time.time()
        cfg1 = AoTrainConfig(model="UNet", train_batch_size=batch_windows,
                             **common)
        train_ao(cfg1, max_iterations=unet_iters,
                 progress_every=progress_every)
        unet_bundle = os.path.join(
            root, "ckpt", cfg1.model_name, f"model-{unet_iters}.npz")

        cfg2 = AoTrainConfig(model="UNet-LSTM",
                             train_batch_size=batch_windows,
                             model_path=unet_bundle, **common)
        params, state, names, ucfg = train_ao(cfg2, max_iterations=lstm_iters,
                                              progress_every=progress_every)
        train_s = time.time() - t0

        engines = {
            "f32": AorticEngine("unet_lstm", ucfg, names, params, state,
                                bidirectional=cfg2.bidirectional,
                                compute_dtype=jnp.float32),
            "bf16": AorticEngine("unet_lstm", ucfg, names, params, state,
                                 bidirectional=cfg2.bidirectional,
                                 compute_dtype=jnp.bfloat16),
        }

        PP = 50.0  # mmHg, fixed central pulse pressure for distensibility
        px_area = 1.8 * 1.8  # mm^2
        dice = {"aa": [], "da": []}
        agree, bf16_dice_aa = [], []
        errs = {"area_max": [], "area_min": [], "dist": []}
        for image, seg_gt in test_cines:
            # dispatch both precisions before resolving either so their
            # transfers/compute overlap (async dispatch)
            pending = {name: eng.segment_cine_dispatch(
                           image, z_score=True, pad_to=size)
                       for name, eng in engines.items()}
            pred = {name: p.result() for name, p in pending.items()}
            dice["aa"].append(np_categorical_dice(pred["f32"], seg_gt, 1))
            dice["da"].append(np_categorical_dice(pred["f32"], seg_gt, 2))
            bf16_dice_aa.append(np_categorical_dice(pred["bf16"], seg_gt, 1))
            agree.append(float(np.mean(pred["bf16"] == pred["f32"])))
            for lab in (1, 2):
                a_p = np.sum(pred["f32"] == lab, axis=(0, 1, 2)) * px_area
                a_g = np.sum(seg_gt == lab, axis=(0, 1, 2)) * px_area

                def dist(a):
                    # an empty predicted frame has no defined
                    # distensibility (the reference QC-gates these)
                    if a.min() <= 0:
                        return np.nan
                    return (a.max() - a.min()) / (a.min() * PP) * 1e3

                errs["area_max"].append(100 * abs(a_p.max() - a_g.max())
                                        / a_g.max())
                errs["area_min"].append(100 * abs(a_p.min() - a_g.min())
                                        / a_g.min())
                errs["dist"].append(100 * abs(dist(a_p) - dist(a_g))
                                    / dist(a_g))

        return {
            "metric": "trained_phantom_accuracy_ao",
            "unet_iters": unet_iters, "lstm_iters": lstm_iters,
            "image_size": size, "train_subjects": n_train,
            "test_subjects": n_test, "train_s": round(train_s, 1),
            "dice_aa": round(float(np.mean(dice["aa"])), 4),
            "dice_da": round(float(np.mean(dice["da"])), 4),
            "area_max_mae_pct": _mean_or_none(errs["area_max"]),
            "area_min_mae_pct": _mean_or_none(errs["area_min"]),
            "distensibility_mae_pct": _mean_or_none(errs["dist"]),
            "bf16_label_agreement": round(float(np.mean(agree)), 5),
            "bf16_dice_aa": round(float(np.mean(bf16_dice_aa)), 4),
        }
    finally:
        if keep_dir is None:
            shutil.rmtree(root, ignore_errors=True)


def train_bench_weights(out_dir: str, sa_iters=2000, la_iters=1000,
                        ao_unet_iters=400, ao_lstm_iters=400, size=192,
                        Z=8, T=16, n_train=16, n_val=2, seed=0,
                        num_filter=16, num_level=5, num_hidden=16,
                        ao_size=160, ao_T=24, progress_every=200) -> dict:
    """Train the five released-architecture models on randomised phantoms
    and save them as model bundles (``ckpt/store.py``) for bench.py.

    The perf bench's headline previously timed random weights on
    random-noise cines — fair (timing is shape-dominated) but ES-frame
    selection and QC saw noise, not anatomy (VERDICT r3 weak #4).  This
    produces a persistent weights cache so bench.py deploys TRAINED
    networks on anatomical phantom cines: the five bundles mirror the
    reference's released set (``demo_pipeline.py:50-54`` — FCN_sa,
    FCN_la_2ch, FCN_la_4ch, FCN_la_4ch_seg4, UNet-LSTM_ao).

    Writes ``<out_dir>/{FCN_sa,FCN_la_2ch,FCN_la_4ch,FCN_la_4ch_seg4,
    UNet-LSTM_ao}.npz`` and returns a summary dict.
    """
    import jax.numpy as jnp  # noqa: F401  (backend init before training)

    from ukbb_cardiac_tpu.ckpt.store import save_model
    from ukbb_cardiac_tpu.train.ao import AoTrainConfig
    from ukbb_cardiac_tpu.train.ao import train as train_ao
    from ukbb_cardiac_tpu.train.sa import SATrainConfig, train

    os.makedirs(out_dir, exist_ok=True)
    summary = {}

    def _sa_cfg(root, seq):
        return SATrainConfig(
            seq_name=seq, image_size=size, num_filter=num_filter,
            num_level=num_level, learning_rate=1e-3,
            dataset_dir=root, checkpoint_dir=os.path.join(root, "ckpt"),
            batch_slices=20, steps_per_dispatch=10,
            device_augment=True, bf16=True, compact_transfer=True,
            cache_gb=1.0, validation_every=10 ** 9,
            checkpoint_every=10 ** 9, seed=seed)

    # --- FCN_sa -----------------------------------------------------------
    root = tempfile.mkdtemp(prefix="bench_weights_sa_")
    try:
        make_phantom_cohort(root, n_train, n_val, 0, size, Z, T, seed=seed)
        t0 = time.time()
        params, state, names, model_cfg = train(
            _sa_cfg(root, "sa"), max_iterations=sa_iters,
            progress_every=progress_every)
        save_model(os.path.join(out_dir, "FCN_sa.npz"), "fcn", model_cfg,
                   names, params, state,
                   extra_meta={"trained_on": "sax_phantom",
                               "iters": sa_iters, "size": size,
                               "seed": seed})
        summary["sa_train_s"] = round(time.time() - t0, 1)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    # --- the three LA FCNs ------------------------------------------------
    root = tempfile.mkdtemp(prefix="bench_weights_la_")
    try:
        make_la_cohort(root, n_train, n_val, 0, size, T, seed=seed)
        t0 = time.time()
        for seq in ("la_2ch", "la_4ch", "la_4ch_seg4"):
            params, state, names, model_cfg = train(
                _sa_cfg(root, seq), max_iterations=la_iters,
                progress_every=progress_every)
            save_model(os.path.join(out_dir, f"FCN_{seq}.npz"), "fcn",
                       model_cfg, names, params, state,
                       extra_meta={"trained_on": "la_phantom",
                                   "iters": la_iters, "size": size,
                                   "seed": seed})
        summary["la_train_s"] = round(time.time() - t0, 1)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    # --- UNet-LSTM_ao (two-phase, train_network_ao.py semantics) ----------
    root = tempfile.mkdtemp(prefix="bench_weights_ao_")
    try:
        make_ao_cohort(root, max(n_train - 4, 3), n_val, 0, ao_size, ao_T,
                       seed=seed)
        common = dict(
            image_size=ao_size, num_filter=num_filter, num_level=num_level,
            num_hidden=num_hidden, weight_R=5,
            dataset_dir=root, checkpoint_dir=os.path.join(root, "ckpt"),
            batch_windows=5, steps_per_dispatch=4, device_augment=True,
            bf16=True, compact_transfer=True, cache_gb=1.0,
            validation_every=10 ** 9, checkpoint_every=10 ** 9,
            seed=seed, z_score=True)
        t0 = time.time()
        cfg1 = AoTrainConfig(model="UNet", train_batch_size=5, **common)
        train_ao(cfg1, max_iterations=ao_unet_iters,
                 progress_every=progress_every)
        unet_bundle = os.path.join(root, "ckpt", cfg1.model_name,
                                   f"model-{ao_unet_iters}.npz")
        cfg2 = AoTrainConfig(model="UNet-LSTM", train_batch_size=5,
                             model_path=unet_bundle, **common)
        params, state, names, ucfg = train_ao(
            cfg2, max_iterations=ao_lstm_iters,
            progress_every=progress_every)
        save_model(os.path.join(out_dir, "UNet-LSTM_ao.npz"), "unet_lstm",
                   ucfg, names, params, state,
                   extra_meta={"trained_on": "ao_phantom",
                               "iters": [ao_unet_iters, ao_lstm_iters],
                               "bidirectional": cfg2.bidirectional,
                               "seed": seed})
        summary["ao_train_s"] = round(time.time() - t0, 1)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return summary


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--size", type=int, default=192)
    ap.add_argument("--z", type=int, default=8)
    ap.add_argument("--t", type=int, default=16)
    ap.add_argument("--train", type=int, default=16)
    ap.add_argument("--val", type=int, default=2)
    ap.add_argument("--test", type=int, default=4)
    ap.add_argument("--batch_slices", type=int, default=20)
    ap.add_argument("--steps_per_dispatch", type=int, default=10)
    ap.add_argument("--filters", type=int, default=16)
    ap.add_argument("--levels", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--model", choices=("sa", "la", "ao", "both", "all"),
                    default="sa",
                    help="which capstone to run: the SA FCN, the three LA "
                         "FCNs, the aortic two-phase UNet→UNet-LSTM, "
                         "'both' (sa+ao, historical), or all three "
                         "families")
    ap.add_argument("--keep_dir", default=None,
                    help="work under this directory and keep it")
    ap.add_argument("--json_out", default=None,
                    help="also append each result as a JSON line to this "
                         "file (artifact for ACCURACY.json updates)")
    ap.add_argument("--save_models", default=None, metavar="DIR",
                    help="instead of the capstone scoring runs, train the "
                         "five released-architecture models on phantoms "
                         "and save model bundles for bench.py's "
                         "trained-weights mode (tests/fixtures/"
                         "bench_weights is where bench.py looks)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU-sized configuration")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the env sitecustomize "
                         "pins the TPU platform, so JAX_PLATFORMS alone "
                         "is ineffective — see tests/conftest.py)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ukbb_cardiac_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    if args.save_models:
        if args.smoke:
            out = train_bench_weights(
                args.save_models, sa_iters=40, la_iters=30,
                ao_unet_iters=20, ao_lstm_iters=20, size=64, Z=3, T=6,
                n_train=3, n_val=1, num_filter=4, num_level=3,
                num_hidden=4, ao_size=64, ao_T=8, seed=args.seed,
                progress_every=20)
        else:
            out = train_bench_weights(
                args.save_models, sa_iters=args.iters,
                la_iters=args.iters // 2, ao_unet_iters=args.iters // 5,
                ao_lstm_iters=args.iters // 5, size=args.size, Z=args.z,
                T=args.t, n_train=args.train, n_val=args.val,
                num_filter=args.filters, num_level=args.levels,
                seed=args.seed)
        print(json.dumps({"save_models": args.save_models, **out}))
        if args.json_out:
            with open(args.json_out, "a") as f:
                f.write(json.dumps(
                    {"save_models": args.save_models, **out}) + "\n")
        return

    outs = []
    if args.model in ("sa", "both", "all"):
        if args.smoke:
            outs.append(run(iters=60, size=64, Z=3, T=6, n_train=4, n_val=1,
                            n_test=2, batch_slices=8, steps_per_dispatch=5,
                            num_filter=4, num_level=3, seed=args.seed,
                            keep_dir=args.keep_dir))
        else:
            outs.append(run(iters=args.iters, size=args.size, Z=args.z,
                            T=args.t, n_train=args.train, n_val=args.val,
                            n_test=args.test,
                            batch_slices=args.batch_slices,
                            steps_per_dispatch=args.steps_per_dispatch,
                            num_filter=args.filters, num_level=args.levels,
                            seed=args.seed, keep_dir=args.keep_dir))
    if args.model in ("la", "all"):
        if args.smoke:
            outs.append(run_la(iters=60, size=64, T=6, n_train=4, n_val=1,
                               n_test=2, batch_slices=8,
                               steps_per_dispatch=5, num_filter=4,
                               num_level=3, seed=args.seed,
                               keep_dir=args.keep_dir))
        else:
            outs.append(run_la(iters=args.iters // 2, size=args.size,
                               T=args.t, n_train=args.train, n_val=args.val,
                               n_test=args.test,
                               batch_slices=args.batch_slices,
                               steps_per_dispatch=args.steps_per_dispatch,
                               num_filter=args.filters,
                               num_level=args.levels, seed=args.seed,
                               keep_dir=args.keep_dir))
    if args.model in ("ao", "both", "all"):
        if args.smoke:
            outs.append(run_ao(unet_iters=30, lstm_iters=30, size=64, T=8,
                               n_train=3, n_val=1, n_test=2, batch_windows=2,
                               steps_per_dispatch=3, num_filter=4,
                               num_level=3, num_hidden=4, weight_R=2,
                               seed=args.seed, keep_dir=args.keep_dir))
        else:
            outs.append(run_ao(unet_iters=args.iters // 2,
                               lstm_iters=args.iters // 2, size=args.size,
                               T=args.t, n_train=args.train, n_val=args.val,
                               n_test=args.test, num_filter=args.filters,
                               num_level=args.levels, seed=args.seed,
                               keep_dir=args.keep_dir))
    for out in outs:
        print(json.dumps(out))
    if args.json_out:
        with open(args.json_out, "a") as f:
            for out in outs:
                f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
