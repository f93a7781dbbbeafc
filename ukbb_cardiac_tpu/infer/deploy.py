"""SA/LA segmentation deployment — file-level twin of
``common/deploy_network.py`` with a batched TPU execution core.

Behavioural parity points (reference file:line):
- idempotent skip when ``seg_<seq>.nii.gz`` exists (:62-67)
- intensity rescale to [0,1] at percentiles (1, 99) (:89)
- centred pad to multiple of 16 (:94-100)
- ED = frame 0; ES = argmin(label-1 count) for sa / seg4 la_4ch,
  argmax for la views (:123-131)
- output naming incl. the ``seg4_`` prefix (:134-151) and the
  ED/ES-only mode (:152-216)

The hot loop is replaced: instead of T per-frame ``sess.run`` calls the
whole (Z*T)-slice batch runs through ``InferenceEngine.segment_sequence``.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

from ukbb_cardiac_tpu.ckpt import store
from ukbb_cardiac_tpu.infer.engine import InferenceEngine, SegmentationModel
from ukbb_cardiac_tpu.io import nifti
from ukbb_cardiac_tpu.ops import rescale_intensity


def load_segmentation_model(model_path: str, compute_dtype=None) -> SegmentationModel:
    """Load a model bundle (.npz) into a deployable SegmentationModel."""
    import jax.numpy as jnp

    dtype = compute_dtype or jnp.float32
    kind, cfg, names, params, state, _ = store.load_model(model_path)
    if kind == "fcn":
        return SegmentationModel.from_fcn(params, state, names, cfg, dtype)
    if kind == "resnet":
        return SegmentationModel.from_resnet(params, state, names, cfg, dtype)
    if kind == "unet":
        return SegmentationModel.from_unet(params, state, names, cfg, dtype)
    raise ValueError(f"model kind {kind!r} is not a slice-segmentation model")


def seg_prefix(seq_name: str, seg4: bool) -> str:
    return "seg4" if (seq_name == "la_4ch" and seg4) else "seg"


def es_frame(pred: np.ndarray, seq_name: str, seg4: bool) -> int:
    """ES frame rule (``deploy_network.py:125-131``): label-1 voxel count
    argmin for sa / seg4 (LV), argmax for la views (LA)."""
    counts = np.sum(pred == 1, axis=(0, 1, 2))
    if seq_name == "sa" or (seq_name == "la_4ch" and seg4):
        return int(np.argmin(counts))
    return int(np.argmax(counts))


def _start_subject_sequence(engine: InferenceEngine, data_dir: str,
                            seq_name: str, seg4: bool,
                            force: bool = False) -> Optional[dict]:
    """Read one subject's cine and dispatch its segmentation.

    Returns an in-flight context (finish with
    :func:`_finish_subject_sequence`) or None if skipped — same skip
    rules as the reference (``deploy_network.py:62-71``); ``force``
    re-segments even when the output exists (cohort re-runs with a new
    model)."""
    prefix = seg_prefix(seq_name, seg4)
    seg_name = os.path.join(data_dir, f"{prefix}_{seq_name}.nii.gz")
    if os.path.exists(seg_name) and not force:
        return None
    image_name = os.path.join(data_dir, f"{seq_name}.nii.gz")
    if not os.path.exists(image_name):
        print(f"  Directory {data_dir} does not contain an image with "
              f"file name {os.path.basename(image_name)}. Skip.")
        return None

    print(f"  Reading {image_name} ...")
    nim = nifti.load(image_name)
    orig_image = np.asarray(nim.dataobj)
    if orig_image.ndim == 3:
        orig_image = orig_image[..., None]

    print("  Segmenting full sequence ...")
    # One fused device program: rescale (deploy_network.py:89), pad,
    # batched forward, argmax, packed readback.
    start = time.time()
    pending = engine.segment_sequence_dispatch(orig_image,
                                               rescale="percentile")
    return {"data_dir": data_dir, "nim": nim, "image": orig_image,
            "pending": pending, "start": start}


def _finish_subject_sequence(ctx: dict, seq_name: str, seg4: bool,
                             save_seg: bool) -> float:
    """Block on an in-flight subject and write its outputs.

    The printed "segmentation time" spans dispatch→readback; in the
    pipelined dataset loop it therefore includes the time spent reading
    and dispatching the NEXT subject while this one was computing — the
    per-subject average over the run is the meaningful figure."""
    prefix = seg_prefix(seq_name, seg4)
    data_dir, nim, orig_image = ctx["data_dir"], ctx["nim"], ctx["image"]
    pred = ctx["pending"].result().astype(np.int16)
    ctx["pred"] = pred  # for pipelines that consume the seg in memory
    seg_time = time.time() - ctx["start"]
    print(f"  Segmentation time = {seg_time:.3f}s")

    k = {"ED": 0, "ES": es_frame(pred, seq_name, seg4)}
    print("  ED frame = {0:d}, ES frame = {1:d}".format(k["ED"], k["ES"]))

    if save_seg:
        print("  Saving segmentation ...")
        nim2 = nifti.Nifti1Image(pred, nim.affine)
        nim2.header["pixdim"] = nim.header["pixdim"]
        nifti.save(nim2, os.path.join(data_dir, f"{prefix}_{seq_name}.nii.gz"))
        for fr in ("ED", "ES"):
            nifti.save(nifti.Nifti1Image(orig_image[:, :, :, k[fr]], nim.affine),
                       os.path.join(data_dir, f"{seq_name}_{fr}.nii.gz"))
            nifti.save(nifti.Nifti1Image(pred[:, :, :, k[fr]], nim.affine),
                       os.path.join(data_dir, f"{prefix}_{seq_name}_{fr}.nii.gz"))
    return seg_time


def deploy_subject_sequence(engine: InferenceEngine, data_dir: str, seq_name: str,
                            seg4: bool = False, save_seg: bool = True) -> Optional[float]:
    """Segment one subject's full cine. Returns segmentation seconds, or
    None if skipped."""
    ctx = _start_subject_sequence(engine, data_dir, seq_name, seg4)
    if ctx is None:
        return None
    return _finish_subject_sequence(ctx, seq_name, seg4, save_seg)


def deploy_subject_ed_es(engine: InferenceEngine, data_dir: str, seq_name: str,
                         seg4: bool = False, save_seg: bool = True):
    """ED/ES-only mode (``deploy_network.py:152-216``). Returns list of
    per-frame segmentation times."""
    prefix = seg_prefix(seq_name, seg4)
    names = {fr: os.path.join(data_dir, f"{seq_name}_{fr}.nii.gz") for fr in ("ED", "ES")}
    if not all(os.path.exists(p) for p in names.values()):
        print(f"  Directory {data_dir} does not contain an image with file "
              f"name {os.path.basename(names['ED'])} or "
              f"{os.path.basename(names['ES'])}. Skip.")
        return []
    times = []
    for fr in ("ED", "ES"):
        nim = nifti.load(names[fr])
        image = np.asarray(nim.dataobj)
        if image.ndim == 2:
            image = image[..., None]
        print(f"  Segmenting {fr} frame ...")
        start = time.time()
        image = rescale_intensity(image.astype(np.float32), (1.0, 99.0))
        pred = engine.segment_volume(image).astype(np.int16)
        times.append(time.time() - start)
        print(f"  Segmentation time = {times[-1]:.3f}s")
        if save_seg:
            nim2 = nifti.Nifti1Image(pred, nim.affine)
            nim2.header["pixdim"] = nim.header["pixdim"]
            nifti.save(nim2, os.path.join(data_dir, f"{prefix}_{seq_name}_{fr}.nii.gz"))
    return times


def deploy_dataset(model_path: str, data_dir: str, seq_name: str = "sa",
                   process_seq: bool = True, save_seg: bool = True,
                   seg4: bool = False, chunk: int = 64,
                   compute_dtype=None) -> None:
    """Walk subject subdirectories and segment each — the reference CLI's
    main loop (``deploy_network.py:43-225``)."""
    model = load_segmentation_model(model_path, compute_dtype)
    engine = InferenceEngine(model, chunk=chunk)

    print("Start deployment on the data set ...")
    start_time = time.time()
    table_time, processed = [], []
    # full-sequence mode runs a one-deep software pipeline: subject N's
    # NIfTI read + H2D + dispatch overlap subject N-1's readback + saves
    # (the reference loop is fully synchronous per frame)
    in_flight = None  # (data, ctx)
    for data in sorted(os.listdir(data_dir)):
        subject_dir = os.path.join(data_dir, data)
        if not os.path.isdir(subject_dir):
            continue
        print(data)
        if process_seq:
            ctx = _start_subject_sequence(engine, subject_dir, seq_name, seg4)
            if in_flight is not None:
                prev_data, prev_ctx = in_flight
                table_time.append(_finish_subject_sequence(
                    prev_ctx, seq_name, seg4, save_seg))
                processed.append(prev_data)
            in_flight = (data, ctx) if ctx is not None else None
        else:
            ts = deploy_subject_ed_es(engine, subject_dir, seq_name, seg4, save_seg)
            if ts:
                table_time.extend(ts)
                processed.append(data)
    if in_flight is not None:
        prev_data, prev_ctx = in_flight
        table_time.append(_finish_subject_sequence(
            prev_ctx, seq_name, seg4, save_seg))
        processed.append(prev_data)

    if table_time:
        unit = "sequence" if process_seq else "frame"
        print("Average segmentation time = {0:.3f}s per {1}".format(
            np.mean(table_time), unit))
        total = time.time() - start_time
        print("Including image I/O, it took {0:.3f}s for processing {1:d} "
              "subjects ({2:.3f}s per subjects).".format(
                  total, len(processed), total / max(len(processed), 1)))
