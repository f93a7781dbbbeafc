"""Short-axis motion tracking and strain analysis.

Reference: ``common/cardiac_utils.py:755-987``
(``evaluate_strain_by_length``, ``cine_2d_sa_motion_and_strain_analysis``).

The reference's motion engine is ~300 sequential MIRTK subprocess calls
per subject — forward + backward FFD registration between every adjacent
frame pair of 3 slices, composed, blended, applied to contours
(SURVEY.md §3.4; "several minutes" per subject, README.md:51).  Here the
whole pair population is ONE batched jitted registration
(``reg.make_register_batch``) and everything else is numpy on tiny
arrays:

  pairs (3 slices x 2(T-1))  →  batched FFD register on TPU
  → per-slice forward/backward composition (dense-field compose)
  → time-weighted forward/backward blending (the ``average_3d_ffd`` sum)
  → ED contour points pushed through the per-frame fields
  → Lagrangian strain per line = (len_t − len_ED)/len_ED x 100
  → 17x(T) radial + circumferential CSV tables.
"""

from __future__ import annotations

import functools as _functools
import glob as _glob
import os
from typing import Optional

import numpy as np
import pandas as pd
from scipy.ndimage import map_coordinates

import jax.numpy as jnp

from ukbb_cardiac_tpu.io import nifti
from ukbb_cardiac_tpu.io.vtkio import PolyData, append_polydata, load_polydata, save_polydata
from ukbb_cardiac_tpu.ops import np_categorical_dice
from ukbb_cardiac_tpu.ops.crop import foreground_bbox
from ukbb_cardiac_tpu.phenotype.myo_contour import extract_myocardial_contour
from ukbb_cardiac_tpu.reg import RegConfig, make_register_batch, total_field


def evaluate_strain_by_length(contour_name_stem: str, T: int, dt: float,
                              output_name_stem: str, polys=None,
                              write_vtk: bool = True) -> None:
    """Lagrangian strain per line cell vs ED; per-AHA-segment tables
    (``cardiac_utils.py:755-837``).  Reads ``<stem><fr:02d>.vtk`` (or the
    same polydata passed in-memory via ``polys`` — the driver already
    holds the objects it just wrote, so reloading the text files doubled
    the finish stage's cost), writes the Strain cell array back and
    ``<out>_radial.csv`` / ``<out>_circum.csv``.  ``write_vtk=False``
    skips rewriting the Strain-annotated frame files (callers that
    delete the motion directory right after harvesting the CSVs —
    ``parallel/cohort.py`` — pay the file I/O for nothing)."""
    poly_ED = (polys[0] if polys is not None
               else load_polydata(f"{contour_name_stem}{0:02d}.vtk"))
    pts = poly_ED.points
    lines_arr = np.asarray(poly_ED.lines)
    length_ED = np.linalg.norm(pts[lines_arr[:, 0]] - pts[lines_arr[:, 1]],
                               axis=1)
    seg_id = poly_ED.cell_scalars["Segment_ID"]
    dir_id = poly_ED.cell_scalars["Direction_ID"]

    table_strain = {"radial": np.zeros((17, T)), "circum": np.zeros((17, T))}
    for fr in range(T):
        filename = f"{contour_name_stem}{fr:02d}.vtk"
        poly = polys[fr] if polys is not None else load_polydata(filename)
        p = poly.points
        d = np.linalg.norm(p[lines_arr[:, 0]] - p[lines_arr[:, 1]], axis=1)
        strain = (d - length_ED) / length_ED * 100
        poly.cell_scalars["Strain"] = strain
        if write_vtk:
            save_polydata(poly, filename)

        for i in range(16):
            table_strain["radial"][i, fr] = np.mean(
                strain[(seg_id == (i + 1)) & (dir_id == 1)]) if np.any(
                    (seg_id == (i + 1)) & (dir_id == 1)) else np.nan
            table_strain["circum"][i, fr] = np.mean(
                strain[(seg_id == (i + 1)) & (dir_id == 2)]) if np.any(
                    (seg_id == (i + 1)) & (dir_id == 2)) else np.nan
        table_strain["radial"][-1, fr] = np.mean(strain[dir_id == 1])
        table_strain["circum"][-1, fr] = np.mean(strain[dir_id == 2])

    for c in ("radial", "circum"):
        index = [str(x) for x in np.arange(1, 17)] + ["Global"]
        column = np.arange(0, T) * dt * 1e3  # time in ms
        df = pd.DataFrame(table_strain[c], index=index, columns=column)
        df.to_csv(f"{output_name_stem}_{c}.csv")


def _sample_field(field: np.ndarray, pts_xy: np.ndarray) -> np.ndarray:
    """Bilinear sample a dense (X, Y, 2) field at (N, 2) pixel coords."""
    coords = [pts_xy[:, 0], pts_xy[:, 1]]
    return np.stack([map_coordinates(field[..., k], coords, order=1,
                                     mode="nearest") for k in range(2)], axis=1)


@_functools.lru_cache(maxsize=32)
def _field_programs(Z: int, T: int, X: int, Y: int, cfg: RegConfig,
                    inverse_consistent: bool):
    """Jitted densify + compose/invert/blend programs for one problem
    shape.  Cached at module level: jax.jit keys on function identity,
    so building these inside the driver would retrace and recompile for
    EVERY subject of a cohort even though (Z, T, X, Y) repeat."""
    import jax

    from ukbb_cardiac_tpu.reg.register import (compose_chain,
                                               invert_field_batch)

    per = T if inverse_consistent else 2 * (T - 1)
    dense = jax.jit(jax.vmap(lambda *cs: total_field(cs, (X, Y), cfg)))

    @jax.jit
    def combine(fields):
        per_slice = fields.reshape(Z, per, X, Y, 2)
        fwd_pairs = per_slice[:, :T - 1]  # entry fr-1 maps fr-1 -> fr
        if inverse_consistent:
            wraps = per_slice[:, T - 1]   # 0 -> T-1 per slice
            # backward chain pairs: (0->T-1), then (fr+1->fr) = inverse of
            # the forward pair (fr->fr+1), fr = T-2 .. 1 — ALL slices'
            # inversions in one globally-batched fixed-point loop
            inv_in = fwd_pairs[:, 1:][:, ::-1].reshape(Z * (T - 2), X, Y, 2)
            # same sampling backend as the registration itself, so
            # cfg.warp_backend='gather' yields an end-to-end gather run
            inv = invert_field_batch(
                inv_in, backend=cfg.warp_backend,
                precision=cfg.warp_precision).reshape(Z, T - 2, X, Y, 2)
            bwd_pairs = jnp.concatenate([wraps[:, None], inv], axis=1)
        else:
            bwd_pairs = per_slice[:, T - 1:]

        def one(fwd_pair, bwd_pair):
            forward = compose_chain(fwd_pair, backend=cfg.warp_backend,
                                    precision=cfg.warp_precision)
            backward_rev = compose_chain(bwd_pair, backend=cfg.warp_backend,
                                         precision=cfg.warp_precision)
            backward = jnp.concatenate(
                [backward_rev[:1], backward_rev[1:][::-1]], axis=0)
            wf = ((T - jnp.arange(T)) / T).reshape(T, 1, 1, 1)
            wb = (jnp.arange(T) / T).reshape(T, 1, 1, 1)
            return (wf * forward + wb * backward).at[0].set(0.0)

        return jax.vmap(one)(fwd_pairs, bwd_pairs)

    return dense, combine


_HW_BUCKET = 32
_PTS_BUCKET = 128


def bucket_hw(X: int, Y: int, bucket: int = _HW_BUCKET):
    """Round a crop's in-plane shape up to the compile-shape bucket.

    Per-subject LV crops differ by a few pixels (bbox+20 of a variable
    anatomy), and XLA keys compiled programs on exact shapes — without
    bucketing, EVERY cohort subject pays seconds of registration-program
    compilation.  Zero-padding the crop to a multiple of 32 makes all
    subjects of similar size share one compiled program set; fields at
    the (interior) contour points are unaffected beyond float noise."""
    return (-(-X // bucket) * bucket, -(-Y // bucket) * bucket)


@_functools.lru_cache(maxsize=64)
def _sample_program(Zsel: int, T: int, X: int, Y: int, N: int):
    """Jitted device twin of :func:`_sample_field` over ALL slices,
    frames and contour points at once: bilinear (edge-clamped) sampling
    of (Zsel, T, X, Y, 2) fields at (Zsel, N, 2) voxel coords →
    (Zsel, T, N, 2).  With this, the dense motion fields never leave
    HBM — the strain driver's D2H shrinks from megabytes of fields to
    kilobytes of point displacements."""
    import jax

    @jax.jit
    def sample(fields, pts):
        x = jnp.clip(pts[..., 0], 0.0, X - 1.0)   # (Zsel, N)
        y = jnp.clip(pts[..., 1], 0.0, Y - 1.0)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[:, None, :, None]           # (Zsel, 1, N, 1)
        fy = (y - y0)[:, None, :, None]
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        x1i = jnp.minimum(x0i + 1, X - 1)
        y1i = jnp.minimum(y0i + 1, Y - 1)

        def per_slice(f, x0s, x1s, y0s, y1s):
            # f (T, X, Y, 2); each index array (N,) → (T, N, 2) corners
            return (f[:, x0s, y0s], f[:, x0s, y1s],
                    f[:, x1s, y0s], f[:, x1s, y1s])

        f00, f01, f10, f11 = jax.vmap(per_slice)(fields, x0i, x1i, y0i, y1i)
        return (f00 * (1 - fx) * (1 - fy) + f01 * (1 - fx) * fy +
                f10 * fx * (1 - fy) + f11 * fx * fy)

    return sample


@_functools.lru_cache(maxsize=64)
def _warp_dice_program(T: int, X: int, Y: int):
    """Jitted warp-to-ED + per-frame LV/Myo Dice (the reference's dormant
    self-check, ``cardiac_utils.py:944-967``) entirely on device: labels
    (Zsel, T, X, Y) + fields (Zsel, T, X, Y, 2) → (Zsel, T, 2) Dice.
    (Xv, Yv): the valid (pre-bucket-padding) region — warped labels
    outside it are masked to background so the padding cannot leak real
    labels into the Dice.  Passed as RUNTIME scalars: per-subject crops
    differ by a few pixels, and keying the compiled program on the exact
    valid size recompiled this program for every cohort subject
    (profiled at ~2 s/subject, the bulk of the r4 strain_la stage)."""
    import jax

    @jax.jit
    def warp_dice(seg, fields, xv, yv):
        gx, gy = jnp.meshgrid(jnp.arange(X, dtype=jnp.float32),
                              jnp.arange(Y, dtype=jnp.float32),
                              indexing="ij")
        valid = (gx < xv) & (gy < yv)

        def one_fr(field, seg_fr, ed):
            cx = gx + field[..., 0]
            cy = gy + field[..., 1]
            # scipy map_coordinates order=0 mode='constant' semantics:
            # nearest = floor(c + 0.5); out-of-bounds reads 0
            xi = jnp.floor(cx + 0.5).astype(jnp.int32)
            yi = jnp.floor(cy + 0.5).astype(jnp.int32)
            inb = ((xi >= 0) & (xi < X) & (yi >= 0) & (yi < Y) & valid)
            warped = jnp.where(inb, seg_fr[jnp.clip(xi, 0, X - 1),
                                           jnp.clip(yi, 0, Y - 1)], 0)

            def dice(k):
                a = (ed == k).astype(jnp.float32)
                b = (warped == k).astype(jnp.float32)
                return 2 * jnp.sum(a * b) / (jnp.sum(a) + jnp.sum(b))

            return jnp.stack([dice(1), dice(2)])

        def one_slice(seg_z, fields_z):
            return jax.vmap(one_fr, in_axes=(0, 0, None))(
                fields_z, seg_z, seg_z[0])

        return jax.vmap(one_slice)(seg, fields)

    return warp_dice


def track_multi_slice_fields(frames_zs: np.ndarray, cfg: RegConfig,
                             register_batch=None,
                             inverse_consistent: bool = True,
                             mesh=None, as_numpy: bool = True) -> np.ndarray:
    """Per-frame ED→fr displacement fields for MULTIPLE slices at once.

    frames_zs: (Z, T, X, Y).  Returns (Z, T, X, Y, 2): combined
    forward/backward motion estimate (``cardiac_utils.py:881-936``):
    forward = compose of pairs (fr-1→fr); backward = compose of circular
    pairs (fr+1→fr) from frame 0 backwards; blended with weights
    (T−fr)/T and fr/T.

    Every slice's every pair joins ONE batched registration (the
    reference runs Z x 2(T-1) sequential MIRTK subprocesses), and
    densify+compose+blend run as a handful of device programs.

    ``inverse_consistent`` (default): each adjacent pair is registered
    once and the reverse transform comes from a fixed-point field
    inversion — half the registrations of the reference's two-direction
    scheme at equivalent quality (see QUIRKS.md).  Set False for the
    reference's exact both-directions behaviour.
    """
    Z, T, X, Y = frames_zs.shape
    if register_batch is None:
        # mesh: shard the pair population over chips (make_register_batch)
        register_batch = make_register_batch((X, Y), cfg, mesh=mesh)

    tgt_list, src_list = [], []
    for z in range(Z):
        frames = frames_zs[z]
        tgt_list.append(frames[:-1])                     # fwd: fr-1 -> fr
        src_list.append(frames[1:])
        if inverse_consistent:
            # only the wrap pair 0 -> T-1 is new; the rest invert
            tgt_list.append(frames[0:1])
            src_list.append(frames[T - 1:T])
        else:
            # bwd: (fr+1)%T -> fr for fr = T-1 .. 1
            tgt_list.append(np.stack([frames[(fr + 1) % T]
                                      for fr in range(T - 1, 0, -1)]))
            src_list.append(np.stack([frames[fr]
                                      for fr in range(T - 1, 0, -1)]))
    targets = jnp.asarray(np.concatenate(tgt_list))
    sources = jnp.asarray(np.concatenate(src_list))
    controls = register_batch(targets, sources)

    dense, combine = _field_programs(Z, T, X, Y, cfg, inverse_consistent)
    fields = dense(*controls)
    out = combine(fields)
    if not as_numpy:
        return out  # device array, still computing (JAX async dispatch)
    return np.asarray(out, dtype=np.float32)


def track_slice_fields(frames: np.ndarray, cfg: RegConfig,
                       register_batch=None, mesh=None,
                       as_numpy: bool = True) -> np.ndarray:
    """Single-slice wrapper around :func:`track_multi_slice_fields`.
    frames: (T, X, Y) → (T, X, Y, 2) (with the leading slice axis kept
    when ``as_numpy=False`` — the device array is still in flight)."""
    out = track_multi_slice_fields(frames[None], cfg, register_batch,
                                   mesh=mesh, as_numpy=as_numpy)
    return out[0] if as_numpy else out


def start_sa_motion_dispatch(data_dir: str, output_dir: str,
                             cfg: RegConfig = RegConfig(),
                             eval_dice: bool = False,
                             register_batch=None, mesh=None,
                             inverse_consistent: bool = True):
    """Stage 1 of the SA strain driver: crop chain, ED contours, and
    DISPATCH of the whole registration+composition as device programs.

    Returns a context for :func:`finish_sa_motion` (the motion fields in
    it are an in-flight device array), or None when no slice qualifies.
    Splitting dispatch from finish lets a cohort loop overlap subject
    N's device registration with subject N-1's host post-processing
    (contour warps, VTK/CSV writes) — the deploy engine's pipelining
    pattern applied to strain.
    """
    # LV-focused crop (cardiac_utils.py:845-853): relabel RV->BG, bbox+20.
    # The reference's chain is padding -> auto_crop -> two transform-image
    # resamples through four intermediate files; the crop target shares
    # the source grid, so the "resample" is an exact axis-aligned slice —
    # done in memory (the per-subject NIfTI round trips were a top host
    # cost of the cohort pipeline).
    ed_nim = nifti.load(os.path.join(data_dir, "seg_sa_ED.nii.gz"))
    seg_ed = np.asanyarray(ed_nim.dataobj)
    if seg_ed.ndim == 4:
        seg_ed = seg_ed[:, :, :, 0]
    lv_ed = np.array(seg_ed)
    lv_ed[lv_ed == 3] = 0                        # padding(..., 3, 0)
    x1, x2, y1, y2, z1, z2 = foreground_bbox(lv_ed, 20)

    sa_nim = nifti.load(os.path.join(data_dir, "sa.nii.gz"))
    sa_full = np.asanyarray(sa_nim.dataobj)
    if sa_full.ndim == 3:
        sa_full = sa_full[..., None]
    affine_crop = np.copy(sa_nim.affine)
    affine_crop[:3, 3] = (affine_crop @ np.array([x1, y1, z1, 1.0]))[:3]
    sa_crop_mem = sa_full[x1:x2, y1:y2, z1:z2].astype(np.float32)
    seg_full = np.asanyarray(
        nifti.load(os.path.join(data_dir, "seg_sa.nii.gz")).dataobj)
    if seg_full.ndim == 3:
        seg_full = seg_full[..., None]
    seg_crop_mem = seg_full[x1:x2, y1:y2, z1:z2]

    # ED contours on the three representative slices (basal/mid/apical).
    # Clear stale contour files first: slice selection below trusts any
    # myo_contour_ED_z*.vtk in output_dir, so leftovers from a previous
    # subject sharing the directory would silently blend two subjects.
    for stale in _glob.glob(os.path.join(output_dir,
                                         "myo_contour_ED_z*.vtk")):
        os.remove(stale)
    extract_myocardial_contour(os.path.join(data_dir, "seg_sa_ED.nii.gz"),
                               os.path.join(output_dir, "myo_contour_ED_z"),
                               three_slices=True)

    sa_crop = sa_crop_mem
    Z = sa_crop.shape[2]
    T = sa_crop.shape[3]
    dt = float(sa_nim.header["pixdim"][4])
    inv_affine = np.linalg.inv(affine_crop)
    X, Y = sa_crop.shape[:2]

    # one batched registration covers every (slice, direction, frame-pair)
    selected = [z for z in range(Z) if os.path.exists(
        os.path.join(output_dir, f"myo_contour_ED_z{z:02d}.vtk"))]
    if not selected:
        return None
    frames_zs = np.stack([np.transpose(sa_crop[:, :, z, :], (2, 0, 1))
                          for z in selected])  # (Zsel, T, X, Y)
    # pad to the compile-shape bucket: all cohort subjects with similar
    # crops share ONE compiled registration/composition program set
    # (register_batch callers pass a prebuilt program — its shape is
    # theirs to choose, so only the internal build buckets)
    Xp, Yp = (X, Y) if register_batch is not None else bucket_hw(X, Y)
    if (Xp, Yp) != (X, Y):
        frames_zs = np.pad(frames_zs,
                           ((0, 0), (0, 0), (0, Xp - X), (0, Yp - Y)))
    fields_dev = track_multi_slice_fields(
        frames_zs, cfg, register_batch=register_batch, mesh=mesh,
        inverse_consistent=inverse_consistent, as_numpy=False)

    # contours were just written: load them now and push the POINT
    # sampling to the device, so the dense fields never leave HBM
    polys_ED, voxs = [], []
    for z in selected:
        poly = load_polydata(
            os.path.join(output_dir, f"myo_contour_ED_z{z:02d}.vtk"))
        world = poly.points
        voxs.append((inv_affine @ np.concatenate(
            [world, np.ones((len(world), 1))], axis=1).T).T[:, :3])
        polys_ED.append(poly)
    n_max = max(len(v) for v in voxs)
    n_pad = -(-n_max // _PTS_BUCKET) * _PTS_BUCKET
    pts = np.zeros((len(selected), n_pad, 2), np.float32)
    for i, v in enumerate(voxs):
        pts[i, :len(v)] = v[:, :2]
    disp_dev = _sample_program(len(selected), T, Xp, Yp, n_pad)(
        fields_dev, jnp.asarray(pts))
    dice_dev = None
    if eval_dice:
        seg_sel = np.stack(
            [np.transpose(seg_crop_mem[:, :, z, :], (2, 0, 1))
             for z in selected]).astype(np.int32)
        seg_sel = np.pad(seg_sel,
                         ((0, 0), (0, 0), (0, Xp - X), (0, Yp - Y)))
        dice_dev = _warp_dice_program(T, Xp, Yp)(
            jnp.asarray(seg_sel), fields_dev, X, Y)
    return {"output_dir": output_dir, "selected": selected,
            "disp_dev": disp_dev, "dice_dev": dice_dev,
            "polys_ED": polys_ED, "voxs": voxs,
            "T": T, "dt": dt, "X": X, "Y": Y,
            "Z": Z, "affine_crop": affine_crop, "inv_affine": inv_affine,
            "eval_dice": eval_dice}


def finish_sa_motion(ctx: dict, output_name_stem: str,
                     write_artifacts: bool = True
                     ) -> Optional[pd.DataFrame]:
    """Stage 2 of the SA strain driver: fetch the contour-point
    displacements (the dense fields stay in HBM — sampling and the
    optional warp-Dice self-check already ran on device), build the
    per-frame polydata and write the strain tables
    (``cardiac_utils.py:938-987``).  ``write_artifacts=False`` skips the
    per-frame contour VTK files (cohort drivers delete the motion
    directory right after reading the CSVs; on a 1-core host those
    ~4·T writes per subject are a measurable share of the wall)."""
    output_dir = ctx["output_dir"]
    selected = ctx["selected"]
    T, dt = ctx["T"], ctx["dt"]
    affine_crop = ctx["affine_crop"]
    eval_dice = ctx["eval_dice"]
    disp_zs = np.asarray(ctx["disp_dev"], dtype=np.float32)
    dice_rows = []
    if eval_dice and ctx["dice_dev"] is not None:
        # device rows come back (Zsel, T, 2) — same (slice, frame) order
        # as the host loop appended them
        dice_rows = list(np.asarray(ctx["dice_dev"],
                                    dtype=np.float32).reshape(-1, 2))
    polys_by_frame = [[] for _ in range(T)]

    for zi, z in enumerate(selected):
        poly_ED = ctx["polys_ED"][zi]
        vox = ctx["voxs"][zi]

        for fr in range(T):
            vox_fr = vox.copy()
            vox_fr[:, :2] += disp_zs[zi, fr, :len(vox)]
            world_fr = (affine_crop @ np.concatenate(
                [vox_fr, np.ones((len(vox_fr), 1))], axis=1).T).T[:, :3]
            poly_fr = PolyData(points=world_fr, lines=list(poly_ED.lines),
                               point_scalars=dict(poly_ED.point_scalars),
                               point_vectors=dict(poly_ED.point_vectors),
                               cell_scalars=dict(poly_ED.cell_scalars))
            if write_artifacts:
                save_polydata(
                    poly_fr,
                    os.path.join(output_dir,
                                 f"myo_contour_z{z:02d}_fr{fr:02d}.vtk"))
            polys_by_frame[fr].append(poly_fr)

    # merge slices per frame (vtkAppendPolyData twin, :969-984) — the
    # per-slice polydata are still in memory (written above as artifacts)
    merged = []
    for fr in range(T):
        parts = [polys_by_frame[fr][zi] for zi in range(len(selected))]
        m = append_polydata(parts)
        if write_artifacts:
            save_polydata(m, os.path.join(output_dir,
                                          f"myo_contour_fr{fr:02d}.vtk"))
        merged.append(m)

    evaluate_strain_by_length(os.path.join(output_dir, "myo_contour_fr"),
                              T, dt, output_name_stem, polys=merged,
                              write_vtk=write_artifacts)
    if eval_dice and dice_rows:
        df = pd.DataFrame(dice_rows)
        df.to_csv(os.path.join(output_dir, "dice_cine_warp_ffd.csv"),
                  index=None, header=None)
        return df
    return None


def cine_2d_sa_motion_and_strain_analysis(data_dir: str, output_dir: str,
                                          output_name_stem: str,
                                          cfg: RegConfig = RegConfig(),
                                          eval_dice: bool = False,
                                          register_batch=None, mesh=None,
                                          inverse_consistent: bool = True
                                          ) -> Optional[pd.DataFrame]:
    """Full SA strain driver (``cardiac_utils.py:840-987``), MIRTK-free.

    Expects ``<data_dir>/{sa,seg_sa,seg_sa_ED}.nii.gz``; writes contour
    VTKs + strain CSVs ``<output_name_stem>_{radial,circum}.csv``.
    Returns the per-frame LV/Myo warp-Dice table when ``eval_dice``.
    ``register_batch``: optional prebuilt (possibly mesh-sharded)
    registration; its image_shape must match this subject's LV crop.
    Composed from :func:`start_sa_motion_dispatch` +
    :func:`finish_sa_motion` (cohort loops can pipeline the two).
    """
    ctx = start_sa_motion_dispatch(data_dir, output_dir, cfg, eval_dice,
                                   register_batch, mesh,
                                   inverse_consistent=inverse_consistent)
    if ctx is None:
        return None
    return finish_sa_motion(ctx, output_name_stem)
