"""Tests for training-set preparation and aortic label propagation."""

import os

import numpy as np
import pytest

from ukbb_cardiac_tpu.data import (
    build_propagation_plan,
    extract_ed_es_frames,
    find_annotated_ed_es,
    propagate_subject,
    split_dataset,
    wrap_frame_index,
)
from ukbb_cardiac_tpu.io import nifti
from ukbb_cardiac_tpu.reg import RegConfig

from phantom import ao_phantom, sax_phantom


def test_find_annotated_ed_es_sa():
    _, seg = sax_phantom(64, 64, 3, 8)
    label = np.zeros_like(seg)
    label[:, :, :, 0] = seg[:, :, :, 0]   # ED annotated
    label[:, :, :, 4] = seg[:, :, :, 4]   # ES annotated
    fr = find_annotated_ed_es(label, "sa")
    assert fr == {"ED": 0, "ES": 4}
    # three annotated frames: pick min volume for SA
    label[:, :, :, 6] = seg[:, :, :, 6]
    fr = find_annotated_ed_es(label, "sa")
    assert fr["ED"] == 0 and fr["ES"] in (4, 6)
    vols = np.sum(label, axis=(0, 1, 2))
    assert vols[fr["ES"]] == min(vols[4], vols[6])
    # no ED annotation -> None
    label2 = np.zeros_like(seg)
    label2[:, :, :, 4] = seg[:, :, :, 4]
    assert find_annotated_ed_es(label2, "sa") is None


def test_extract_ed_es_frames(tmp_path):
    image, seg = sax_phantom(64, 64, 3, 8)
    label = np.zeros_like(seg)
    label[:, :, :, 0] = seg[:, :, :, 0]
    label[:, :, :, 4] = seg[:, :, :, 4]
    d = tmp_path / "1000"
    d.mkdir()
    affine = np.diag([1.8, 1.8, 10.0, 1.0])
    nifti.save(nifti.Nifti1Image(image, affine), str(d / "sa.nii.gz"))
    nifti.save(nifti.Nifti1Image(label.astype(np.float64), affine),
               str(d / "label_sa.nii.gz"))
    extract_ed_es_frames(str(tmp_path), seqs=("sa",))
    for f in ("sa_ED.nii.gz", "sa_ES.nii.gz", "label_sa_ED.nii.gz",
              "label_sa_ES.nii.gz"):
        assert (d / f).exists(), f
    es = nifti.load(str(d / "label_sa_ES.nii.gz"))
    np.testing.assert_array_equal(np.asanyarray(es.dataobj), label[:, :, :, 4])


def test_split_dataset_icc_in_test():
    data = list(range(100))
    icc = [3, 7, 99]
    split = split_dataset(data, n_validation=20, n_test=30, icc_list=icc, seed=0)
    assert len(split["train"]) == 50
    assert len(split["validation"]) == 20
    assert len(split["test"]) == 30
    assert set(icc) <= set(split["test"])
    assert not (set(icc) & set(split["train"]))
    all_ids = split["train"] + split["validation"] + split["test"]
    assert sorted(all_ids) == data


def test_wrap_and_plan():
    assert wrap_frame_index([-1, 0, 10, 9], 10) == [9, 0, 0, 9]
    plan = build_propagation_plan(10, [0, 5])
    covered = set()
    for t in (0, 5):
        for d in ("forward", "backward"):
            covered.update(plan[t][d].tolist())
    assert covered == set(range(10)) - {0, 5}


def test_propagate_subject(tmp_path):
    image, seg = ao_phantom(64, 64, 8, noise=0.02)
    d = tmp_path / "42"
    d.mkdir()
    affine = np.diag([1.8, 1.8, 10.0, 1.0])
    hdr = nifti.Nifti1Header()
    hdr.dim[0] = 4
    hdr.dim[1:5] = image.shape
    hdr.pixdim[1:5] = (1.8, 1.8, 10.0, 0.04)
    nifti.save(nifti.Nifti1Image(image, affine, hdr), str(d / "ao.nii.gz"))
    label = np.zeros_like(seg)
    label[:, :, :, 0] = seg[:, :, :, 0]
    label[:, :, :, 4] = seg[:, :, :, 4]
    nifti.save(nifti.Nifti1Image(label.astype(np.float64), affine, hdr.copy()),
               str(d / "label_ao.nii.gz"))
    for fr, t in (("ED", 0), ("ES", 4)):
        nifti.save(nifti.Nifti1Image(image[:, :, :, t], affine),
                   str(d / f"ao_{fr}.nii.gz"))
        nifti.save(nifti.Nifti1Image(seg[:, :, :, t].astype(np.float64), affine),
                   str(d / f"label_ao_{fr}.nii.gz"))

    # default config = the NMI aortic operating point (ffd_aortic_motion.cfg)
    out = propagate_subject(str(d))
    prop = np.asanyarray(nifti.load(out).dataobj)
    assert prop.shape == seg.shape
    # every frame has labels, and they roughly match the ground truth
    for t in range(8):
        assert np.sum(prop[:, :, :, t] == 1) > 0
        gt = seg[:, :, :, t] == 1
        pd_ = prop[:, :, :, t] == 1
        dice = 2 * np.sum(gt & pd_) / (np.sum(gt) + np.sum(pd_))
        assert dice > 0.75, (t, dice)


def test_symlinks_resolve_from_relative_paths(tmp_path, monkeypatch):
    """link_annotated_subjects called with cwd-RELATIVE paths must still
    create resolvable links (a relative symlink target is resolved
    against the link's own directory, not the cwd)."""
    import numpy as np

    from ukbb_cardiac_tpu.data.prepare import link_annotated_subjects
    from ukbb_cardiac_tpu.io import nifti

    monkeypatch.chdir(tmp_path)
    sub = tmp_path / "orig" / "g1" / "1000001"
    sub.mkdir(parents=True)
    img = nifti.Nifti1Image(np.zeros((4, 4, 2), np.int16), np.eye(4))
    for f in ("sa.nii.gz", "label_sa.nii.gz", "label_up_sa.nii.gz"):
        nifti.save(img, str(sub / f))
    (sub / "1000001_cvi42.zip").write_bytes(b"")
    link_annotated_subjects("orig", "data")
    link = tmp_path / "data" / "1000001" / "sa.nii.gz"
    assert link.is_symlink() and os.path.exists(link), os.readlink(link)


def test_ed_must_be_frame_zero():
    """A partial annotation at frame 0 with complete ones mid-cycle must
    be rejected, not silently train a mid-cycle frame as ED (conscious
    fix vs the reference's weaker guard; QUIRKS.md)."""
    import numpy as np

    from ukbb_cardiac_tpu.data.prepare import find_annotated_ed_es

    label = np.zeros((8, 8, 2, 20), np.int16)
    label[2:4, 2:4, :, 0] = 1           # partial: LV only at frame 0
    for t in (8, 14):                    # complete annotations mid-cycle
        label[2:4, 2:4, :, t] = 1
        label[4:6, 2:4, :, t] = 2
        label[2:4, 4:6, :, t] = 3
    assert find_annotated_ed_es(label, "sa") is None
