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


def test_run_cohort_cli(tmp_path):
    """The cohort CLI end-to-end: model bundle → aggregate CSVs +
    manifest; exit 0 with no failures."""
    import jax

    from ukbb_cardiac_tpu.ckpt import store
    from ukbb_cardiac_tpu.cli import run_cohort
    from ukbb_cardiac_tpu.models import fcn as fcn_mod

    cfg = fcn_mod.FCNConfig(n_class=4, n_level=3, n_filter=(2, 4, 4),
                            n_block=(1, 1, 1), same_dim=4, fc=4)
    p, s, n = fcn_mod.init_fcn(jax.random.PRNGKey(0), cfg)
    bundle = str(tmp_path / "fcn.npz")
    store.save_model(bundle, "fcn", cfg, n, p, s, {})

    root = _cohort(tmp_path, 2)
    out = str(tmp_path / "csv")
    manifest = str(tmp_path / "manifest.json")
    rc = run_cohort.main(["--data_dir", root, "--model_path", bundle,
                          "--output_dir", out, "--workers", "2",
                          "--manifest", manifest])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "table_strain_sax.csv"))
    import json
    m = json.load(open(manifest))
    assert len(m["succeeded"]) == 2 and not m["failed"]
    assert all(set(v) == {"segment", "volumes", "wall_thickness", "strain"}
               for v in m["stage_seconds"].values())


def test_select_subjects_slicing(tmp_path):
    """_select_subjects: sorted enumeration + reference slicing semantics
    (end_idx=-1 → all; empty slices allowed; explicit list respected)."""
    from ukbb_cardiac_tpu.parallel.cohort import _select_subjects

    for name in ("b", "a", "c"):
        os.makedirs(tmp_path / name)
    (tmp_path / "not_a_dir.txt").write_text("x")
    root = str(tmp_path)
    assert _select_subjects(root, None, 0, -1) == ["a", "b", "c"]
    assert _select_subjects(root, None, 1, 2) == ["b"]
    assert _select_subjects(root, None, 2, 1) == []
    assert _select_subjects(root, None, 0, 0) == []
    assert _select_subjects(root, ["z", "y"], 0, -1) == ["y", "z"]


def test_run_cohort_cli_start_end_idx(tmp_path):
    """--start_idx/--end_idx shard the sorted subject list (the reference
    eval scripts' manual sharding flags, eval_strain_sax.py:26-34)."""
    import jax

    from ukbb_cardiac_tpu.ckpt import store
    from ukbb_cardiac_tpu.cli import run_cohort
    from ukbb_cardiac_tpu.models import fcn as fcn_mod

    cfg = fcn_mod.FCNConfig(n_class=4, n_level=3, n_filter=(2, 4, 4),
                            n_block=(1, 1, 1), same_dim=4, fc=4)
    p, s, n = fcn_mod.init_fcn(jax.random.PRNGKey(0), cfg)
    bundle = str(tmp_path / "fcn.npz")
    store.save_model(bundle, "fcn", cfg, n, p, s, {})

    root = _cohort(tmp_path, 3)
    out = str(tmp_path / "csv")
    manifest = str(tmp_path / "manifest.json")
    rc = run_cohort.main(["--data_dir", root, "--model_path", bundle,
                          "--output_dir", out, "--workers", "2",
                          "--manifest", manifest,
                          "--start_idx", "1", "--end_idx", "2"])
    assert rc == 0
    import json
    m = json.load(open(manifest))
    assert m["succeeded"] == ["subj01"], m


def _full_cohort(tmp_path, n_subj=2, X=96, Y=96, T=6):
    """Write complete subjects (sa + la_2ch + la_4ch/seg4 + ao cines AND
    their ground-truth segs) — the full-pipeline fixture, shared by the
    API and CLI full-mode tests.  Returns (root, eids)."""
    from phantom import ao_phantom, la_phantom, sax_phantom, seg4_la_phantom
    from ukbb_cardiac_tpu.io import nifti

    root = tmp_path / "cohort"
    eids = [str(1000001 + i) for i in range(n_subj)]
    for i in range(n_subj):
        d = str(root / eids[i])
        os.makedirs(d)
        rng = np.random.RandomState(i)

        def save(name, data, affine, dt=0.04):
            hdr = nifti.Nifti1Header()
            hdr.dim[0] = data.ndim
            hdr.dim[1:1 + data.ndim] = data.shape
            hdr.pixdim[1:4] = (1.8, 1.8, 10.0)
            if data.ndim == 4:
                hdr.pixdim[4] = dt
            nifti.save(nifti.Nifti1Image(data, affine, hdr),
                       os.path.join(d, name))

        # SA stack, world-consistent with the LA plane below
        affine_sa = np.diag([-1.8, -1.8, 10.0, 1.0])
        affine_sa[:3, 3] = (80.0, 90.0, -40.0)
        sa_img, sa_seg = sax_phantom(X, Y, 8, T, rng=rng)
        save("sa.nii.gz", sa_img, affine_sa)
        save("seg_sa.nii.gz", sa_seg.astype(np.float64), affine_sa)
        es = int(np.argmin(np.sum(sa_seg == 1, axis=(0, 1, 2))))
        for name, fr in (("ED", 0), ("ES", es)):
            save(f"sa_{name}.nii.gz", sa_img[:, :, :, fr], affine_sa)
            save(f"seg_sa_{name}.nii.gz",
                 sa_seg[:, :, :, fr].astype(np.float64), affine_sa)

        # 4ch LA plane: world long axis runs along the in-plane y axis
        affine_la = np.array([[-1.8, 0, 0, 80.0],
                              [0, 0, 10.0, 0.0],
                              [0, -1.8, 0, 90.0],
                              [0, 0, 0, 1.0]])
        la4_img, seg4 = seg4_la_phantom(X, Y, T, rng=rng)
        save("la_4ch.nii.gz", la4_img, affine_la)
        save("seg4_la_4ch.nii.gz", seg4.astype(np.float64), affine_la)
        save("seg4_la_4ch_ED.nii.gz", seg4[:, :, :, 0].astype(np.float64),
             affine_la)
        # 3-class la_4ch (LA=1, RA=2) + la_2ch for atrial volumes
        seg_la4 = np.zeros_like(seg4)
        seg_la4[seg4 == 4] = 1
        seg_la4[seg4 == 5] = 2
        save("seg_la_4ch.nii.gz", seg_la4.astype(np.float64), affine_la)
        la2_img, seg_la2 = la_phantom(X, Y, T, n_class=2, rng=rng)
        save("la_2ch.nii.gz", la2_img, affine_la)
        save("seg_la_2ch.nii.gz", seg_la2.astype(np.float64), affine_la)
        # aortic cine + ground truth
        ao_img, seg_ao = ao_phantom(X, Y, T, rng=rng)
        save("ao.nii.gz", ao_img, np.diag([-1.8, -1.8, 10.0, 1.0]))
        save("seg_ao.nii.gz", seg_ao.astype(np.float64),
             np.diag([-1.8, -1.8, 10.0, 1.0]))
    return str(root), eids


def test_run_cohort_full_pipeline(tmp_path, tiny_engine):
    """The COMPLETE per-subject pipeline over a cohort: SA chain + LA
    deploys + atrial volumes + LA strain + aortic areas, with the
    reference CLI schemas (demo_pipeline.py:63-122 as ONE overlapped
    cohort driver)."""
    from ukbb_cardiac_tpu.infer.deploy_ao import AorticEngine
    from ukbb_cardiac_tpu.models import convlstm, fcn as fcn_mod
    from ukbb_cardiac_tpu.models import unet as unet_mod
    from ukbb_cardiac_tpu.parallel import run_cohort_full

    n_subj = 2
    root, eids = _full_cohort(tmp_path, n_subj)

    def eng(n_class):
        from ukbb_cardiac_tpu.infer.engine import (InferenceEngine,
                                                   SegmentationModel)
        cfg = fcn_mod.FCNConfig(n_class=n_class, n_level=3,
                                n_filter=(2, 4, 4), n_block=(1, 1, 1),
                                same_dim=4, fc=4)
        p, s, n = fcn_mod.init_fcn(jax.random.PRNGKey(0), cfg)
        return InferenceEngine(SegmentationModel.from_fcn(p, s, n, cfg))

    ucfg = unet_mod.UNetConfig(n_class=3, n_level=3, n_filter=(2, 4, 4),
                               n_block=(1, 1, 1))
    up, us, un = unet_mod.init_unet(jax.random.PRNGKey(0), ucfg)
    up.update(convlstm.init_biconv_lstm(jax.random.PRNGKey(1), 2, 4, 3))
    engines = {"sa": tiny_engine, "la_2ch": eng(2), "la_4ch": eng(3),
               "seg4": eng(6),
               "ao": AorticEngine("unet_lstm", ucfg, un, up, us,
                                  bidirectional=True)}
    out = str(tmp_path / "csv")
    pressure = {1000001: 40.0, 1000002: 45.0}  # eid -> central PP
    res = run_cohort_full(str(root), engines, workers=2, output_dir=out,
                          pressure=pressure, verbose=False)
    assert len(res.fleet.succeeded) == n_subj, res.fleet.failed
    # every full-pipeline stage ran for every subject
    for subj, st in res.stage_seconds.items():
        assert {"segment", "volumes", "wall_thickness", "strain",
                "segment_la", "atrial_volumes", "strain_la",
                "aortic"} <= set(st), st
    # aggregate CSVs
    atrial = pd.read_csv(os.path.join(out, "table_atrial_volume.csv"),
                         index_col=0)
    assert atrial.shape == (n_subj, 8)
    lax = pd.read_csv(os.path.join(out, "table_strain_lax.csv"), index_col=0)
    assert lax.shape == (n_subj, 7)
    # longitudinal strain of a contracting-LV phantom is negative
    assert (lax["Ell_Global (%)"] < 0).all()
    # aortic distensibility computed from the per-eid pulse pressure
    ao = pd.read_csv(os.path.join(out, "table_aortic_area.csv"), index_col=0)
    assert ao.shape == (n_subj, 6)
    assert "AAo distensibility (10-3 mmHg-1)" in ao.columns
    assert np.isfinite(ao["AAo distensibility (10-3 mmHg-1)"]).all()
    # LA deploys skipped (ground-truth segs exist) but files are present
    for f in ("seg_la_2ch.nii.gz", "seg4_la_4ch.nii.gz", "seg_ao.nii.gz"):
        assert os.path.exists(os.path.join(root, eids[0], f))


def test_run_cohort_cli_full_mode(tmp_path):
    """The cohort CLI's full-pipeline mode: per-sequence model bundles +
    the Vicorder pressure CSV → all the aggregate CSVs of the complete
    ``demo_pipeline.py`` chain in one command."""
    import jax

    from ukbb_cardiac_tpu.ckpt import store
    from ukbb_cardiac_tpu.cli import run_cohort
    from ukbb_cardiac_tpu.models import convlstm, fcn as fcn_mod
    from ukbb_cardiac_tpu.models import unet as unet_mod

    root, eids = _full_cohort(tmp_path, 2)

    def fcn_bundle(name, n_class):
        cfg = fcn_mod.FCNConfig(n_class=n_class, n_level=3,
                                n_filter=(2, 4, 4), n_block=(1, 1, 1),
                                same_dim=4, fc=4)
        p, s, n = fcn_mod.init_fcn(jax.random.PRNGKey(0), cfg)
        path = str(tmp_path / f"{name}.npz")
        store.save_model(path, "fcn", cfg, n, p, s, {})
        return path

    ucfg = unet_mod.UNetConfig(n_class=3, n_level=3, n_filter=(2, 4, 4),
                               n_block=(1, 1, 1))
    up, us, un = unet_mod.init_unet(jax.random.PRNGKey(0), ucfg)
    up.update(convlstm.init_biconv_lstm(jax.random.PRNGKey(1), 2, 4, 3))
    ao_bundle = str(tmp_path / "ao.npz")
    store.save_model(ao_bundle, "unet_lstm", ucfg, un, up, us,
                     {"bidirectional": True})

    cols = pd.MultiIndex.from_tuples(
        [("Central pulse pressure during PWA", "12678-2.0"),
         ("Central pulse pressure during PWA", "12678-2.1")])
    pp = pd.DataFrame([[40.0, 42.0], [45.0, 47.0]],
                      index=[int(e) for e in eids], columns=cols)
    bp_csv = str(tmp_path / "bp.csv")
    pp.to_csv(bp_csv)

    out = str(tmp_path / "csv")
    rc = run_cohort.main(
        ["--data_dir", root, "--model_path", fcn_bundle("sa", 4),
         "--model_path_la_2ch", fcn_bundle("la2", 2),
         "--model_path_la_4ch", fcn_bundle("la4", 3),
         "--model_path_seg4", fcn_bundle("seg4", 6),
         "--model_path_ao", ao_bundle, "--pressure_csv", bp_csv,
         "--output_dir", out, "--workers", "2"])
    assert rc == 0
    for f in ("table_ventricular_volume.csv", "table_wall_thickness.csv",
              "table_strain_sax.csv", "table_atrial_volume.csv",
              "table_strain_lax.csv", "table_aortic_area.csv"):
        assert os.path.exists(os.path.join(out, f)), f
    ao = pd.read_csv(os.path.join(out, "table_aortic_area.csv"), index_col=0)
    assert np.isfinite(ao["AAo distensibility (10-3 mmHg-1)"]).all()


def test_cohort_with_sharded_registration(tmp_path, tiny_engine,
                                          eight_devices):
    """Cohort strain with the registration pair population sharded over
    the virtual 8-device mesh — results match the single-device run."""
    from ukbb_cardiac_tpu.parallel import make_mesh, run_cohort_sa

    root = _cohort(tmp_path, 2)
    res1 = run_cohort_sa(root, tiny_engine, workers=2, verbose=False)
    # wipe per-subject strain outputs so the sharded run recomputes
    for subj in os.listdir(root):
        for f in ("strain_sa_radial.csv", "strain_sa_circum.csv"):
            p = os.path.join(root, subj, f)
            if os.path.exists(p):
                os.remove(p)
    mesh = make_mesh(8)
    res2 = run_cohort_sa(root, tiny_engine, workers=2, mesh=mesh,
                         verbose=False)
    assert set(res2.fleet.succeeded) == set(res1.fleet.succeeded)
    for subj in res1.strain_rows:
        np.testing.assert_allclose(res2.strain_rows[subj],
                                   res1.strain_rows[subj], atol=0.5)


def test_bench_cohort_full_plumbing(tiny_engine):
    """Plumbing for bench.py's full-pipeline cohort stage: tiny engines,
    two subjects, every stage wired (phantom generation → deploys →
    truth-substitution hooks → phenotype/strain → aggregate result)."""
    import bench
    from ukbb_cardiac_tpu.infer.deploy_ao import AorticEngine
    from ukbb_cardiac_tpu.infer.engine import (InferenceEngine,
                                               SegmentationModel)
    from ukbb_cardiac_tpu.models import convlstm, fcn as fcn_mod
    from ukbb_cardiac_tpu.models import unet as unet_mod

    def eng(n_class):
        cfg = fcn_mod.FCNConfig(n_class=n_class, n_level=3,
                                n_filter=(2, 4, 4), n_block=(1, 1, 1),
                                same_dim=4, fc=4)
        p, s, n = fcn_mod.init_fcn(jax.random.PRNGKey(0), cfg)
        return InferenceEngine(SegmentationModel.from_fcn(p, s, n, cfg))

    ucfg = unet_mod.UNetConfig(n_class=3, n_level=3, n_filter=(2, 4, 4),
                               n_block=(1, 1, 1))
    up, us, un = unet_mod.init_unet(jax.random.PRNGKey(0), ucfg)
    up.update(convlstm.init_biconv_lstm(jax.random.PRNGKey(1), 2, 4, 3))
    engines = {"sa": tiny_engine, "la_2ch": eng(2), "la_4ch": eng(3),
               "seg4": eng(6),
               "ao": AorticEngine("unet_lstm", ucfg, un, up, us,
                                  bidirectional=True)}
    out = bench._bench_cohort_full(engines, n=2, shape=(96, 96, 8, 6))
    assert out["n"] == 2
    assert out["wall_s"] > 0 and out["subjects_per_s"] > 0
