"""CLI-surface tests: flags, outputs, reference-schema CSVs."""

import os

import numpy as np
import pandas as pd
import pytest

import jax

from ukbb_cardiac_tpu.ckpt import store
from ukbb_cardiac_tpu.io import nifti
from ukbb_cardiac_tpu.models import fcn as fcn_mod

from phantom import write_subject


@pytest.fixture(scope="module")
def subject_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    data_dir = root / "data"
    write_subject(str(data_dir / "1000001"), seqs=("sa", "la_2ch", "la_4ch", "ao"),
                  X=96, Y=96, Z=8, T=6, with_seg=True)
    subj = data_dir / "1000001"
    for name in ("sa", "seg_sa"):
        nim = nifti.load(str(subj / f"{name}.nii.gz"))
        nifti.save(nifti.Nifti1Image(np.asanyarray(nim.dataobj)[:, :, :, 0],
                                     nim.affine),
                   str(subj / f"{name}_ED.nii.gz"))
    return root, data_dir


def test_eval_ventricular_volume_cli(subject_tree):
    root, data_dir = subject_tree
    out = root / "vol.csv"
    from ukbb_cardiac_tpu.cli import eval_ventricular_volume
    eval_ventricular_volume.main(["--data_dir", str(data_dir),
                                  "--output_csv", str(out)])
    df = pd.read_csv(out, index_col=0)
    assert list(df.columns) == ["LVEDV (mL)", "LVESV (mL)", "LVSV (mL)",
                                "LVEF (%)", "LVCO (L/min)", "LVM (g)",
                                "RVEDV (mL)", "RVESV (mL)", "RVSV (mL)",
                                "RVEF (%)"]
    assert len(df) == 1


def test_eval_wall_thickness_cli_default_max_csv(subject_tree):
    root, data_dir = subject_tree
    out = root / "wt.csv"
    from ukbb_cardiac_tpu.cli import eval_wall_thickness
    # --output_max_csv intentionally omitted (the reference demo's quirk)
    eval_wall_thickness.main(["--data_dir", str(data_dir),
                              "--output_csv", str(out)])
    assert out.exists()
    assert (root / "wt_max.csv").exists()
    df = pd.read_csv(out, index_col=0)
    assert "WT_Global (mm)" in df.columns and len(df.columns) == 17


def test_eval_aortic_area_cli(subject_tree):
    root, data_dir = subject_tree
    pp = pd.DataFrame(
        [[50.0, 52.0]], index=[1000001],
        columns=pd.MultiIndex.from_tuples(
            [("Central pulse pressure during PWA", "12678-2.0"),
             ("Central pulse pressure during PWA", "12678-2.1")]))
    pp.index.name = "eid"
    bp_csv = root / "bp.csv"
    pp.to_csv(bp_csv)
    out = root / "aorta.csv"
    from ukbb_cardiac_tpu.cli import eval_aortic_area
    eval_aortic_area.main(["--data_dir", str(data_dir),
                           "--pressure_csv", str(bp_csv),
                           "--output_csv", str(out)])
    df = pd.read_csv(out, index_col=0)
    assert "AAo distensibility (10-3 mmHg-1)" in df.columns


def test_deploy_cli_and_bool_flags(tmp_path):
    cfg = fcn_mod.FCNConfig(n_class=4, n_filter=(4, 4, 4, 4, 4),
                            n_block=(1, 1, 1, 1, 1), same_dim=4, fc=4)
    p, s, n = fcn_mod.init_fcn(jax.random.PRNGKey(0), cfg)
    bundle = str(tmp_path / "fcn.npz")
    store.save_model(bundle, "fcn", cfg, n, p, s)
    data_dir = tmp_path / "d"
    write_subject(str(data_dir / "5"), seqs=("sa",), X=48, Y=48, Z=2, T=2)
    from ukbb_cardiac_tpu.cli import deploy_network
    deploy_network.main(["--seq_name", "sa", "--data_dir", str(data_dir),
                         "--model_path", bundle, "--chunk", "4"])
    assert (data_dir / "5" / "seg_sa.nii.gz").exists()
    # --nosave_seg boolean pair parses
    deploy_network.main(["--seq_name", "sa", "--data_dir", str(data_dir),
                         "--model_path", bundle, "--nosave_seg"])


def test_phewas_cli(tmp_path):
    rng = np.random.RandomState(0)
    n = 60
    eids = np.arange(1000, 1000 + n)
    idp = pd.DataFrame({"LVEDV (mL)": rng.uniform(100, 200, n)}, index=eids)
    idp.index.name = "eid"
    idp_csv = tmp_path / "idp.csv"
    idp.to_csv(idp_csv)

    dates = [f"2014-0{1 + i % 9}-12" for i in range(n)]
    cols = pd.MultiIndex.from_tuples([
        ("Sex", "31-0.0"), ("Year of birth", "34-0.0"),
        ("Month of birth", "52-0.0"),
        ("Date of attending assessment centre", "53-2.0"),
        ("Weight", "21002-2.0"), ("Body mass index (BMI)", "21001-2.0"),
        ("Standing height", "50-0.0"), ("Pulse rate", "102-0.0"),
    ])
    df = pd.DataFrame({
        cols[0]: rng.randint(0, 2, n).astype(float),
        cols[1]: rng.randint(1940, 1970, n),
        cols[2]: rng.randint(1, 13, n),
        cols[3]: dates,
        cols[4]: rng.uniform(50, 100, n),
        cols[5]: rng.uniform(18, 35, n),
        cols[6]: rng.uniform(150, 190, n),
        cols[7]: rng.uniform(50, 100, n),
    }, index=eids)
    df.index.name = "eid"
    pheno_csv = tmp_path / "pheno.csv"
    df.to_csv(pheno_csv)

    field_tsv = tmp_path / "fields.tsv"
    field_tsv.write_text("1006\t50\tPhysical measure summary\tStanding height\n"
                         "1006\t102\tPhysical measure summary\tPulse rate\n")
    cont_csv = tmp_path / "continuous.csv"
    pd.DataFrame({"continuous": [1, 1]}, index=[50, 102]).rename_axis(
        "field_id").to_csv(cont_csv)

    out_dir = tmp_path / "out"
    from ukbb_cardiac_tpu.cli import perform_phenome_wide_association as phewas
    phewas.main(["--idp_csv", str(idp_csv), "--pheno_csv", str(pheno_csv),
                 "--field_tsv", str(field_tsv),
                 "--continuous_csv", str(cont_csv),
                 "--output_dir", str(out_dir)])
    for f in ("confounders.csv", "normalised_IDPs.csv", "table_corr.csv",
              "table_p.csv", "manhattan.png"):
        assert (out_dir / f).exists(), f
    corr = pd.read_csv(out_dir / "table_corr.csv", header=[0, 1], index_col=0)
    assert corr.shape[0] == 1 and corr.shape[1] >= 1


def test_eval_wall_thickness_bullseye(subject_tree, tmp_path):
    root, data_dir = subject_tree
    from ukbb_cardiac_tpu.cli import eval_wall_thickness
    png = tmp_path / "bullseye.png"
    eval_wall_thickness.main(["--data_dir", str(data_dir),
                              "--output_csv", str(tmp_path / "wt.csv"),
                              "--bullseye_png", str(png)])
    assert png.exists() and png.stat().st_size > 1000


def test_deploy_cli_bf16(tmp_path):
    """--bf16 deploy runs end-to-end and closely agrees with f32."""
    cfg = fcn_mod.FCNConfig(n_class=4, n_filter=(4, 4, 4, 4, 4),
                            n_block=(1, 1, 1, 1, 1), same_dim=4, fc=4)
    p, s, n = fcn_mod.init_fcn(jax.random.PRNGKey(0), cfg)
    bundle = str(tmp_path / "fcn.npz")
    store.save_model(bundle, "fcn", cfg, n, p, s)
    from ukbb_cardiac_tpu.cli import deploy_network
    from ukbb_cardiac_tpu.io import nifti
    segs = {}
    for flag, d in (("--bf16", "d16"), ("--nobf16", "d32")):
        data_dir = tmp_path / d
        write_subject(str(data_dir / "5"), seqs=("sa",), X=48, Y=48,
                      Z=2, T=2, rng=np.random.RandomState(7))
        deploy_network.main(["--seq_name", "sa", "--data_dir", str(data_dir),
                             "--model_path", bundle, "--chunk", "4", flag])
        segs[d] = np.asanyarray(nifti.load(
            str(data_dir / "5" / "seg_sa.nii.gz")).dataobj)
    assert float(np.mean(segs["d16"] == segs["d32"])) > 0.98


def test_phewas_cli_with_shipped_metadata(tmp_path):
    """The PheWAS runs with ZERO user-supplied metadata: field
    descriptions, recommended-category tables and the continuous map all
    default to the payload shipped under assoc/data/ (ported from the
    reference's data/ukb_field_categories.py + assoc/continuous.csv +
    assoc/ukb_field_added.txt)."""
    rng = np.random.RandomState(7)
    n = 60
    eids = np.arange(2000, 2000 + n)
    idp = pd.DataFrame({"LVEDV (mL)": rng.uniform(100, 200, n)}, index=eids)
    idp.index.name = "eid"
    idp_csv = tmp_path / "idp.csv"
    idp.to_csv(idp_csv)

    dates = [f"2014-0{1 + i % 9}-12" for i in range(n)]
    cols = pd.MultiIndex.from_tuples([
        ("Sex", "31-0.0"), ("Year of birth", "34-0.0"),
        ("Month of birth", "52-0.0"),
        ("Date of attending assessment centre", "53-2.0"),
        ("Weight", "21002-2.0"), ("Body mass index (BMI)", "21001-2.0"),
        ("Standing height", "50-0.0"), ("Pulse rate", "102-0.0"),
    ])
    df = pd.DataFrame({
        cols[0]: rng.randint(0, 2, n).astype(float),
        cols[1]: rng.randint(1940, 1970, n),
        cols[2]: rng.randint(1, 13, n),
        cols[3]: dates,
        cols[4]: rng.uniform(50, 100, n),
        cols[5]: rng.uniform(18, 35, n),
        cols[6]: rng.uniform(150, 190, n),
        cols[7]: rng.uniform(50, 100, n),
    }, index=eids)
    df.index.name = "eid"
    pheno_csv = tmp_path / "pheno.csv"
    df.to_csv(pheno_csv)

    out_dir = tmp_path / "out"
    from ukbb_cardiac_tpu.cli import perform_phenome_wide_association as phewas
    phewas.main(["--idp_csv", str(idp_csv), "--pheno_csv", str(pheno_csv),
                 "--output_dir", str(out_dir)])
    for f in ("confounders.csv", "normalised_IDPs.csv", "table_corr.csv",
              "table_p.csv", "manhattan.png", "top_hits.csv"):
        assert (out_dir / f).exists(), f
    corr = pd.read_csv(out_dir / "table_corr.csv", header=[0, 1], index_col=0)
    # fields 50 + 102 survive cleaning; their descriptions resolve from the
    # shipped ukb_field_added.txt and category 1006 from the category TSV
    assert corr.shape == (1, 2)

    from ukbb_cardiac_tpu.assoc import (load_continuous_map,
                                        load_field_categories,
                                        load_field_names)
    names = load_field_names()
    assert names[50] == "Standing height"
    cat, catname = load_field_categories()
    assert 50 in cat[1006] and catname[1006] == "Physical measure summary"
    assert len(cat) == 17  # 14 recommended + smoking + alcohol + cognitive
    cont = load_continuous_map()
    assert int(cont.loc[50]["continuous"]) == 1


def test_train_cli_profile_resolution(monkeypatch, tmp_path):
    """The production profile resolves to the measured TPU operating
    point (saturating batch, K-step, device augment, bf16, compact
    transfer, slice pool, linear-scaled lr); --profile reference keeps
    the reference budget; explicit flags override either way."""
    from ukbb_cardiac_tpu.cli import train_network as tn
    from ukbb_cardiac_tpu.train.sa import PRODUCTION_BATCH_SLICES

    seen = {}
    monkeypatch.setattr(tn, "train",
                        lambda cfg, resume_from=None: seen.update(cfg=cfg))
    base = ["--dataset_dir", str(tmp_path)]

    tn.main(base)  # default = production
    cfg = seen["cfg"]
    assert cfg.batch_slices == PRODUCTION_BATCH_SLICES
    assert cfg.steps_per_dispatch == 10
    assert cfg.device_augment and cfg.bf16 and cfg.compact_transfer
    assert cfg.device_slices and cfg.cache_gb == 4.0
    assert cfg.learning_rate == 1e-3 * PRODUCTION_BATCH_SLICES / 20.0

    tn.main(base + ["--profile", "reference"])
    cfg = seen["cfg"]
    assert cfg.batch_slices == 0 and cfg.steps_per_dispatch == 1
    assert not (cfg.device_augment or cfg.bf16 or cfg.compact_transfer
                or cfg.device_slices)
    assert cfg.cache_gb == 0.0 and cfg.learning_rate == 1e-3

    # explicit flags override the profile
    tn.main(base + ["--batch_slices", "32", "--learning_rate", "2e-3",
                    "--no-device_slices"])
    cfg = seen["cfg"]
    assert cfg.batch_slices == 32 and cfg.learning_rate == 2e-3
    assert not cfg.device_slices and cfg.bf16  # rest still production

    # mesh training auto-disables the (single-device) slice pool
    tn.main(base + ["--mesh_devices", "2", "--batch_slices", "32"])
    assert not seen["cfg"].device_slices

    # the documented '--batch_slices 0' reference-batching mode must
    # resolve to a runnable config under the production profile too
    # (steps_per_dispatch > 1 requires batch_slices)
    tn.main(base + ["--batch_slices", "0"])
    cfg = seen["cfg"]
    assert cfg.batch_slices == 0 and cfg.steps_per_dispatch == 1
    assert not cfg.device_slices and cfg.learning_rate == 1e-3
