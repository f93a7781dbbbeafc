"""End-to-end demo-pipeline orchestration on phantom data (no network)."""

import os

import numpy as np
import pandas as pd
import pytest

import jax

from ukbb_cardiac_tpu.ckpt import store
from ukbb_cardiac_tpu.io import nifti
from ukbb_cardiac_tpu.models import convlstm, fcn as fcn_mod, unet as unet_mod

from phantom import write_subject


def _tiny_models(model_dir):
    os.makedirs(model_dir, exist_ok=True)
    fcn_cfg = fcn_mod.FCNConfig(n_class=4, n_filter=(4, 4, 4, 4, 4),
                                n_block=(1, 1, 1, 1, 1), same_dim=4, fc=4)
    for name, n_class in (("FCN_sa", 4), ("FCN_la_2ch", 2),
                          ("FCN_la_4ch", 3), ("FCN_la_4ch_seg4", 6)):
        cfg = fcn_mod.FCNConfig(n_class=n_class, n_filter=(4, 4, 4, 4, 4),
                                n_block=(1, 1, 1, 1, 1), same_dim=4, fc=4)
        p, s, n = fcn_mod.init_fcn(jax.random.PRNGKey(0), cfg)
        store.save_model(os.path.join(model_dir, f"{name}.npz"), "fcn",
                         cfg, n, p, s)
    ucfg = unet_mod.UNetConfig(n_class=3, n_level=3, n_filter=(4, 4, 4),
                               n_block=(1, 1, 1))
    p, s, n = unet_mod.init_unet(jax.random.PRNGKey(0), ucfg)
    p.update(convlstm.init_biconv_lstm(jax.random.PRNGKey(1), 4, 4, 3))
    store.save_model(os.path.join(model_dir, "UNet-LSTM_ao.npz"), "unet_lstm",
                     ucfg, n, p, s, extra_meta={"bidirectional": True})


def test_demo_pipeline_end_to_end(tmp_path):
    data_dir = tmp_path / "demo_image"
    model_dir = tmp_path / "trained_model"
    csv_dir = tmp_path / "demo_csv"
    for i in (1, 2):
        write_subject(str(data_dir / str(i)), seqs=("sa", "la_2ch", "la_4ch", "ao"),
                      X=64, Y=64, Z=8, T=4)
    _tiny_models(str(model_dir))

    from ukbb_cardiac_tpu.cli import demo_pipeline
    demo_pipeline.main(["--data_dir", str(data_dir),
                        "--model_dir", str(model_dir),
                        "--csv_dir", str(csv_dir), "--skip_strain"])

    # segmentations for every sequence + the stage CSVs exist
    for i in (1, 2):
        for f in ("seg_sa.nii.gz", "seg_la_2ch.nii.gz", "seg_la_4ch.nii.gz",
                  "seg4_la_4ch.nii.gz", "seg_ao.nii.gz"):
            assert (data_dir / str(i) / f).exists(), f
    df = pd.read_csv(csv_dir / "table_ventricular_volume.csv", index_col=0)
    assert len(df) == 2
    assert (csv_dir / "table_wall_thickness.csv").exists()
    assert (csv_dir / "table_atrial_volume.csv").exists()


def test_download_contract_mocked(tmp_path, monkeypatch):
    """Pin the --download URL/manifest/unpack contract offline
    (reference: demo_pipeline.py:28-54).  urlretrieve is mocked; asserts
    the exact URL set, destination layout, and idempotency."""
    import urllib.request

    from ukbb_cardiac_tpu.cli import demo_pipeline as dp

    fetched = []

    def fake_urlretrieve(url, dest):
        fetched.append(url)
        with open(dest, "wb") as f:
            f.write(b"stub")

    monkeypatch.setattr(urllib.request, "urlretrieve", fake_urlretrieve)
    data_dir = str(tmp_path / "demo_image")
    model_dir = str(tmp_path / "trained_model")
    csv_dir = str(tmp_path / "demo_csv")
    dp.download_demo_data(data_dir, model_dir, csv_dir)

    base = dp.URL_BASE
    expected = set()
    for i in (1, 2):
        for seq in ("sa", "la_2ch", "la_4ch", "ao"):
            expected.add(f"{base}demo_image/{i}/{seq}.nii.gz")
    expected.add(f"{base}demo_csv/blood_pressure_info.csv")
    for model in ("FCN_sa", "FCN_la_2ch", "FCN_la_4ch", "FCN_la_4ch_seg4",
                  "UNet-LSTM_ao"):
        for suffix in ("meta", "index", "data-00000-of-00001"):
            expected.add(f"{base}trained_model/{model}.ckpt.{suffix}")
    assert set(fetched) == expected
    assert len(fetched) == len(expected)  # each exactly once

    # files land where main() reads them
    assert os.path.exists(os.path.join(data_dir, "1", "sa.nii.gz"))
    assert os.path.exists(os.path.join(csv_dir, "blood_pressure_info.csv"))
    assert os.path.exists(os.path.join(model_dir, "FCN_sa.ckpt.index"))

    # idempotent: a second call downloads nothing
    fetched.clear()
    dp.download_demo_data(data_dir, model_dir, csv_dir)
    assert fetched == []


def test_demo_pipeline_strain_stage_skips_gracefully(tmp_path):
    """Without --skip_strain, random-weight segmentations fail the strain
    QC gates and the pipeline must skip-and-continue (the reference's
    failure model, cardiac_utils.py:1703-1726) — not crash."""
    data_dir = tmp_path / "demo_image"
    model_dir = tmp_path / "trained_model"
    csv_dir = tmp_path / "demo_csv"
    write_subject(str(data_dir / "1"), seqs=("sa", "la_2ch", "la_4ch", "ao"),
                  X=64, Y=64, Z=8, T=4)
    _tiny_models(str(model_dir))

    from ukbb_cardiac_tpu.cli import demo_pipeline
    demo_pipeline.main(["--data_dir", str(data_dir),
                        "--model_dir", str(model_dir),
                        "--csv_dir", str(csv_dir)])
    # non-strain outputs still produced end-to-end
    assert (data_dir / "1" / "seg_sa.nii.gz").exists()
    assert (csv_dir / "table_ventricular_volume.csv").exists()


def test_demo_pipeline_runs_strain_on_quality_segmentations(tmp_path):
    """Capstone: with segmentations already present (the deploy stage's
    idempotent skip, deploy_network.py:62-67) that PASS the QC gates,
    the demo orchestrator runs the strain stages for real and produces
    the strain summary CSV — the full reference stage list end-to-end."""
    import pandas as pd

    data_dir = tmp_path / "demo_image"
    model_dir = tmp_path / "trained_model"
    csv_dir = tmp_path / "demo_csv"
    for i in ("1",):
        sub = data_dir / i
        write_subject(str(sub), seqs=("sa", "la_2ch", "la_4ch", "ao"),
                      X=96, Y=96, Z=8, T=6, with_seg=True)
        # ED extracts the strain/wall-thickness stages read
        for name in ("sa", "seg_sa"):
            nim = nifti.load(str(sub / f"{name}.nii.gz"))
            nifti.save(nifti.Nifti1Image(
                np.asanyarray(nim.dataobj)[:, :, :, 0], nim.affine),
                str(sub / f"{name}_ED.nii.gz"))
    _tiny_models(str(model_dir))

    from ukbb_cardiac_tpu.cli import demo_pipeline
    demo_pipeline.main(["--data_dir", str(data_dir),
                        "--model_dir", str(model_dir),
                        "--csv_dir", str(csv_dir)])
    # ground-truth seg_sa passed QC -> SA strain actually ran
    strain_csv = csv_dir / "table_strain_sax.csv"
    assert strain_csv.exists()
    df = pd.read_csv(strain_csv, index_col=0)
    assert len(df) == 1 and "Ecc_Global (%)" in df.columns
    assert np.isfinite(df["Ecc_Global (%)"].values).all()
