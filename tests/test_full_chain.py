"""Whole-framework chain test: DICOM → NIfTI → deploy → phenotypes → PheWAS.

Each stage is unit/integration tested on its own elsewhere; this test
proves the STAGES CONNECT — the files one stage writes are exactly what
the next stage reads, across the entire span of the reference pipeline
(``demo_pipeline.py`` + ``assoc/perform_phenome_wide_association.py``)
with zero network access:

  synthetic DICOM series (own writer)
    → Biobank_Dataset conversion (sa / la_2ch / la_4ch / ao NIfTIs)
    → demo pipeline (deploy all five networks + phenotype CSVs)
    → PheWAS on the resulting ventricular-volume IDPs
"""

import numpy as np
import pandas as pd

from test_data import _write_series
from test_demo_pipeline import _tiny_models

from ukbb_cardiac_tpu.data import Biobank_Dataset
from ukbb_cardiac_tpu.io import nifti


def test_dicom_to_phewas_full_chain(tmp_path):
    # --- stage 1: DICOM series -> NIfTI subject directories -------------
    data_dir = tmp_path / "demo_image"
    T = 4
    for eid in ("1", "2"):
        raw = tmp_path / "raw" / eid
        for z in range(3):
            _write_series(str(raw / f"CINE_segmented_SAX_b{z}"), z, T=T)
        _write_series(str(raw / "CINE_segmented_LAX_2Ch"), 7, T=T)
        _write_series(str(raw / "CINE_segmented_LAX_4Ch"), 9, T=T)
        _write_series(str(raw / "CINE_segmented_Ao_dist"), 5, T=T)
        ds = Biobank_Dataset(str(raw))
        ds.read_dicom_images()
        out = data_dir / eid
        out.mkdir(parents=True)
        ds.convert_dicom_to_nifti(str(out))
        for seq in ("sa", "la_2ch", "la_4ch", "ao"):
            assert (out / f"{seq}.nii.gz").exists(), seq

    # --- stage 2/3: deploy + phenotype CSVs via the demo orchestrator ---
    model_dir = tmp_path / "trained_model"
    csv_dir = tmp_path / "demo_csv"
    _tiny_models(str(model_dir))
    from ukbb_cardiac_tpu.cli import demo_pipeline
    demo_pipeline.main(["--data_dir", str(data_dir),
                        "--model_dir", str(model_dir),
                        "--csv_dir", str(csv_dir), "--skip_strain"])
    for eid in ("1", "2"):
        seg = nifti.load(str(data_dir / eid / "seg_sa.nii.gz"))
        assert seg.dataobj.shape[3] == T
    vv = pd.read_csv(csv_dir / "table_ventricular_volume.csv", index_col=0)
    assert len(vv) == 2 and np.isfinite(vv["LVEDV (mL)"]).all()

    # --- stage 4: PheWAS on the measured IDPs ----------------------------
    rng = np.random.RandomState(0)
    n = 60
    eids = np.arange(3000, 3000 + n)
    # replicate the two measured subjects' IDPs across a synthetic cohort
    # (PheWAS needs cohort-scale rows; values COME FROM stage 3's CSV)
    idp = pd.DataFrame(
        {"LVEDV (mL)": np.resize(vv["LVEDV (mL)"].values, n)
         + rng.normal(0, 1e-3, n)}, index=eids)
    idp.index.name = "eid"
    idp_csv = tmp_path / "idp.csv"
    idp.to_csv(idp_csv)

    cols = pd.MultiIndex.from_tuples([
        ("Sex", "31-0.0"), ("Year of birth", "34-0.0"),
        ("Month of birth", "52-0.0"),
        ("Date of attending assessment centre", "53-2.0"),
        ("Weight", "21002-2.0"), ("Body mass index (BMI)", "21001-2.0"),
        ("Standing height", "50-0.0"), ("Pulse rate", "102-0.0"),
    ])
    pheno = pd.DataFrame({
        cols[0]: rng.randint(0, 2, n).astype(float),
        cols[1]: rng.randint(1940, 1970, n),
        cols[2]: rng.randint(1, 13, n),
        cols[3]: [f"2014-0{1 + i % 9}-12" for i in range(n)],
        cols[4]: rng.uniform(50, 100, n),
        cols[5]: rng.uniform(18, 35, n),
        cols[6]: rng.uniform(150, 190, n),
        cols[7]: rng.uniform(50, 100, n),
    }, index=eids)
    pheno.index.name = "eid"
    pheno_csv = tmp_path / "pheno.csv"
    pheno.to_csv(pheno_csv)

    out_dir = tmp_path / "assoc_out"
    from ukbb_cardiac_tpu.cli import perform_phenome_wide_association as phewas
    phewas.main(["--idp_csv", str(idp_csv), "--pheno_csv", str(pheno_csv),
                 "--output_dir", str(out_dir)])
    # two header rows: the phenotype columns are a (name, field-id)
    # MultiIndex like the reference's spreadsheets
    corr = pd.read_csv(out_dir / "table_corr.csv", index_col=0,
                       header=[0, 1])
    assert corr.shape[0] == 1 and corr.shape[1] >= 1
    assert np.isfinite(corr.values.astype(float)).all()
    assert (out_dir / "manhattan.png").exists()
