"""Association-layer tests: FDR, rank normalisation, masked correlation."""

import numpy as np
import pandas as pd
import pytest
import scipy.stats

from ukbb_cardiac_tpu.assoc import (
    clean_columns,
    deconfound_idps,
    fdr_threshold,
    masked_pearson,
    normalise,
    p_adjust_fdr,
    rank_normalise,
    significance_thresholds,
    top_hits_table,
    univariate_correlation,
)


def test_p_adjust_fdr_reference_semantics():
    p = np.array([0.01, 0.02, 0.03, 0.5])
    out = p_adjust_fdr(p)
    # p * n / rank
    np.testing.assert_allclose(out, [0.04, 0.04, 0.04, 0.5], atol=1e-6)
    assert np.all(out <= 1)


def test_fdr_threshold():
    rng = np.random.RandomState(0)
    p = np.concatenate([rng.uniform(0, 1e-4, 50), rng.uniform(0, 1, 950)])
    pID, pN = fdr_threshold(p, 0.05)
    assert 0 < pN <= pID < 0.05
    # NaNs ignored
    p_nan = np.append(p, [np.nan] * 10)
    pID2, _ = fdr_threshold(p_nan, 0.05)
    assert pID2 == pID


def test_rank_normalise_properties():
    rng = np.random.RandomState(1)
    x = rng.exponential(size=501)
    y = rank_normalise(x)
    # approximately standard normal
    assert abs(np.mean(y)) < 0.05
    assert abs(np.std(y) - 1) < 0.05
    # monotone: order preserved
    assert np.all(np.argsort(x) == np.argsort(y))
    # ties get equal values
    x2 = np.array([1.0, 2.0, 2.0, 3.0])
    y2 = rank_normalise(x2)
    assert y2[1] == y2[2]


def test_masked_pearson_matches_scipy():
    rng = np.random.RandomState(2)
    X = rng.randn(200, 4)
    Y = rng.randn(200, 5)
    Y[:, 0] = X[:, 0] * 0.5 + rng.randn(200) * 0.1  # correlated pair
    X[rng.rand(200, 4) < 0.1] = np.nan
    Y[rng.rand(200, 5) < 0.1] = np.nan

    r, p = masked_pearson(X, Y)
    for i in range(4):
        for j in range(5):
            valid = ~np.isnan(X[:, i]) & ~np.isnan(Y[:, j])
            cc, pv = scipy.stats.pearsonr(X[valid, i], Y[valid, j])
            assert r[i, j] == pytest.approx(cc, abs=1e-10)
            assert p[i, j] == pytest.approx(pv, rel=1e-6, abs=1e-12)


def test_clean_columns():
    n = 100
    rng = np.random.RandomState(3)
    base = rng.randn(n)
    df = pd.DataFrame({
        ("A", "1-0.0"): base,
        ("B", "2-0.0"): base + 1e-9 * rng.randn(n),   # duplicate of A
        ("C", "3-0.0"): np.full(n, 7.0),               # constant
        ("D", "4-0.0"): np.where(np.arange(n) < 95, np.nan, 1.0 * np.arange(n)),  # 95% missing
        ("E", "5-0.0"): rng.randn(n),
    })
    out = clean_columns(df)
    kept = [c[0] for c in out.columns]
    assert "E" in kept and "C" not in kept and "D" not in kept
    assert ("A" in kept) != ("B" in kept)  # exactly one of the duplicates


def test_deconfound_and_univariate(tmp_path):
    rng = np.random.RandomState(4)
    n = 300
    conf = np.stack([rng.randint(0, 2, n).astype(float), rng.uniform(40, 70, n),
                     np.zeros(n), rng.uniform(50, 100, n),
                     rng.uniform(150, 190, n)], axis=1)
    conf[:, 2] = conf[:, 0] * conf[:, 1]
    # IDP strongly driven by age + noise
    idp = 2.0 * conf[:, 1] + rng.randn(n)
    df_idp = pd.DataFrame({"LVEDV (mL)": idp})
    df_idp2, beta = deconfound_idps(df_idp, conf)
    # after de-confounding, correlation with age is ~0
    r = np.corrcoef(df_idp2.values[:, 0], conf[:, 1])[0, 1]
    assert abs(r) < 0.05
    assert abs(np.std(df_idp2.values[:, 0]) - 1) < 1e-6

    cov = rng.randn(n)
    df_x = pd.DataFrame({("X", "10-0.0"): cov,
                         ("Y", "11-0.0"): df_idp2.values[:, 0] * 0.8
                          + 0.2 * rng.randn(n)})
    df_corr, df_p, df_log_p = univariate_correlation(df_idp2, df_x)
    assert df_corr.shape == (1, 2)
    assert df_p.values[0, 1] < 1e-10  # the planted association
    p_bonf, p_fdr = significance_thresholds(df_p.values)
    assert p_fdr >= 0
    hits = top_hits_table(df_corr, df_p, {11: "planted"}, p_thres=1e-5)
    assert len(hits) >= 1 and hits.iloc[0]["Field"] == "planted"
