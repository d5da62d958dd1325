"""Born anchors for the model-diagnostics family (E245-E247): each
statistic recomputed INDEPENDENTLY in pandas/numpy straight from the
raw parquet — float64 central moments, no milli grid, no shared SQL —
plus the defining cross-identities."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dumpty_spark.queries import REGISTRY


def _events(sf_dir):
    return pd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )


def test_brown_forsythe_numpy_anchor(spark, sf_smoke):
    row = REGISTRY["q_levene_brown_forsythe"].fn(spark, sf_smoke).first()
    ev = _events(sf_smoke)
    # independent: float64 values, per-group numpy medians, textbook W
    z = []
    for _, g in ev.groupby("event_type"):
        x = g["value"].to_numpy(dtype=float)
        z.append(np.abs(x - np.quantile(x, 0.5)))
    k = len(z)
    n = sum(len(a) for a in z)
    grand = np.concatenate(z).mean()
    ssb = sum(len(a) * (a.mean() - grand) ** 2 for a in z)
    ssw = sum(((a - a.mean()) ** 2).sum() for a in z)
    w = ((n - k) / (k - 1)) * ssb / ssw
    assert row["k"] == k and row["n"] == n
    # the engine's milli grid vs raw float64: agree to ~1e-3 relative
    assert row["w_stat"] == pytest.approx(w, rel=2e-3)
    assert row["ss_between"] == pytest.approx(ssb, rel=2e-3)
    assert row["ss_within"] == pytest.approx(ssw, rel=2e-3)
    assert row["w_stat"] >= 0


def test_jarque_bera_numpy_anchor(spark, sf_smoke):
    row = REGISTRY["q_jarque_bera"].fn(spark, sf_smoke).first()
    x = _events(sf_smoke)["value"].to_numpy(dtype=float)
    mu = x.mean()
    mu2 = ((x - mu) ** 2).mean()
    skew = ((x - mu) ** 3).mean() / mu2**1.5
    kurt = ((x - mu) ** 4).mean() / mu2**2
    jb = len(x) / 6.0 * (skew**2 + (kurt - 3) ** 2 / 4.0)
    assert row["n"] == len(x)
    assert row["mean"] == pytest.approx(mu, abs=2e-3)
    assert row["skewness"] == pytest.approx(skew, rel=2e-3)
    assert row["kurtosis"] == pytest.approx(kurt, rel=2e-3)
    assert row["jb_stat"] == pytest.approx(jb, rel=5e-3)
    # JB is a sum of squares — and the published pieces recompose it
    recompose = row["n"] / 6.0 * (
        row["skewness"] ** 2 + (row["kurtosis"] - 3) ** 2 / 4.0
    )
    assert row["jb_stat"] == pytest.approx(recompose, rel=1e-3)


def test_poisson_dispersion_pandas_anchor(spark, sf_smoke):
    rows = {
        r["event_type"]: r
        for r in REGISTRY["q_poisson_dispersion"].fn(spark, sf_smoke)
        .collect()
    }
    ev = _events(sf_smoke)
    ev["d"] = pd.to_datetime(ev["ts"]).dt.date
    daily = ev.groupby(["event_type", "d"]).size()
    for et, r in rows.items():
        c = daily[et].to_numpy(dtype=float)
        mean = c.mean()
        disp = c.var(ddof=1) / mean
        assert r["n_days"] == len(c)
        assert r["n_events"] == int(c.sum())
        assert r["mean_daily"] == pytest.approx(mean, abs=1e-3)
        assert r["dispersion"] == pytest.approx(disp, rel=1e-3)
        # defining identity between the published numbers
        assert r["chi2"] == pytest.approx(
            (r["n_days"] - 1) * r["dispersion"], rel=1e-3
        )
        assert r["dispersion"] > 0
