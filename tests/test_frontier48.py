"""Anchors for the time-series inference family (E248-E250).
q_seasonal_decompose's oracle is Category A (pure declarative windows,
independently executed) — its tests here are structural identities.
Granger and Mann-Kendall replay shared closed forms (Category D), so
each gets an independent numpy recompute from the raw parquet."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dumpty_spark.queries import REGISTRY


def _daily_mean(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])
    day = pd.to_datetime(ev["ts"]).dt.date
    d0 = day.min()
    d = day.map(lambda x: (x - d0).days)
    vm = (ev["value"] * 1000).round().astype("int64")
    g = pd.DataFrame({"d": d, "vm": vm}).groupby("d")["vm"].agg(
        ["sum", "count"]
    )
    return (g["sum"] / g["count"] / 1000.0).round(6)


def test_seasonal_decompose_identities(spark, sf_smoke):
    rows = REGISTRY["q_seasonal_decompose"].fn(spark, sf_smoke).collect()
    assert 1 <= len(rows) <= 7
    # recentered seasonal indices sum to ~0
    assert sum(r["seasonal"] for r in rows) == pytest.approx(0.0, abs=1e-2)
    r0 = rows[0]
    assert 0.0 <= r0["frac_explained"] <= 1.0
    assert r0["var_remainder"] <= r0["var_total"] + 1e-9
    # independent recompute of the whole decomposition in pandas
    m = _daily_mean(sf_smoke)
    tr = m.rolling(7, center=True, min_periods=7).mean()
    dt = (m - tr).dropna()
    sea_raw = dt.groupby(dt.index % 7).mean()
    sea = sea_raw - sea_raw.mean()
    got = {r["dow"]: r["seasonal"] for r in rows}
    for dow, v in sea.items():
        assert got[dow] == pytest.approx(v, abs=2e-3)


def test_granger_lstsq_anchor(spark, sf_smoke):
    row = REGISTRY["q_granger_lag1"].fn(spark, sf_smoke).first()
    ev = pd.read_parquet(
        f"{sf_smoke}/events.parquet", columns=["ts", "event_type"]
    )
    day = pd.to_datetime(ev["ts"]).dt.date
    d0, d1 = day.min(), day.max()
    span = (d1 - d0).days
    d = day.map(lambda x: (x - d0).days)
    p = np.bincount(
        d[ev["event_type"] == "purchase"], minlength=span + 1
    ).astype(float)
    x = np.bincount(
        d[ev["event_type"] == "click"], minlength=span + 1
    ).astype(float)
    y, pl, xl = p[1:], p[:-1], x[:-1]
    n = len(y)
    A_r = np.vstack([np.ones(n), pl]).T
    A_u = np.vstack([np.ones(n), pl, xl]).T
    sse_r = float(((y - A_r @ np.linalg.lstsq(A_r, y, rcond=None)[0]) ** 2).sum())
    sse_u = float(((y - A_u @ np.linalg.lstsq(A_u, y, rcond=None)[0]) ** 2).sum())
    f = (sse_r - sse_u) / (sse_u / (n - 3))
    assert row["n"] == n
    assert row["sse_restricted"] == pytest.approx(sse_r, rel=1e-6)
    assert row["sse_unrestricted"] == pytest.approx(sse_u, rel=1e-6)
    assert row["f_stat"] == pytest.approx(f, rel=1e-4)
    # adding a regressor can only reduce SSE
    assert row["sse_unrestricted"] <= row["sse_restricted"] + 1e-9
    assert row["f_stat"] >= 0


def test_mann_kendall_numpy_anchor(spark, sf_smoke):
    row = REGISTRY["q_mann_kendall"].fn(spark, sf_smoke).first()
    m = _daily_mean(sf_smoke).to_numpy()
    n = len(m)
    s = 0
    for i in range(n - 1):
        s += int(np.sign(m[i + 1:] - m[i]).sum())
    _, counts = np.unique(m, return_counts=True)
    tt = int(sum(t * (t - 1) * (2 * t + 5) for t in counts if t > 1))
    var_s = (n * (n - 1) * (2 * n + 5) - tt) / 18.0
    z = (s - np.sign(s)) / var_s**0.5 if s != 0 else 0.0
    assert row["n_days"] == n
    assert row["s_stat"] == s
    assert row["n_pairs"] == n * (n - 1) // 2
    assert row["var_s"] == pytest.approx(var_s, abs=5e-3)  # 2dp-rounded output
    assert row["z_stat"] == pytest.approx(z, abs=1e-3)
    assert 0.0 <= row["p_value"] <= 1.0
    # cross-pin: the TEST's direction agrees with the Theil-Sen slope
    # ESTIMATE on the same series (both 0-safe)
    slopes = [
        (m[j] - m[i]) / (j - i) for i in range(n) for j in range(i + 1, n)
    ]
    ts_slope = float(np.median(slopes))
    if abs(row["z_stat"]) > 1.0:  # only when the trend is resolvable
        assert np.sign(ts_slope) == np.sign(row["s_stat"])
