"""E236-E237 independent anchors (ORACLE_AUDIT.md maintenance rule):
both oracles replay the engines' per-death-time derivations, so the
math is anchored to numpy recomputations and to estimator identities
(Nelson-Aalen monotonicity + the Fleming-Harrington >= Kaplan-Meier
dominance; the log-rank O-E antisymmetry)."""

from __future__ import annotations

import numpy as np

from dumpty_spark.queries import REGISTRY
from tests.oracle import run_duckdb

_SPELLS_SQL = """
WITH bounds AS (SELECT MAX(ts) AS t_end FROM events),
p AS (
  SELECT user_id, ts,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events WHERE event_type = 'purchase'
)
SELECT date_diff('day', ts, COALESCE(nxt, (SELECT t_end FROM bounds)))
         AS dur,
       (nxt IS NULL) AS censored,
       CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS grp
FROM p
"""


def test_nelson_aalen_cumsum_and_km_dominance(spark, sf_smoke):
    life = run_duckdb(_SPELLS_SQL, sf_smoke)
    durs = life["dur"].to_numpy()
    dead = (~life["censored"]).to_numpy()
    na = {}
    h = 0.0
    for t in sorted(set(durs.tolist())):
        n = int((durs >= t).sum())
        d = int(dead[durs == t].sum())
        if d > 0:
            h += round(1e6 * d / n) / 1e6  # the engines' micro grid
            na[t] = (n, d, h)
    rows = REGISTRY["q_nelson_aalen"].fn(spark, sf_smoke).collect()
    assert len(rows) == len(na)
    prev_h = 0.0
    for r in rows:
        n, d, h = na[r["duration_days"]]
        assert r["n_at_risk"] == n and r["n_events"] == d
        assert abs(r["cum_hazard"] - h) < 1e-5
        assert abs(r["fh_survival"] - np.exp(-h)) < 1e-3
        # hazard accumulates; survival lives in [0, 1]
        assert r["cum_hazard"] >= prev_h - 1e-9
        prev_h = r["cum_hazard"]
        assert 0.0 <= r["fh_survival"] <= 1.0
    # Fleming-Harrington dominates Kaplan-Meier pointwise: products of
    # (1 - x) never exceed exp(-sum x)
    km = {
        r["duration_days"]: r["survival"]
        for r in REGISTRY["q_kaplan_meier"].fn(spark, sf_smoke).collect()
    }
    for r in rows:
        assert r["fh_survival"] >= km[r["duration_days"]] - 1e-4


def test_logrank_numpy_recompute_and_antisymmetry(spark, sf_smoke):
    life = run_duckdb(_SPELLS_SQL, sf_smoke)
    durs = life["dur"].to_numpy()
    dead = (~life["censored"]).to_numpy()
    grp = life["grp"].to_numpy()

    def oe_var(g):
        """O-E and V for group g, exact micro-grid like the engines."""
        oe = v = 0
        for t in sorted(set(durs.tolist())):
            at = durs >= t
            n = int(at.sum())
            d = int(dead[durs == t].sum())
            if d == 0:
                continue
            ng = int((at & (grp == g)).sum())
            dg = int((dead & (durs == t) & (grp == g)).sum())
            oe += round(1e6 * (dg - d * ng / n))
            if n > 1:
                v += round(1e6 * d * (ng / n) * (1 - ng / n) * (n - d) / (n - 1))
        return oe, v

    oe1, v1 = oe_var(1)
    oe0, v0 = oe_var(0)
    (r,) = REGISTRY["q_logrank_test"].fn(spark, sf_smoke).collect()
    # independent recomputation
    assert abs(r["observed_minus_expected"] - oe1 / 1e6) < 1e-4
    assert abs(r["variance"] - v1 / 1e6) < 1e-4
    chi2 = (oe1 / 1e6) ** 2 / (v1 / 1e6)
    assert abs(r["logrank_chi2"] - chi2) < 1e-3
    assert r["logrank_chi2"] >= 0.0
    # O-E antisymmetry: with two groups the sums are exact negatives
    # (d1 + d0 = d and e1 + e0 = d at every death time), and the
    # hypergeometric variance is symmetric in the groups
    assert abs(oe0 + oe1) <= len(set(durs.tolist()))  # <=1 micro per term
    assert abs(v0 - v1) <= len(set(durs.tolist()))
    # bookkeeping: spells partition into the two groups
    assert r["n_weekend"] + r["n_weekday"] == len(life)
    assert r["deaths_weekend"] + r["deaths_weekday"] == int(dead.sum())


def test_discrete_hazard_regression_score_equations(spark, sf_smoke):
    """E238 anchors: (a) the 3-component score equations X'(y-p) ~ 0 at
    the returned coefficients, (b) the fit beats the best intercept-only
    model, (c) a from-scratch UNQUANTIZED numpy Newton from zero lands
    on the same optimum."""
    import pandas as pd

    pp = run_duckdb(
        "WITH "
        + __import__(
            "dumpty_spark.queries.frontier45", fromlist=["_dhr_pp_sql"]
        )._dhr_pp_sql().strip()
        + "\nSELECT y, g, z FROM pp",
        sf_smoke,
    )
    (r,) = REGISTRY["q_discrete_hazard_regression"].fn(spark, sf_smoke).collect()
    y = pp["y"].to_numpy()
    x = np.column_stack([np.ones(len(y)), pp["g"].to_numpy(), pp["z"].to_numpy()])
    assert r["n_periods"] == len(y) and r["n_events"] == int(y.sum())

    theta = np.array(
        [r["coef_intercept"], r["coef_weekend"], r["coef_logtime"]]
    )
    p = 1.0 / (1.0 + np.exp(-x @ theta))
    score = x.T @ (y - p) / len(y)
    assert np.abs(score).max() < 1e-6  # optimality at the returned point

    loss = -np.mean(y * np.log(p) + (1 - y) * np.log(1 - p))
    assert abs(r["log_loss"] - loss) < 1e-5
    pbar = y.mean()  # best intercept-only model
    null_loss = -(pbar * np.log(pbar) + (1 - pbar) * np.log(1 - pbar))
    assert loss < null_loss

    # independent unquantized Newton from zero
    th = np.zeros(3)
    for _ in range(25):
        pr = 1.0 / (1.0 + np.exp(-x @ th))
        w = pr * (1 - pr)
        h = x.T @ (x * w[:, None])
        th = th + np.linalg.solve(h, x.T @ (y - pr))
    assert np.abs(th - theta).max() < 1e-4
    assert abs(r["weekend_odds_ratio"] - np.exp(th[1])) < 1e-3


def _kw_reference(groups):
    """Hand-rolled Kruskal-Wallis per scipy.stats.kruskal's documented
    formula: pooled mid-ranks, H = 12/(n(n+1)) sum R_g^2/n_g - 3(n+1),
    tie correction 1 - sum(t^3 - t)/(n^3 - n)."""
    pooled = [(v, gi) for gi, g in enumerate(groups) for v in g]
    pooled.sort(key=lambda p: p[0])
    ranks = [0.0] * len(pooled)
    i = 0
    ties = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j][0] == pooled[i][0]:
            j += 1
        mid = (i + 1 + j) / 2.0
        for m in range(i, j):
            ranks[m] = mid
        t = j - i
        ties += t * t * t - t
        i = j
    n = len(pooled)
    rg = [0.0] * len(groups)
    for r, (_, gi) in zip(ranks, pooled):
        rg[gi] += r
    h = 12.0 / (n * (n + 1)) * sum(
        rg[g] ** 2 / len(groups[g]) for g in range(len(groups))
    ) - 3.0 * (n + 1)
    return h, h / (1.0 - ties / (n**3 - n))


def test_kruskal_wallis_numpy_reference(spark, sf_smoke):
    d = run_duckdb(
        "SELECT event_type, ROUND(value, 4) AS v FROM events", sf_smoke
    )
    groups = [g["v"].to_numpy() for _, g in d.groupby("event_type")]
    h, hc = _kw_reference(groups)
    (r,) = REGISTRY["q_kruskal_wallis"].fn(spark, sf_smoke).collect()
    assert r["k"] == len(groups) and r["n"] == len(d)
    assert r["dof"] == len(groups) - 1
    assert abs(r["h_stat"] - h) < 1e-3
    assert abs(r["h_corrected"] - hc) < 1e-3
    assert abs(r["epsilon_sq"] - hc / (len(d) - 1)) < 1e-4
    assert r["h_stat"] >= 0.0
    assert r["h_corrected"] >= r["h_stat"] - 1e-9  # ties only inflate H


def test_kw_reference_two_group_equals_mwu_z_squared():
    """Cross-validate the KW test reference against the MWU reference:
    for two groups the tie-corrected H equals z^2 EXACTLY (textbook
    identity) — two independently-coded references agreeing on a
    nontrivial algebraic identity anchors both."""
    from tests.test_statistics import _mwu_reference

    rng = np.random.RandomState(11)
    a = list(np.round(rng.normal(10, 2, 300), 1))  # coarse grid -> ties
    b = list(np.round(rng.normal(10.5, 2, 260), 1))
    _, hc = _kw_reference([a, b])
    _, z = _mwu_reference(a, b)
    assert abs(hc - z * z) < 1e-9
