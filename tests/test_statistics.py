"""Non-circular checks for the statistical-test queries.

The driver's oracle comparison proves Spark == DuckDB, but both sides share
the formula — so a formula bug is invisible to it (round-3 advice found
exactly that in the Mann-Whitney tie correction). These tests re-derive the
statistics with an independent pure-Python reference (scipy's documented
formulas, hand-rolled because scipy is not in the sandbox) on the same
fixture data and assert the Spark results agree.
"""
from __future__ import annotations

import math
from collections import Counter

import pytest


def _mwu_reference(first: list[float], second: list[float]) -> tuple[float, float]:
    """Mann-Whitney U and tie-corrected normal z, per scipy.stats.mannwhitneyu
    (method="asymptotic", use_continuity=False):

        U1 = R1 - n1(n1+1)/2
        mu = n1 n2 / 2
        var = n1 n2 / 12 * ((n + 1) - sum(t^3 - t) / (n (n - 1)))
        z = (U1 - mu) / sqrt(var)
    """
    pooled = [(v, 0) for v in first] + [(v, 1) for v in second]
    pooled.sort(key=lambda p: p[0])
    # mid-ranks
    ranks: list[float] = [0.0] * len(pooled)
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j][0] == pooled[i][0]:
            j += 1
        mid = (i + 1 + j) / 2.0  # average of ranks i+1..j
        for k in range(i, j):
            ranks[k] = mid
        i = j
    r1 = sum(r for r, (_, g) in zip(ranks, pooled) if g == 0)
    n1, n2 = float(len(first)), float(len(second))
    n = n1 + n2
    u1 = r1 - n1 * (n1 + 1) / 2
    ties = Counter(v for v, _ in pooled)
    tie_term = sum(t**3 - t for t in ties.values())
    var = n1 * n2 / 12.0 * ((n + 1) - tie_term / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2) / math.sqrt(var)
    return u1, z


def test_mwu_reference_sanity():
    # Known case, no ties: first=[1,2,3], second=[4,5,6] → U1 = 0
    u1, z = _mwu_reference([1, 2, 3], [4, 5, 6])
    assert u1 == 0.0
    assert z < 0
    # Symmetric case → z = 0
    u1, z = _mwu_reference([1, 2, 3, 4], [1, 2, 3, 4])
    assert abs(z) < 1e-12
    assert u1 == 8.0  # R1 = (1.5+3.5+5.5+7.5) = 18; 18 - 10 = 8 = n1*n2/2


def test_mannwhitney_drift_matches_independent_reference(spark, sf_smoke):
    """q_mannwhitney_drift's (u_stat, z) per event_type must equal the
    pure-Python scipy-formula reference computed from the raw rows."""
    from dumpty_spark.queries.relational6 import q_mannwhitney_drift
    from dumpty_spark.sources.parquet import load_table

    out = {
        r["event_type"]: (r["u_stat"], r["z"])
        for r in q_mannwhitney_drift(spark, sf_smoke).collect()
    }
    raw = (
        load_table(spark, sf_smoke, "events")
        .select("event_type", "ts", "value")
        .collect()
    )
    by_type: dict[str, list] = {}
    for r in raw:
        by_type.setdefault(r["event_type"], []).append(r)
    assert out, "query returned no groups"
    for et, rows in by_type.items():
        ts_us = [int(r["ts"].timestamp() * 1_000_000) for r in rows]
        cut = (min(ts_us) + max(ts_us)) // 2
        first = [float(r["value"]) for r, t in zip(rows, ts_us) if t < cut]
        second = [float(r["value"]) for r, t in zip(rows, ts_us) if t >= cut]
        # ties are the whole point: events.value is rounded to 2dp
        u_ref, z_ref = _mwu_reference(first, second)
        u_got, z_got = out[et]
        assert abs(u_got - round(u_ref, 1)) <= 0.1, (et, u_got, u_ref)
        assert abs(z_got - z_ref) < 5e-4, (et, z_got, z_ref)


def test_mwu_tie_correction_is_material(spark, monkeypatch):
    """End-to-end guard against regressing to the round-3 bug (per-row
    tie term (t²−1)/t and 1/n scaling instead of sum(t³−t)/(n(n−1))).
    The parquet fixture's ties are too sparse to separate the formulas
    beyond ~5e-5 — which is WHY the bug survived the oracle hash-match
    — so this test feeds the QUERY a synthetic heavy-tie series (values
    from a 5-symbol alphabet) where the two variances differ
    materially, and asserts the query's z matches the correct reference
    and is far from the buggy one."""
    import datetime

    from collections import Counter

    import dumpty_spark.queries.relational6 as r6

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (
            i,
            base + datetime.timedelta(minutes=i),
            i % 7,
            "x",
            # 5-symbol alphabet, second half shifted +1: halves share
            # symbols 1-4 (dense cross-half ties) but differ in
            # location, so U ≠ n1n2/2 and z ≠ 0
            float(i * 13 % 5 + (1 if i >= 200 else 0)),
            "{}",
        )
        for i in range(400)
    ]
    fake = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    monkeypatch.setattr(r6, "load_table", lambda s, d, n: fake)
    got = {
        r["event_type"]: r["z"]
        for r in r6.q_mannwhitney_drift(spark, "ignored").collect()
    }
    # pure-python references on the same split the query uses
    us = [int(ts.timestamp() * 1_000_000) for _, ts, *_ in rows]
    cut = (min(us) + max(us)) // 2
    first = [v for (_, _, _, _, v, _), u in zip(rows, us) if u < cut]
    second = [v for (_, _, _, _, v, _), u in zip(rows, us) if u >= cut]
    u1, z_correct = _mwu_reference(first, second)
    n1, n2 = float(len(first)), float(len(second))
    n = n1 + n2
    ties = Counter(first + second)
    buggy_tie = sum((t * t - 1.0) / t for t in ties.values())
    var_buggy = n1 * n2 / 12.0 * ((n + 1) - buggy_tie / n)
    z_buggy = (u1 - n1 * n2 / 2) / math.sqrt(var_buggy)
    assert abs(z_correct - z_buggy) > 0.01, (
        "synthetic ties fail to separate the formulas — guard is vacuous"
    )
    assert abs(got["x"] - z_correct) < 5e-4
    assert abs(got["x"] - z_buggy) > 5e-3


# ===========================================================================
# Round-10 oracle-independence batch (ORACLE_AUDIT.md Category D): the
# single-expression closed forms both engines transcribe identically.
# Each test anchors one family to an axiom, an identity on the published
# components, an alternative formulation, or an independent numpy
# recomputation from raw data. See tests/test_oracle_independence.py for
# the recursion/trajectory families (Category C).
# ===========================================================================

import numpy as np

from dumpty_spark.queries import REGISTRY
from tests.oracle import run_duckdb


def _phi(z: float) -> float:
    return 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))


def test_cuped_variance_reduction_nonneg(spark, sf_smoke):
    rows = REGISTRY["q_cuped_lift"].fn(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        # theta = cov/var on the pooled sample is the variance-minimizing
        # coefficient, so the reduction is rho^2 in [0, 1)
        assert -1e-6 <= r["variance_reduction"] < 1.0


def test_neyman_allocation_proportionality(spark, sf_smoke):
    rows = REGISTRY["q_neyman_allocation"].fn(spark, sf_smoke).collect()
    z = sum(r["n_stratum"] * r["sigma"] for r in rows)
    for r in rows:
        # Neyman: k_h = max(1, floor(B * N_h sigma_h / Z)), B = 100
        ideal = 100.0 * r["n_stratum"] * r["sigma"] / z
        assert max(1, math.floor(ideal + 1e-6)) == r["allocated"] or abs(
            r["allocated"] - ideal
        ) <= 1.0
        assert r["drawn"] == min(r["allocated"], r["n_stratum"])


def test_mde_power_inversion(spark, sf_smoke):
    """Recompute POWER at the published MDE: by definition of the
    (z_{a/2} + z_b) closed form, Phi(mde/se - z_.975) must equal 0.80."""
    rows = REGISTRY["q_mde_power"].fn(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        m = r["n_users"] // 2
        se = r["sigma"] * math.sqrt(2.0 / m)
        power = _phi(r["mde_abs"] / se - 1.959964)
        assert abs(power - 0.80) < 2e-3
        assert abs(r["mde_rel"] - r["mde_abs"] / r["mean_value"]) < 1e-3


def test_ips_effective_sample_size_bound(spark, sf_smoke):
    (r,) = REGISTRY["q_ips_offpolicy"].fn(spark, sf_smoke).collect()
    n_match = r["n_events"] * r["match_rate"]
    # Cauchy-Schwarz: ESS = (sum w)^2 / sum w^2 <= #matched rows,
    # equality iff the weights are uniform
    assert 0 < r["ess"] <= n_match + 1e-6
    assert r["ips_value"] >= 0 and r["snips_value"] >= 0


def test_woe_iv_reaggregation(spark, sf_smoke):
    rows = REGISTRY["q_woe_encoding"].fn(spark, sf_smoke).collect()
    iv_total = {r["iv_total"] for r in rows}
    assert len(iv_total) == 1
    assert abs(next(iter(iv_total)) - sum(r["iv_contrib"] for r in rows)) < 1e-3
    assert all(r["iv_contrib"] >= -1e-9 for r in rows)  # (dp-dn)ln(dp/dn) >= 0
    tp = sum(r["pos"] for r in rows)
    tn = sum(r["neg"] for r in rows)
    k = len(rows)
    for r in rows:
        dp = (r["pos"] + 0.5) / (tp + 0.5 * k)
        dn = (r["neg"] + 0.5) / (tn + 0.5 * k)
        # WOE sign follows the smoothed rate comparison
        assert (r["woe"] > 0) == (dp > dn) or abs(r["woe"]) < 1e-6


def test_msprt_identities(spark, sf_smoke):
    rows = REGISTRY["q_msprt_readout"].fn(spark, sf_smoke).collect()
    for r in rows:
        assert 0.0 < r["always_valid_p"] <= 1.0
        assert abs(r["always_valid_p"] - min(1.0, 1.0 / r["lambda"])) < 1e-3
        assert r["significant"] == (r["always_valid_p"] < 0.05)


def test_gini_mean_absolute_difference_form(spark, sf_smoke):
    """Independent formulation: G = sum_ij |x_i - x_j| / (2 n^2 mean),
    not the rank-sum identity both engines use."""
    rev = run_duckdb(
        "SELECT SUM(o_totalprice) AS r FROM orders GROUP BY o_custkey",
        sf_smoke,
    )["r"].to_numpy()
    (g,) = REGISTRY["q_gini_revenue"].fn(spark, sf_smoke).collect()
    assert g["n_customers"] == len(rev)
    mad = np.abs(rev[:, None] - rev[None, :]).sum()
    gini_mad = mad / (2.0 * len(rev) ** 2 * rev.mean())
    assert abs(g["gini"] - gini_mad) < 1e-4
    assert 0.0 <= g["gini"] < 1.0
    top = np.sort(rev)[-int(len(rev) * 0.1) :].sum() / rev.sum()
    assert abs(g["top10pct_share"] - top) < 1e-4


def test_lorenz_curve_shape_axioms(spark, sf_smoke):
    rows = sorted(
        REGISTRY["q_lorenz_deciles"].fn(spark, sf_smoke).collect(),
        key=lambda r: r["decile"],
    )
    assert abs(sum(r["rev_share"] for r in rows) - 1.0) < 1e-3
    assert abs(rows[-1]["cum_share"] - 1.0) < 1e-3
    cums = [r["cum_share"] for r in rows]
    assert all(b >= a - 1e-9 for a, b in zip(cums, cums[1:]))  # monotone
    shares = [r["rev_share"] for r in rows]
    # deciles are ordered by revenue -> the Lorenz curve is convex
    assert all(b >= a - 1e-6 for a, b in zip(shares, shares[1:]))


def test_benford_expected_is_log_law(spark, sf_smoke):
    rows = REGISTRY["q_benford_digits"].fn(spark, sf_smoke).collect()
    assert len(rows) == 9
    for r in rows:
        d = int(r["digit"])
        assert abs(r["expected"] - math.log10(1 + 1 / d)) < 1e-3
    assert abs(sum(r["expected"] for r in rows) - 1.0) < 1e-2
    assert abs(sum(r["observed"] for r in rows) - 1.0) < 1e-2


def test_divergences_nonnegative(spark, sf_smoke):
    """Gibbs' inequality: KL and PSI are >= 0 for any pair of
    distributions — a sign bug in either engine's shared formula would
    surface here, not in the parity hash."""
    for r in REGISTRY["q_psi_value_drift"].fn(spark, sf_smoke).collect():
        assert r["psi"] >= -1e-9
    for r in REGISTRY["q_source_kl_divergence"].fn(spark, sf_smoke).collect():
        assert r["kl_nats"] >= -1e-9
        assert abs(r["kl_nats"] - r["kl_micro"] / 1e6) < 1e-6
    rows = REGISTRY["q_distribution_drift"].fn(spark, sf_smoke).collect()
    assert abs(sum(r["p_a"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["p_b"] for r in rows) - 1.0) < 1e-3
    assert sum(r["kl_term"] for r in rows) >= -1e-9  # total KL
    tv = sum(r["tv_term"] for r in rows)
    assert -1e-9 <= tv <= 1.0 + 1e-9
    for r in rows:
        assert abs(r["tv_term"] - abs(r["p_a"] - r["p_b"]) / 2.0) < 1e-3


def test_chi2_and_mi_nonneg(spark, sf_smoke):
    (c,) = REGISTRY["q_chi2_independence"].fn(spark, sf_smoke).collect()
    assert c["chi2"] >= 0.0 and c["dof"] >= 1
    (m,) = REGISTRY["q_mutual_information"].fn(spark, sf_smoke).collect()
    assert m["mi_bits"] >= -1e-9
    assert -1e-9 <= m["uncertainty_coeff"] <= 1.0 + 1e-9


def test_ks_critical_value_formula(spark, sf_smoke):
    for r in REGISTRY["q_ks_twosample"].fn(spark, sf_smoke).collect():
        assert 0.0 <= r["ks_d"] <= 1.0
        n1, n2 = r["n_weekend"], r["n_weekday"]
        d_crit = 1.358 * math.sqrt((n1 + n2) / (n1 * n2))
        assert abs(r["d_crit"] - d_crit) < 1e-3
        assert r["reject_95"] == (r["ks_d"] > r["d_crit"])


def test_ratio_se_delta_vs_jackknife_agreement(spark, sf_smoke):
    """The delta method and the leave-one-out jackknife are independent
    derivations of the SAME asymptotic SE; they must agree to first
    order (both are published columns)."""
    for r in REGISTRY["q_ratio_se"].fn(spark, sf_smoke).collect():
        assert r["se_delta"] > 0 and r["se_jackknife"] > 0
        assert abs(r["se_jackknife"] - r["se_delta"]) / r["se_delta"] < 0.25


def test_propensity_att_micro_identity(spark, sf_smoke):
    (r,) = REGISTRY["q_propensity_att"].fn(spark, sf_smoke).collect()
    assert abs(r["att"] - r["att_micro"] / 1e6) < 1e-6
    assert r["n_strata_used"] >= 1


def test_surprisal_and_drift_bounds(spark, sf_smoke):
    for r in REGISTRY["q_unigram_surprisal"].fn(spark, sf_smoke).collect():
        assert 0.0 <= r["min_surprisal"] <= r["avg_surprisal"] <= r["max_surprisal"]
    (d,) = REGISTRY["q_embedding_drift"].fn(spark, sf_smoke).collect()
    assert -1.0 - 1e-9 <= d["centroid_cosine"] <= 1.0 + 1e-9
    assert d["centroid_shift"] >= 0
    # the total-variance ratio is a weighted mean of per-dim ratios
    assert (
        d["min_dim_var_ratio"] - 1e-6
        <= d["trace_ratio"]
        <= d["max_dim_var_ratio"] + 1e-6
    )


def test_text_tiling_depth_bounds(spark, sf_smoke):
    for r in REGISTRY["q_text_tiling"].fn(spark, sf_smoke).collect():
        assert 0 <= r["n_boundaries"] <= r["n_gaps"]
        assert 0 <= r["max_depth_u6"] <= r["depth_sum_u6"]


def test_theilsen_slope_numpy_median(spark, sf_smoke):
    daily = run_duckdb(
        """
        SELECT CAST(ts AS DATE) AS d, SUM(value) AS y
        FROM events WHERE event_type = 'purchase' GROUP BY 1 ORDER BY 1
        """,
        sf_smoke,
    )
    x = (daily["d"] - daily["d"].min()).dt.days.to_numpy().astype(float)
    y = daily["y"].to_numpy()
    i, j = np.triu_indices(len(x), k=1)
    slopes = (y[j] - y[i]) / (x[j] - x[i])
    (r,) = REGISTRY["q_theilsen_slope"].fn(spark, sf_smoke).collect()
    assert r["n_days"] == len(x) and r["n_pairs"] == len(slopes)
    assert abs(r["sen_slope"] - np.median(slopes)) < 1e-3
    assert abs(r["sen_intercept"] - np.median(y - np.median(slopes) * x)) < 1e-3


def test_fdr_pvalue_is_two_sided_normal(spark, sf_smoke):
    for r in REGISTRY["q_fdr_weekday"].fn(spark, sf_smoke).collect():
        p = 2.0 * (1.0 - _phi(abs(r["z_stat"])))
        assert abs(r["p_value"] - p) < 1e-3
        assert 0.0 <= r["p_value"] <= 1.0


def test_did_cell_mean_identity(spark, sf_smoke):
    """DiD re-derived from the raw cells with the engines' md5 split
    replayed in DuckDB: lift must equal (T2-T1)-(C2-C1) computed in
    plain numpy from the four cell means."""
    from dumpty_spark.operators.sampling import bucket_fraction_sql
    from dumpty_spark.queries.frontier5 import _CUPED_PIVOT_DAY

    cells = run_duckdb(
        f"""
        WITH ev AS (
          SELECT event_type, value,
                 {bucket_fraction_sql(["user_id"])} < 0.5 AS treated,
                 floor(epoch(ts))::BIGINT // 86400 >= {_CUPED_PIVOT_DAY}
                   AS post
          FROM events
        )
        SELECT event_type, treated, post, AVG(value) AS m
        FROM ev GROUP BY 1, 2, 3
        """,
        sf_smoke,
    )
    out = {
        r["event_type"]: r
        for r in REGISTRY["q_did_lift"].fn(spark, sf_smoke).collect()
    }
    for et, grp in cells.groupby("event_type"):
        g = {
            (bool(r.treated), bool(r.post)): r.m
            for r in grp.itertuples(index=False)
        }
        did = (g[(True, True)] - g[(True, False)]) - (
            g[(False, True)] - g[(False, False)]
        )
        pre_gap = g[(True, False)] - g[(False, False)]
        assert abs(out[et]["did_lift"] - did) < 1e-3
        assert abs(out[et]["pre_gap"] - pre_gap) < 1e-3
