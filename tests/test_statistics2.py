"""Non-circular references for the round-4 statistics batch (E85-E93).

Same discipline as test_statistics.py: the driver's oracle comparison
proves Spark == DuckDB but both sides share the formula, so each query
is re-derived here with an independent pure-Python implementation
(scipy's documented formulas; stdlib math.erf gives the EXACT normal
CDF to check the shared A&S polynomial against).
"""
from __future__ import annotations

import math

import pytest


def _phi_exact(z: float) -> float:
    return 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))


def test_ncdf_polynomial_matches_erf():
    """The shared A&S 7.1.26 polynomial (the p-value contract in
    relational8) must track the exact normal CDF within its documented
    7.5e-8 bound — stdlib erf is the independent referee."""
    from dumpty_spark.queries.relational8 import _B1, _B2, _B3, _B4, _B5

    for z in [x / 10.0 for x in range(-60, 61)]:
        az = abs(z)
        t = 1.0 / (1.0 + 0.2316419 * az)
        poly = t * (_B1 + t * (_B2 + t * (_B3 + t * (_B4 + t * _B5))))
        upper = 1.0 - math.exp(-az * az / 2.0) / math.sqrt(2 * math.pi) * poly
        phi = upper if z >= 0 else 1.0 - upper
        assert abs(phi - _phi_exact(z)) < 7.5e-8, z


def _collect_events(spark, sf_dir):
    from dumpty_spark.sources.parquet import load_table

    return (
        load_table(spark, sf_dir, "events")
        .select("event_type", "ts", "value")
        .collect()
    )


def _split_weekend(rows):
    """Same UTC Monday=0 weekday convention as the queries."""
    first, second = [], []
    for r in rows:
        day = int(r["ts"].timestamp()) // 86400
        (first if (day + 3) % 7 >= 5 else second).append(float(r["value"]))
    return first, second


def test_welch_matches_independent_reference(spark, sf_smoke):
    """t and the Welch-Satterthwaite df per scipy.stats.ttest_ind
    (equal_var=False), p from the exact erf-based normal CDF (the A&S
    polynomial agrees within 7.5e-8, asserted above)."""
    from dumpty_spark.queries.relational8 import q_welch_ttest

    got = {
        r["event_type"]: r for r in q_welch_ttest(spark, sf_smoke).collect()
    }
    by_type: dict[str, list] = {}
    for r in _collect_events(spark, sf_smoke):
        by_type.setdefault(r["event_type"], []).append(r)
    assert got
    for et, rows in by_type.items():
        a, b = _split_weekend(rows)
        n1, n2 = len(a), len(b)
        m1, m2 = sum(a) / n1, sum(b) / n2
        v1 = sum((x - m1) ** 2 for x in a) / (n1 - 1)
        v2 = sum((x - m2) ** 2 for x in b) / (n2 - 1)
        se2 = v1 / n1 + v2 / n2
        t_ref = (m1 - m2) / math.sqrt(se2)
        df_ref = se2**2 / (
            (v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1)
        )
        p_ref = 2.0 * (1.0 - _phi_exact(abs(t_ref)))
        assert got[et]["n_weekend"] == n1 and got[et]["n_weekday"] == n2
        assert abs(got[et]["t_stat"] - t_ref) < 5e-4, et
        assert abs(got[et]["welch_df"] - df_ref) < 5e-2, et
        assert abs(got[et]["p_value"] - p_ref) < 5e-4, et


def test_kendall_matches_independent_reference(spark, sf_smoke):
    """tau-b per scipy.stats.kendalltau: (C-D)/sqrt((n0-n1)(n0-n2))
    by brute-force pair enumeration over the daily grid."""
    from dumpty_spark.queries.relational8 import q_kendall_daily

    row = q_kendall_daily(spark, sf_smoke).collect()[0]
    daily: dict[int, list] = {}
    for r in _collect_events(spark, sf_smoke):
        d = int(r["ts"].timestamp()) // 86400
        daily.setdefault(d, [0, 0])
        if r["event_type"] == "click":
            daily[d][0] += 1
        elif r["event_type"] == "purchase":
            daily[d][1] += 1
    pts = [tuple(v) for _, v in sorted(daily.items())]
    c = d = tx = ty = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            dx = pts[i][0] - pts[j][0]
            dy = pts[i][1] - pts[j][1]
            if dx * dy > 0:
                c += 1
            elif dx * dy < 0:
                d += 1
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
    n0 = len(pts) * (len(pts) - 1) // 2
    tau_ref = (c - d) / math.sqrt((n0 - tx) * (n0 - ty))
    assert row["n_days"] == len(pts)
    assert row["concordant"] == c and row["discordant"] == d
    assert abs(row["tau_b"] - tau_ref) < 5e-4


def test_theilsen_matches_independent_reference(spark, sf_smoke):
    """Median-of-pairwise-slopes with interpolated medians, per
    scipy.stats.theilslopes' definition."""
    from dumpty_spark.queries.relational8 import q_theilsen_slope

    row = q_theilsen_slope(spark, sf_smoke).collect()[0]
    daily: dict[int, float] = {}
    for r in _collect_events(spark, sf_smoke):
        if r["event_type"] == "purchase":
            d = int(r["ts"].timestamp()) // 86400
            daily[d] = daily.get(d, 0.0) + float(r["value"])
    d0 = min(daily)
    pts = sorted((d - d0, y) for d, y in daily.items())

    def interp_median(vals):
        vs = sorted(vals)
        n = len(vs)
        if n % 2:
            return vs[n // 2]
        return (vs[n // 2 - 1] + vs[n // 2]) / 2.0

    slopes = [
        (pts[j][1] - pts[i][1]) / (pts[j][0] - pts[i][0])
        for i in range(len(pts))
        for j in range(i + 1, len(pts))
    ]
    slope_ref = interp_median(slopes)
    icpt_ref = interp_median([y - slope_ref * x for x, y in pts])
    assert row["n_days"] == len(pts)
    assert row["n_pairs"] == len(slopes)
    assert abs(row["sen_slope"] - slope_ref) < 5e-4
    assert abs(row["sen_intercept"] - icpt_ref) < 5e-4


def test_fdr_matches_independent_reference(spark, sf_smoke):
    """BH step-up per statsmodels.stats.multitest.multipletests
    (method='fdr_bh'): reject all p <= p_(k), k = max{i: p_(i) <= i*q/m},
    recomputed from raw z-tests with the exact normal CDF."""
    from dumpty_spark.queries.relational8 import _FDR_Q, q_fdr_weekday

    got = q_fdr_weekday(spark, sf_smoke).collect()
    counts: dict[tuple, int] = {}
    totals: dict[str, int] = {}
    for r in _collect_events(spark, sf_smoke):
        dow = (int(r["ts"].timestamp()) // 86400 + 3) % 7
        counts[(r["event_type"], dow)] = counts.get((r["event_type"], dow), 0) + 1
        totals[r["event_type"]] = totals.get(r["event_type"], 0) + 1
    ps = {}
    for (et, dow), cnt in counts.items():
        n = totals[et]
        share = cnt / n
        z = (share - 1 / 7) / math.sqrt((1 / 7) * (6 / 7) / n)
        ps[(et, dow)] = round(2.0 * (1.0 - _phi_exact(abs(z))), 6)
    m = len(ps)
    ordered = sorted(ps.values())
    thresh = [p for i, p in enumerate(ordered, 1) if p <= i * _FDR_Q / m]
    cutoff = max(thresh) if thresh else -1.0
    ref_reject = {k: p <= cutoff for k, p in ps.items()}
    assert len(got) == m
    for r in got:
        key = (r["event_type"], r["dow"])
        assert abs(r["p_value"] - round(ps[key], 4)) <= 1.5e-4, key
        assert r["rejected"] == ref_reject[key], key
    # the screen must actually discriminate on this fixture
    rejected = sum(1 for r in got if r["rejected"])
    assert 0 < rejected < m, rejected


def test_ks_matches_independent_reference(spark, sf_smoke):
    """Two-sample D per scipy.stats.ks_2samp: sup |F1-F2| over the
    pooled sample, brute force."""
    from dumpty_spark.queries.relational8 import q_ks_twosample

    got = {
        r["event_type"]: r for r in q_ks_twosample(spark, sf_smoke).collect()
    }
    by_type: dict[str, list] = {}
    for r in _collect_events(spark, sf_smoke):
        by_type.setdefault(r["event_type"], []).append(r)
    for et, rows in by_type.items():
        a, b = _split_weekend(rows)
        n1, n2 = len(a), len(b)
        d_ref = max(
            abs(
                sum(1 for x in a if x <= v) / n1
                - sum(1 for x in b if x <= v) / n2
            )
            for v in set(a) | set(b)
        )
        crit_ref = 1.3581 * math.sqrt((n1 + n2) / (n1 * n2))
        assert got[et]["n_weekend"] == n1 and got[et]["n_weekday"] == n2
        assert abs(got[et]["ks_d"] - d_ref) < 5e-4, et
        assert got[et]["reject_95"] == (
            round(d_ref, 4) > round(crit_ref, 4)
        ), et


def test_psi_matches_independent_reference(spark, sf_smoke):
    """PSI with first-half decile bins, interpolated quantiles
    (numpy.quantile 'linear'), 1e-6 clamp — brute force."""
    from dumpty_spark.queries.relational8 import q_psi_value_drift

    got = {
        r["event_type"]: r
        for r in q_psi_value_drift(spark, sf_smoke).collect()
    }
    by_type: dict[str, list] = {}
    for r in _collect_events(spark, sf_smoke):
        by_type.setdefault(r["event_type"], []).append(r)
    for et, rows in by_type.items():
        us = [int(r["ts"].timestamp() * 1_000_000) for r in rows]
        cut = (min(us) + max(us)) // 2
        first = sorted(
            float(r["value"]) for r, t in zip(rows, us) if t <= cut
        )
        second = [float(r["value"]) for r, t in zip(rows, us) if t > cut]

        def quantile(vs, q):
            pos = (len(vs) - 1) * q
            lo = int(math.floor(pos))
            hi = min(lo + 1, len(vs) - 1)
            return vs[lo] + (pos - lo) * (vs[hi] - vs[lo])

        bounds = [round(quantile(first, i / 10.0), 4) for i in range(1, 10)]

        def bin_of(v):
            return 1 + sum(1 for b in bounds if v > b)

        c1 = [0] * 11
        c2 = [0] * 11
        for v in first:
            c1[bin_of(v)] += 1
        for v in second:
            c2[bin_of(v)] += 1
        psi_ref = 0.0
        for k in range(1, 11):
            if c1[k] == 0 and c2[k] == 0:
                continue  # bin absent from the grouped frame entirely
            p1 = max(c1[k] / len(first), 1e-6)
            p2 = max(c2[k] / len(second), 1e-6)
            psi_ref += (p2 - p1) * math.log(p2 / p1)
        assert got[et]["n_first"] == len(first), et
        assert got[et]["n_second"] == len(second), et
        assert abs(got[et]["psi"] - psi_ref) < 5e-4, et


def test_cramers_v_matches_independent_reference(spark, sf_smoke):
    """chi² and V per scipy.stats.contingency.association
    (method='cramer'), brute force over the 5×7 table."""
    from dumpty_spark.queries.relational8 import q_cramers_v

    row = q_cramers_v(spark, sf_smoke).collect()[0]
    counts: dict[tuple, int] = {}
    for r in _collect_events(spark, sf_smoke):
        dow = (int(r["ts"].timestamp()) // 86400 + 3) % 7
        counts[(r["event_type"], dow)] = counts.get((r["event_type"], dow), 0) + 1
    n = sum(counts.values())
    rows_ = sorted({k[0] for k in counts})
    cols = sorted({k[1] for k in counts})
    chi2 = 0.0
    for et in rows_:
        rt = sum(v for (a, _), v in counts.items() if a == et)
        for dow in cols:
            ct = sum(v for (_, b), v in counts.items() if b == dow)
            o = counts.get((et, dow), 0)
            e = rt * ct / n
            chi2 += (o - e) ** 2 / e
    v_ref = math.sqrt(chi2 / (n * (min(len(rows_), len(cols)) - 1)))
    assert row["n"] == n
    assert abs(row["chi2"] - chi2) < 5e-3
    assert abs(row["cramers_v"] - v_ref) < 5e-4
    assert row["df"] == (len(rows_) - 1) * (len(cols) - 1)


def test_pmi_survives_wordless_documents(spark, monkeypatch):
    """Regression: slice(ws, 1, size-1) on an EMPTY words array asks for
    length -1 and throws — wordless docs (empty text, punctuation-only)
    are legal input and must contribute no bigrams, like the oracle."""
    import dumpty_spark.queries.text5 as t5

    fake = spark.createDataFrame(
        [
            (1, "", "en", "src0", 0),
            (2, "!!! ???", "en", "src0", 7),
            (3, "one", "en", "src0", 3),
            (4, " ".join(["alpha beta"] * 30), "en", "src0", 300),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(t5, "load_table", lambda s, d, n: fake)
    rows = t5.q_pmi_collocations(spark, "ignored").collect()
    # the repeated "alpha beta" doc clears the min-count floor
    assert any(r["wa"] == "beta" and r["wb"] == "alpha" for r in rows) or any(
        r["wa"] == "alpha" and r["wb"] == "beta" for r in rows
    )
