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
