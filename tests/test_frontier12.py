"""Unit + plan tests for the round-6 seventh batch (queries/frontier12.py,
E159-E161): hand-derivable fixtures through the real query code plus the
plan assertions the docs claim (one moments scan for the OOF evaluator,
user-partitioned windows for time-decay attribution)."""

from __future__ import annotations

import datetime as dt
import math
import re

import pyspark.sql.functions as F
import pytest

from dumpty_spark.queries import REGISTRY
from tests.test_plans import plan_of


def _fake_loader(frames: dict):
    def load_table(spark, sf_dir, name):
        return frames[name]

    return load_table


def _ev_schema():
    return ["event_id", "ts", "user_id", "event_type", "value", "props"]


# ---------------------------------------------------------------------------
# E159 OOF regression eval
# ---------------------------------------------------------------------------
def test_oof_moment_algebra_matches_row_level(spark, sf_smoke):
    """The moment-expanded fold SSE must equal the row-level
    prediction-error SSE computed the naive way (fit on complement,
    predict fold) — the algebra IS the operator, so prove it against
    the direct computation on real data."""
    import numpy as np

    from dumpty_spark.operators.sampling import bucket_fraction
    from dumpty_spark.sources import load_table

    rows = (
        load_table(spark, sf_smoke, "orders")
        .select(
            F.col("o_totalprice").alias("y"),
            (
                F.floor(
                    F.col("o_orderdate").cast("timestamp").cast("double") / 86400
                ).cast("long")
                - 19700
            )
            .cast("double")
            .alias("x"),
            F.least(F.floor(bucket_fraction(["o_orderkey"]) * 5), F.lit(4))
            .cast("long")
            .alias("fold"),
        )
        .collect()
    )
    xs = np.array([r["x"] for r in rows])
    ys = np.array([r["y"] for r in rows])
    fs = np.array([r["fold"] for r in rows])
    got = {
        r["fold"]: r
        for r in REGISTRY["q_oof_regression_eval"].fn(spark, sf_smoke).collect()
    }
    for f in sorted(set(fs)):
        trn = fs != f
        b, a = np.polyfit(xs[trn], ys[trn], 1)
        pred = a + b * xs[fs == f]
        rmse = math.sqrt(float(np.mean((ys[fs == f] - pred) ** 2)))
        assert got[f]["slope"] == pytest.approx(b, abs=2e-4)
        assert got[f]["intercept"] == pytest.approx(a, rel=1e-5)
        assert got[f]["oof_rmse"] == pytest.approx(rmse, rel=1e-5)


def test_oof_single_scan(spark, sf_smoke):
    """ONE parquet scan feeds the whole 5-fold CV — no prediction pass,
    no second read (explain prints each node twice: tree + details, so
    count the numbered detail headers)."""
    plan = plan_of(REGISTRY["q_oof_regression_eval"].fn(spark, sf_smoke))
    # the moments frame is checkpointed (folds-sized), so the composed
    # plan reads ONLY it — no parquet scan downstream, and the single
    # upstream scan happened inside the checkpoint materialization
    assert "Scan parquet" not in plan
    assert "Scan ExistingRDD" in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# E160 leakage screen
# ---------------------------------------------------------------------------
def test_leakage_screen_flags_planted_leak(spark, sf_smoke):
    rows = REGISTRY["q_leakage_screen"].fn(spark, sf_smoke).collect()
    assert rows[0]["feature"] == "leak_code"
    assert rows[0]["cramers_v"] == pytest.approx(1.0)
    assert rows[0]["max_value_purity"] == pytest.approx(1.0)
    assert rows[0]["leak_flag"] is True
    others = {r["feature"]: r for r in rows[1:]}
    assert set(others) == {"f_priority", "f_custmod", "f_dow"}
    for r in others.values():
        assert r["leak_flag"] is False
        assert r["cramers_v"] < 0.5  # real features carry weak signal


def test_leakage_screen_fixture_v_exact(spark, monkeypatch):
    """2x2 contingency with a hand-computable phi coefficient: feature
    splits 3/1 vs 1/3 over the label -> V = 0.5."""
    import dumpty_spark.queries.frontier12 as f12

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # 4 'F' orders: 3 with priority A, 1 with B; 4 'O': 1 A, 3 B
    specs = [("F", "A")] * 3 + [("F", "B")] + [("O", "A")] + [("O", "B")] * 3
    for i, (st, pr) in enumerate(specs):
        # spread order dates across days so no feature degenerates to a
        # single value (V of a constant column is defined as 0)
        rows.append((i, i, st, 1.0, t0 + dt.timedelta(days=i), pr))
    orders = spark.createDataFrame(
        rows,
        [
            "o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderdate", "o_orderpriority",
        ],
    )
    monkeypatch.setattr(f12, "load_table", _fake_loader({"orders": orders}))
    got = {r["feature"]: r for r in f12.q_leakage_screen(spark, "fixture").collect()}
    # phi = (3*3 - 1*1) / sqrt(4*4*4*4) = 8/16 = 0.5
    assert got["f_priority"]["cramers_v"] == pytest.approx(0.5)
    assert got["leak_code"]["cramers_v"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# E161 time-decay attribution
# ---------------------------------------------------------------------------
def test_timedecay_fixture(spark, monkeypatch):
    """Two touches at 30 and 60 minutes before the purchase: weights
    e^-1 and e^-2, shares hand-computed; a 1-touch user gets 1.0; a
    never-converting user gets nothing."""
    import dumpty_spark.queries.frontier12 as f12

    t0 = dt.datetime(2024, 1, 1)

    def ev(i, u, typ, mins):
        return (i, t0 + dt.timedelta(minutes=mins), u, typ, 0.0, "{}")

    rows = [
        ev(1, 1, "view", 0), ev(2, 1, "click", 30), ev(3, 1, "purchase", 60),
        ev(4, 2, "view", 0), ev(5, 2, "purchase", 10),
        ev(6, 3, "click", 0),  # never converts
    ]
    evdf = spark.createDataFrame(rows, _ev_schema())
    monkeypatch.setattr(f12, "load_table", _fake_loader({"events": evdf}))
    got = {
        r["event_type"]: r
        for r in f12.q_timedecay_attribution(spark, "fixture").collect()
    }
    w_view, w_click = math.exp(-2.0), math.exp(-1.0)
    tot = w_view + w_click
    assert set(got) == {"view", "click"}
    assert got["click"]["total_credit"] == pytest.approx(
        round(w_click / tot, 4)
    )
    assert got["view"]["total_credit"] == pytest.approx(
        round(w_view / tot + 1.0, 4)
    )
    assert got["view"]["n_touches"] == 2 and got["click"]["n_touches"] == 1


def test_timedecay_windows_partitioned(spark, sf_smoke):
    plan = plan_of(REGISTRY["q_timedecay_attribution"].fn(spark, sf_smoke))
    assert "Window" in plan
    assert "hashpartitioning(user_id" in plan
    assert "SinglePartition" not in plan


def test_timedecay_credit_sums_to_conversions(spark, sf_smoke):
    """Normalized credit: total credit across channels equals the number
    of conversions that had at least one touch."""
    from dumpty_spark.sources import load_table

    rows = REGISTRY["q_timedecay_attribution"].fn(spark, sf_smoke).collect()
    total = sum(r["total_credit"] for r in rows)
    assert total == pytest.approx(round(total), abs=0.01)
    assert total > 0