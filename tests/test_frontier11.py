"""Unit + plan tests for the round-6 sixth batch (queries/frontier11.py,
E155-E158): hand-derivable fixtures through the real query code, plus
the plan assertions each doc claims."""

from __future__ import annotations

import datetime as dt
import glob
import math
import os

import pyspark.sql.functions as F
import pytest

from dumpty_spark.queries import REGISTRY
from tests.test_plans import plan_of


def _fake_loader(frames: dict):
    def load_table(spark, sf_dir, name):
        return frames[name]

    return load_table


# ---------------------------------------------------------------------------
# E155 association rules
# ---------------------------------------------------------------------------
def test_association_rules_fixture(spark, monkeypatch):
    """5 baskets: {1,2} x3, {1,3}, {2}. Rule 1->2: n_ab=3, support 0.6,
    confidence 3/4, lift (3*5)/(4*4); rule 2->1 confidence 3/4 too but
    different item counts; pairs below minsup=3 are dropped."""
    import dumpty_spark.queries.frontier11 as f11

    rows = (
        [(o, p) for o in (10, 20, 30) for p in (1, 2)]
        + [(40, 1), (40, 3), (50, 2)]
    )
    li = spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])
    monkeypatch.setattr(f11, "load_table", _fake_loader({"lineitem": li}))
    got = {
        (r["ante"], r["cons"]): r
        for r in f11.q_association_rules(spark, "fixture").collect()
    }
    assert set(got) == {(1, 2), (2, 1)}
    r = got[(1, 2)]
    assert r["n_ab"] == 3
    assert r["support"] == pytest.approx(0.6)
    assert r["confidence"] == pytest.approx(0.75)
    assert r["lift"] == pytest.approx(round(3 * 5 / (4 * 4), 6))
    assert got[(2, 1)]["confidence"] == pytest.approx(0.75)


def test_association_rules_plan_broadcasts_items(spark, sf_smoke):
    plan = plan_of(REGISTRY["q_association_rules"].fn(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# E156 Fisher separability
# ---------------------------------------------------------------------------
def test_fisher_fixture(spark, monkeypatch):
    """Two 64-dim labels separated on dim 0 with tiny within-class
    noise: per-label between_sq = (±1)^2 on dim 0, within = var of the
    noise dim — hand-computed on 4 points."""
    import dumpty_spark.queries.frontier11 as f11

    def vec(x0, x1):
        v = [0.0] * 64
        v[0], v[1] = x0, x1
        return v

    pts = [
        (0, vec(1.0, 0.2), 0), (1, vec(1.0, -0.2), 0),
        (2, vec(-1.0, 0.2), 1), (3, vec(-1.0, -0.2), 1),
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, v, l in pts],
        "vec_id long, embedding array<float>, label int",
    )
    monkeypatch.setattr(f11, "load_table", _fake_loader({"embeddings": emb}))
    got = {r["label"]: r for r in f11.q_fisher_separability(spark, "fixture").collect()}
    # global mean dim0 = 0, label means ±1 -> between_sq = 1 per label;
    # within: dim0 var 0, dim1 var = 0.04, rest 0 -> within_var 0.04
    for lbl in (0, 1):
        assert got[lbl]["n"] == 2
        assert got[lbl]["between_sq"] == pytest.approx(1.0)
        assert got[lbl]["within_var"] == pytest.approx(0.04)
        assert got[lbl]["fisher_ratio"] == pytest.approx(25.0)
        assert got[lbl]["fisher_pooled"] == pytest.approx(25.0)


# ---------------------------------------------------------------------------
# E157 Lorenz deciles
# ---------------------------------------------------------------------------
def test_lorenz_fixture(spark, monkeypatch):
    """10 customers with revenue 1..10 (one order each): each decile is
    one customer, shares k/55, cumulative share is the running sum."""
    import dumpty_spark.queries.frontier11 as f11

    t0 = dt.datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [(k, k, "F", float(k), t0, "1-URGENT") for k in range(1, 11)],
        [
            "o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderdate", "o_orderpriority",
        ],
    )
    monkeypatch.setattr(f11, "load_table", _fake_loader({"orders": orders}))
    rows = f11.q_lorenz_deciles(spark, "fixture").collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    assert all(r["n_customers"] == 1 for r in rows)
    tot = 55.0
    cum = 0.0
    for k, r in enumerate(rows, start=1):
        cum += k
        assert r["rev_share"] == pytest.approx(round(k / tot, 6))
        assert r["cum_share"] == pytest.approx(round(cum / tot, 6))
    assert rows[-1]["cum_share"] == pytest.approx(1.0)


def test_lorenz_ranks_via_pid_slices(spark, sf_smoke):
    """The customer ranking must ride the E9 per-slice windows (__pid in
    the plan), never a global ntile sort — the q_weighted_median
    single-task failure class (the only unpartitioned window left is
    the 10-row decile cumulative)."""
    plan = plan_of(REGISTRY["q_lorenz_deciles"].fn(spark, sf_smoke))
    assert "__pid" in plan


def test_lorenz_is_monotone_on_real_data(spark, sf_smoke):
    rows = REGISTRY["q_lorenz_deciles"].fn(spark, sf_smoke).collect()
    shares = [r["rev_share"] for r in rows]
    cums = [r["cum_share"] for r in rows]
    assert shares == sorted(shares)  # deciles ordered by revenue
    assert cums == sorted(cums) and cums[-1] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# E158 ORC round trip
# ---------------------------------------------------------------------------
def test_orc_roundtrip_matches_parquet_aggregate(spark, sf_smoke):
    """The ORC-read aggregate must equal the identical aggregate off the
    parquet source — value-exact round trip."""
    from dumpty_spark.sources import load_table

    got = {
        r["o_orderpriority"]: r
        for r in REGISTRY["q_orc_roundtrip"].fn(spark, sf_smoke).collect()
    }
    want = {
        r["o_orderpriority"]: r
        for r in load_table(spark, sf_smoke, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.min(F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")).alias(
                "first_date"
            ),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert (got[k]["n"], got[k]["total"], got[k]["first_date"]) == (
            want[k]["n"], want[k]["total"], want[k]["first_date"],
        )


def test_orc_scratch_cleaned(spark, sf_smoke):
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for scheme in ("file://", "file:"):
        if wh.startswith(scheme):
            wh = wh[len(scheme):]
            break
    REGISTRY["q_orc_roundtrip"].fn(spark, sf_smoke).collect()
    assert glob.glob(os.path.join(wh, "_orc_*")) == []
