"""Unit tests for the round-5 second batch (queries/frontier2.py +
operators/aggview.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


# ---------------------------------------------------------------------------
# E113 aggregate-view store
# ---------------------------------------------------------------------------
def test_agg_view_append_equals_full_recompute(spark, tmp_path):
    """Three batches, any split of history: merged partials == direct agg."""
    from dumpty_spark.operators import aggview as AV

    rows = [("a", 1.0), ("a", 5.0), ("a", -2.0), ("b", 10.0), ("b", 0.5)]
    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)], "id long, g string, v double"
    )
    store = str(tmp_path / "av")
    for bid, mod in (("b0", 0), ("b1", 1), ("b2", 2)):
        AV.agg_view_append(df.filter(F.col("id") % 3 == mod), store, ["g"], "v", bid)
    got = {
        r["g"]: (r["cnt"], r["s"], r["mn"], r["mx"], r["avg"])
        for r in AV.agg_view_read(spark, store, ["g"]).collect()
    }
    assert got["a"] == (3, 4.0, -2.0, 5.0, pytest.approx(4.0 / 3))
    assert got["b"] == (2, 10.5, 0.5, 10.0, pytest.approx(5.25))


def test_agg_view_reingest_idempotent(spark, tmp_path):
    """Re-running a batch overwrites only its own partition."""
    from dumpty_spark.operators import aggview as AV

    df = spark.createDataFrame([(1, "a", 2.0), (2, "a", 4.0)], "id long, g string, v double")
    store = str(tmp_path / "av")
    AV.agg_view_append(df.filter("id = 1"), store, ["g"], "v", "b0")
    AV.agg_view_append(df.filter("id = 2"), store, ["g"], "v", "b1")
    AV.agg_view_append(df.filter("id = 1"), store, ["g"], "v", "b0")  # re-run
    got = AV.agg_view_read(spark, store, ["g"]).collect()[0]
    assert (got["cnt"], got["s"]) == (2, 6.0), "no double counting on re-ingest"
    # batch pruning reads a subset
    only_b0 = AV.agg_view_read(spark, store, ["g"], batches=["b0"]).collect()[0]
    assert (only_b0["cnt"], only_b0["s"]) == (1, 2.0)


def test_agg_view_store_is_partials_sized(spark, tmp_path):
    from dumpty_spark.operators import aggview as AV

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 4).cast("string").alias("g"),
        F.col("id").cast("double").alias("v"),
    )
    store = str(tmp_path / "av")
    AV.agg_view_append(df, store, ["g"], "v", "b0")
    assert spark.read.parquet(store).count() == 4  # groups, not rows


# ---------------------------------------------------------------------------
# E114 Merkle diff
# ---------------------------------------------------------------------------
def test_merkle_diff_locates_exactly_the_changed_keys(spark, sf_smoke):
    from dumpty_spark.queries import REGISTRY
    from dumpty_spark.queries.frontier2 import _DIFF_HI, _DIFF_LO
    from dumpty_spark.sources import load_table

    out = REGISTRY["q_merkle_diff"].fn(spark, sf_smoke).collect()
    orders = load_table(spark, sf_smoke, "orders")
    expect = {
        r["o_orderkey"]
        for r in orders.filter(
            (F.col("o_orderkey") >= _DIFF_LO) & (F.col("o_orderkey") < _DIFF_HI)
        ).collect()
    }
    assert {r["o_orderkey"] for r in out} == expect
    for r in out:
        assert r["new_price"] == pytest.approx(r["old_price"] + 1.0)
        # pruning really happened: flagged <= checked ranges, and the
        # flagged sets are change-sized, not table-sized
        assert r["n_l1_flagged"] <= r["n_l1_total"]
        assert r["n_l2_flagged"] <= r["n_l2_checked"]
        assert r["n_l1_flagged"] <= len(expect)
        assert r["n_l2_flagged"] <= len(expect)


def test_merkle_diff_pruning_plan_scans_subset(spark, sf_t2):
    """Both pruning levels bite on a clustered update: the flagged-l1
    subset is smaller than the table, and the flagged-l2 subset is
    smaller still (the hot range lives in one coarse + one fine range)."""
    from dumpty_spark.queries.frontier2 import _DIFF_HI, _DIFF_LO, _L1_W, _L2_W
    from dumpty_spark.sources import load_table

    orders = load_table(spark, sf_t2, "orders")
    a = orders.select(
        F.col("o_orderkey").alias("k"), F.round("o_totalprice", 2).alias("price")
    )
    changed = a.filter((F.col("k") >= _DIFF_LO) & (F.col("k") < _DIFF_HI))
    changed_l1 = changed.select(F.floor(F.col("k") / _L1_W).alias("l1")).distinct()
    subset1 = a.withColumn("l1", F.floor(F.col("k") / _L1_W)).join(changed_l1, "l1")
    changed_l2 = changed.select(F.floor(F.col("k") / _L2_W).alias("l2")).distinct()
    subset2 = subset1.withColumn("l2", F.floor(F.col("k") / _L2_W)).join(
        changed_l2, "l2"
    )
    n_total, n1, n2 = a.count(), subset1.count(), subset2.count()
    assert 0 < n1 < n_total, "level-1 pruning scans a strict subset"
    assert 0 < n2 < n1, "level-2 pruning narrows further"
    assert n2 <= 2 * _L2_W, "row-level diff is range-sized, not table-sized"


# ---------------------------------------------------------------------------
# E115 split-conformal
# ---------------------------------------------------------------------------
def test_conformal_coverage_near_nominal(spark, sf_t2):
    """Finite-sample conformal guarantee: coverage >= 1 - alpha -
    O(1/n_cal), and not absurdly over-covered on a continuous target."""
    from dumpty_spark.queries import REGISTRY

    rows = REGISTRY["q_conformal_intervals"].fn(spark, sf_t2).collect()
    assert rows, "one row per event series"
    for r in rows:
        slack = 1.0 / (r["n_cal"] + 1) + 3.0 * (0.09 / r["n_test"]) ** 0.5
        assert r["coverage"] >= 0.9 - slack - 0.02, r
        assert r["coverage"] <= 1.0
        assert r["qhat"] > 0


def test_conformal_order_statistic_rank(spark):
    """qhat is exactly the ceil(0.9*(n+1))-th smallest calibration
    residual — checked by hand on a tiny series."""
    import dumpty_spark.queries.frontier2 as FR2
    from dumpty_spark.operators.sampling import bucket_fraction

    # synthesize: 200 rows, one series, value = event_id (so residuals
    # are hand-computable); split comes from the md5 fraction
    df = spark.range(200).select(
        F.lit("s").alias("event_type"),
        F.col("id").alias("event_id"),
        F.col("id").cast("double").alias("value"),
    )
    frac = bucket_fraction(["event_id"])
    parts = {
        r["event_id"]: r["part"]
        for r in df.select(
            "event_id",
            F.when(frac < 0.5, "train").when(frac < 0.75, "cal")
            .otherwise("test").alias("part"),
        ).collect()
    }
    train = [i for i, p in parts.items() if p == "train"]
    cal = [i for i, p in parts.items() if p == "cal"]
    mu = round(sum(train) / len(train), 6)
    residuals = sorted(round(abs(i - mu), 6) for i in cal)
    import math

    k = min(math.ceil(0.9 * (len(cal) + 1)), len(cal))
    expect_q = round(residuals[k - 1], 4)

    import dumpty_spark.queries.frontier2 as _f

    orig = _f.load_table
    _f.load_table = lambda *a: df.select(
        "event_type", "event_id",
        F.col("value"),
    )
    try:
        out = _f.q_conformal_intervals(spark, "unused").collect()
    finally:
        _f.load_table = orig
    assert len(out) == 1
    assert out[0]["qhat"] == pytest.approx(expect_q, abs=1e-4)
    assert out[0]["n_cal"] == len(cal)
