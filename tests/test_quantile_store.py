"""Mergeable quantile-sketch store (operators/quantiles.py, EXT E51)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dumpty_spark.operators import quantiles as Q
from dumpty_spark.sources import load_table


@pytest.fixture(scope="module")
def events(spark, sf_t2):
    return load_table(spark, sf_t2, "events").localCheckpoint()


def test_merged_estimate_within_rank_bound(spark, events, tmp_path):
    """Three disjoint batches with a small k (forces real sampling even
    on the test fixture); cross-batch p25/p50/p90 from sketch rows only
    must land within the rank-error envelope of the exact quantiles."""
    store = str(tmp_path / "q")
    k = 256  # sigma = sqrt(q(1-q)/k) <= 3.1% rank error; bound at 4 sigma
    for i in range(3):
        Q.quantile_store_append(
            events.filter(F.col("event_id") % 3 == i),
            store,
            ["event_type"],
            "value",
            "event_id",
            f"b{i}",
            k=k,
        )
    est = Q.quantile_store_estimate(
        spark, store, ["event_type"], [0.25, 0.5, 0.9], k=k
    )
    # rank of each estimate within the true distribution
    joined = (
        events.join(F.broadcast(est), "event_type")
        .groupBy("event_type", "q")
        .agg(
            (
                F.sum((F.col("value") <= F.col("est")).cast("int")) / F.count("*")
            ).alias("frac")
        )
        .collect()
    )
    assert len(joined) == 5 * 3
    for r in joined:
        assert abs(r["frac"] - r["q"]) <= 0.125, (
            f"{r['event_type']} q={r['q']}: rank {r['frac']:.3f}"
        )


def test_merge_equals_direct_bottom_k(spark, events, tmp_path):
    """The coordinated-sample property, exactly: estimating from two
    batch sketches must give the SAME numbers as sketching the full
    table in one shot — the merge is lossless by construction."""
    store_a = str(tmp_path / "split")
    store_b = str(tmp_path / "whole")
    k = 512
    for parity in (0, 1):
        Q.quantile_store_append(
            events.filter(F.col("event_id") % 2 == parity),
            store_a,
            ["event_type"],
            "value",
            "event_id",
            f"b{parity}",
            k=k,
        )
    Q.quantile_store_append(
        events, store_b, ["event_type"], "value", "event_id", "all", k=k
    )
    split = sorted(
        map(
            tuple,
            Q.quantile_store_estimate(
                spark, store_a, ["event_type"], [0.5, 0.9], k=k
            ).collect(),
        )
    )
    whole = sorted(
        map(
            tuple,
            Q.quantile_store_estimate(
                spark, store_b, ["event_type"], [0.5, 0.9], k=k
            ).collect(),
        )
    )
    assert split == whole


def test_reingest_is_idempotent_and_store_is_sketch_sized(
    spark, events, tmp_path
):
    store = str(tmp_path / "q")
    k = 128
    b0 = events.filter(F.col("event_id") % 2 == 0)
    b1 = events.filter(F.col("event_id") % 2 == 1)
    Q.quantile_store_append(b0, store, ["event_type"], "value", "event_id", "b0", k=k)
    Q.quantile_store_append(b1, store, ["event_type"], "value", "event_id", "b1", k=k)
    before = sorted(
        map(
            tuple,
            Q.quantile_store_estimate(spark, store, ["event_type"], [0.5], k=k).collect(),
        )
    )
    Q.quantile_store_append(b1, store, ["event_type"], "value", "event_id", "b1", k=k)
    after = sorted(
        map(
            tuple,
            Q.quantile_store_estimate(spark, store, ["event_type"], [0.5], k=k).collect(),
        )
    )
    assert before == after

    sk = spark.read.parquet(store)
    n_groups = events.select("event_type").distinct().count()
    assert sk.count() == 2 * n_groups
    # every sketch is bounded at k entries
    assert sk.select(F.max(F.size("sketch"))).first()[0] <= k


def test_batch_pruning(spark, events, tmp_path):
    """Partition filters prune the estimate to a batch subset; with k
    covering the whole batch the estimate is the batch's exact median."""
    store = str(tmp_path / "q")
    b0 = events.filter(F.col("event_id") % 2 == 0)
    b1 = events.filter(F.col("event_id") % 2 == 1)
    Q.quantile_store_append(b0, store, ["event_type"], "value", "event_id", "b0")
    Q.quantile_store_append(b1, store, ["event_type"], "value", "event_id", "b1")
    est = {
        r["event_type"]: r["est"]
        for r in Q.quantile_store_estimate(
            spark, store, ["event_type"], [0.5], batches=["b0"]
        ).collect()
    }
    exact = {
        r["event_type"]: r["m"]
        for r in b0.groupBy("event_type")
        .agg(F.percentile("value", F.lit(0.5)).alias("m"))
        .collect()
    }
    for t, m in exact.items():
        assert est[t] == pytest.approx(m)
