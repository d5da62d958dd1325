"""Mergeable HLL sketch store (operators/sketches.py, EXT E45)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dumpty_spark.operators import sketches as SK
from dumpty_spark.sources import load_table


@pytest.fixture(scope="module")
def events(spark, sf_t2):
    return load_table(spark, sf_t2, "events").localCheckpoint()


def test_union_of_batch_sketches_matches_exact(spark, events, tmp_path):
    """Three disjoint ingest batches; the unioned estimate must land
    within the published HLL error envelope of the exact cross-batch
    distinct count — computed WITHOUT re-reading any batch's raw rows."""
    store = str(tmp_path / "sk")
    batches = {
        "b0": events.filter(F.col("event_id") % 3 == 0),
        "b1": events.filter(F.col("event_id") % 3 == 1),
        "b2": events.filter(F.col("event_id") % 3 == 2),
    }
    for bid, df in batches.items():
        SK.sketch_store_append(df, store, ["event_type"], "user_id", bid)

    est = {
        r["event_type"]: r["approx_distinct"]
        for r in SK.sketch_store_estimate(spark, store, ["event_type"]).collect()
    }
    exact = {
        r["event_type"]: r["d"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert set(est) == set(exact)
    for t in exact:
        rel = abs(est[t] - exact[t]) / exact[t]
        assert rel < 0.05, f"{t}: {est[t]} vs {exact[t]} ({rel:.1%})"

    total = SK.sketch_store_total(spark, store)
    exact_total = events.select("user_id").distinct().count()
    assert abs(total - exact_total) / exact_total < 0.05

    # the store really is sketch-sized: rows = batches x groups
    sk = spark.read.parquet(store)
    n_groups = len(exact)
    assert sk.count() == 3 * n_groups


def test_batch_reingest_is_idempotent(spark, events, tmp_path):
    """Re-running a batch overwrites only its own hive partition —
    estimates unchanged, no double counting."""
    store = str(tmp_path / "sk")
    b0 = events.filter(F.col("event_id") % 2 == 0)
    b1 = events.filter(F.col("event_id") % 2 == 1)
    SK.sketch_store_append(b0, store, ["event_type"], "user_id", "b0")
    SK.sketch_store_append(b1, store, ["event_type"], "user_id", "b1")
    before = sorted(
        map(tuple, SK.sketch_store_estimate(spark, store, ["event_type"]).collect())
    )
    SK.sketch_store_append(b1, store, ["event_type"], "user_id", "b1")  # replay
    after = sorted(
        map(tuple, SK.sketch_store_estimate(spark, store, ["event_type"]).collect())
    )
    assert before == after


def test_batch_pruning_estimates_subset(spark, events, tmp_path):
    store = str(tmp_path / "sk")
    b0 = events.filter(F.col("event_id") % 2 == 0)
    b1 = events.filter(F.col("event_id") % 2 == 1)
    SK.sketch_store_append(b0, store, ["event_type"], "user_id", "b0")
    SK.sketch_store_append(b1, store, ["event_type"], "user_id", "b1")
    sub = SK.sketch_store_total(spark, store, batches=["b0"])
    exact_sub = b0.select("user_id").distinct().count()
    assert abs(sub - exact_sub) / exact_sub < 0.05


# ---------------------------------------------------------------------------
# KMV set-operation estimates (EXT E58)
# ---------------------------------------------------------------------------
def test_kmv_intersection_within_error(spark, events):
    """Two overlapping user_id segments: the KMV intersection estimate
    must land within 15% of the exact overlap at k=512."""
    a = events.filter(F.col("event_type").isin("click", "view"))
    b = events.filter(F.col("event_type").isin("view", "purchase", "error"))
    est = SK.kmv_intersection_estimate(
        SK.kmv_sketch(a, "user_id"), SK.kmv_sketch(b, "user_id")
    ).first()
    exact = (
        a.select("user_id").distinct()
        .join(b.select("user_id").distinct(), "user_id")
        .count()
    )
    assert abs(est["est_intersection"] - exact) / exact < 0.15
    union_exact = (
        a.select("user_id").union(b.select("user_id")).distinct().count()
    )
    assert abs(est["est_union"] - union_exact) / union_exact < 0.15


def test_kmv_small_sets_are_exact(spark):
    """Below k the sketch is the whole key set — estimates are exact."""
    a = spark.createDataFrame([(i,) for i in range(100)], ["k"])
    b = spark.createDataFrame([(i,) for i in range(50, 150)], ["k"])
    est = SK.kmv_intersection_estimate(
        SK.kmv_sketch(a, "k"), SK.kmv_sketch(b, "k")
    ).first()
    assert est["est_union"] == 150.0
    assert est["est_intersection"] == 50.0


def test_kmv_sketch_is_bounded(spark, events):
    sk = SK.kmv_sketch(events, "event_id", k=64)
    assert sk.count() == 64
