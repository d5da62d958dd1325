"""Physical-plan assertions for the round-4 query batches: the
scale-critical shapes (broadcasts of metadata-sized frames, TakeOrdered
for top-K cuts, partitioned windows, no corpus-sized single-partition
stages) must be visible in the plans, same discipline as
test_plans.py."""

from __future__ import annotations

from tests.test_plans import plan_of

from dumpty_spark.queries import REGISTRY


def test_zipf_topk_is_take_ordered(spark, sf_smoke):
    """E94's top-1000 cut must compile to TakeOrderedAndProject
    (per-partition heaps + merge), never a global Sort + Limit."""
    plan = plan_of(REGISTRY["q_zipf_fit"].fn(spark, sf_smoke))
    assert "TakeOrderedAndProject" in plan


def test_silhouette_broadcasts_centroids(spark, sf_smoke):
    """E90: the labels-sized centroid frame must broadcast against the
    corpus scan — a shuffle join here would shuffle the corpus for a
    10-row frame."""
    plan = plan_of(REGISTRY["q_silhouette_labels"].fn(spark, sf_smoke))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_psi_broadcasts_bounds(spark, sf_smoke):
    """E92: the per-series decile-boundary frame is series-sized and
    must ride a broadcast join back over the events scan."""
    plan = plan_of(REGISTRY["q_psi_value_drift"].fn(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan


def test_adaptive_quality_broadcasts_thresholds(spark, sf_smoke):
    """E84: the per-source quantile-threshold frame must broadcast."""
    plan = plan_of(REGISTRY["q_adaptive_quality_cut"].fn(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan


def test_seasonal_broadcasts_baseline(spark, sf_smoke):
    """E98: the 24-rows-per-series seasonal frame must broadcast."""
    plan = plan_of(REGISTRY["q_seasonal_residuals"].fn(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan


def test_rolling_median_window_is_partitioned(spark, sf_smoke):
    """E97: the trailing-median window must be partitioned by series.
    An unpartitioned window exchanges to ONE partition — so the load-
    bearing assertions are: the shuffle feeding the window hashes on
    event_type, and no SinglePartition exchange exists anywhere (the
    precise physical signature of the global-window failure mode)."""
    plan = plan_of(REGISTRY["q_rolling_median"].fn(spark, sf_smoke))
    assert "Window" in plan
    assert "hashpartitioning(event_type" in plan
    assert "SinglePartition" not in plan


def test_welch_single_scan_partial_agg(spark, sf_smoke):
    """E85 reduces to ONE events scan feeding a partial-aggregated
    HashAggregate — no join, no window, no second scan. (explain
    "formatted" prints each node twice — once in the tree, once in the
    detail section — so count the numbered detail headers.)"""
    import re

    plan = plan_of(REGISTRY["q_welch_ttest"].fn(spark, sf_smoke))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "partial_var_samp" in plan  # map-side combine of the moments


def test_kendall_pair_join_is_broadcast(spark, sf_smoke):
    """E86: the daily-grid self-join is calendar-bounded and must be a
    broadcast nested loop (non-equi a.d < b.d), never a shuffle of the
    events table."""
    plan = plan_of(REGISTRY["q_kendall_daily"].fn(spark, sf_smoke))
    assert "BroadcastNestedLoopJoin" in plan


def test_heaps_no_unpartitioned_corpus_window(spark, sf_smoke):
    """E96 exists because ROW_NUMBER() OVER (ORDER BY ...) with no
    partition is a single-task sort at corpus scale; the composed plan
    must window only on __pid slices (the E9 operator's contract)."""
    plan = plan_of(REGISTRY["q_heaps_fit"].fn(spark, sf_smoke))
    assert "__pid" in plan
