"""Physical-plan assertions for the round-6 changes: the re-planned
weighted median (E118 — no cumulative window partitioned on the 3-value
flag over lineitem) and the store-promotion queries' analytic halves.
Same discipline as test_plans.py / test_plans_r4.py."""

from __future__ import annotations

import re

from tests.test_plans import plan_of

from dumpty_spark.queries import REGISTRY


def test_weighted_median_window_is_bucket_partitioned(spark, sf_smoke):
    """E118 (VERDICT r5 What's wrong #3): the lineitem-sized cumulative
    window must partition on (flag, __b) — a window partitioned on the
    3-value flag alone lands 1/3 of the table in ONE task. The
    metadata-sized offset windows over the (flags x buckets) partials may
    still partition on flag; the load-bearing assertions are that the
    bucket-partitioned shuffle exists, no SinglePartition exchange
    appears anywhere, and the finish is a min-of-struct partial agg, not
    another window."""
    plan = plan_of(REGISTRY["q_weighted_median"].fn(spark, sf_smoke))
    assert re.search(r"hashpartitioning\(flag#\d+, __b#", plan), plan[:2000]
    assert "SinglePartition" not in plan
    assert "partial_min" in plan


def test_weighted_median_no_flag_only_window_over_scan(spark, sf_smoke):
    """The only windows partitioned on flag alone must sit above an
    aggregate (the bucket partials), never directly above the parquet
    scan: every flag-only exchange must be fed by a HashAggregate in the
    formatted plan's numbered operator chain."""
    df = REGISTRY["q_weighted_median"].fn(spark, sf_smoke)
    tree = df._jdf.queryExecution().executedPlan().toString()
    # simpleString tree: for each Window node, its subtree must contain
    # an aggregate before the scan if its partition spec is flag-only
    for m in re.finditer(r"Window \[[^\]]*\], \[(flag#\d+)\]", tree):
        below = tree[m.end():]
        agg = below.find("HashAggregate")
        scan = below.find("Scan parquet")
        assert agg != -1 and (scan == -1 or agg < scan), (
            "flag-only window directly over the scan:\n" + tree
        )


def test_incremental_dedup_store_query_no_python_rows(spark, sf_smoke):
    """E130's per-batch survivor aggregation stays JVM-side (the global
    BatchEvalPython ban covers the registry, but assert locally too) and
    the n_in frame rides a broadcast join."""
    plan = plan_of(REGISTRY["q_incremental_dedup_store"].fn(spark, sf_smoke))
    assert "BatchEvalPython" not in plan


def test_zorder_skipping_prunes_both_dimensions(spark, sf_smoke):
    """E129's hashed pruning booleans must come out TRUE: each 1/16
    range probe touches a strict subset of the 16 z-ordered files, on
    BOTH clustered dimensions."""
    rows = (
        REGISTRY["q_zorder_skipping"].fn(spark, sf_smoke).collect()
    )
    by = {r["probe"]: r for r in rows}
    assert by["pk_range"]["files_pruned"] and by["sk_range"]["files_pruned"]
    assert by["all"]["files_pruned"]  # every written file non-empty
    assert by["all"]["n_rows"] > by["pk_range"]["n_rows"] > 0


def test_lcc_degree_joins_broadcast_no_cartesian(spark, sf_smoke):
    """E132: the node-sized triangle-count frame must broadcast onto the
    degree frame (the degree-orientation broadcasts live behind the
    oriented-edge checkpoint), the wedge/closure joins stay key-equi
    (never cartesian), and no single-partition stage appears."""
    plan = plan_of(REGISTRY["q_clustering_coefficient"].fn(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan


def test_ips_propensities_broadcast(spark, sf_smoke):
    """E133: the 5-row propensity frame must ride a broadcast join onto
    the events scan."""
    plan = plan_of(REGISTRY["q_ips_offpolicy"].fn(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan


def test_did_cells_broadcast(spark, sf_smoke):
    """E134: the four per-(arm, period) cell frames are series-sized and
    must combine via broadcast joins — never a shuffle of events for a
    5-row frame."""
    plan = plan_of(REGISTRY["q_did_lift"].fn(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_mde_single_scan(spark, sf_smoke):
    """E135 is two stacked grouped aggregations over ONE events scan."""
    import re

    plan = plan_of(REGISTRY["q_mde_power"].fn(spark, sf_smoke))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_qnorm_mapping_join_broadcast(spark, sf_smoke):
    """E136 (re-planned r7 per VERDICT r6 What's wrong #3): the CDF
    mapping is now a banded interval EQUI-join — broadcast HASH join on
    the coarse band, never the BroadcastNestedLoopJoin this test pinned
    in r6 (whose build side materialized every covering global value per
    source row). The documents scan still only feeds rollups."""
    plan = plan_of(REGISTRY["q_quantile_normalize"].fn(spark, sf_smoke))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
