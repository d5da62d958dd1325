"""Physical-plan assertions for the round-5 batches: broadcasts where
frames are metadata-sized, partitioned windows, shared-artifact caches
actually reused — same discipline as test_plans.py / test_plans_r4.py."""

from __future__ import annotations

from tests.test_plans import plan_of

from dumpty_spark.queries import REGISTRY


def test_target_encoding_broadcasts_totals(spark, sf_smoke):
    """E109: the category / fold / grand totals are metadata-sized and
    must broadcast back onto the (cat, fold) partials."""
    plan = plan_of(REGISTRY["q_target_encoding"].fn(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row grand total


def test_pareto_windows_are_bucket_partitioned(spark, sf_smoke):
    """E110: the in-bucket prefix window must partition by bucket; the
    only permissible single-partition window is the B-row bucket-maxima
    frame (metadata-sized by construction)."""
    plan = plan_of(REGISTRY["q_pareto_frontier"].fn(spark, sf_smoke))
    assert "hashpartitioning(bucket" in plan


def test_sliding_distinct_state_is_calendar_sized(spark, sf_smoke):
    """E111: the heavy shuffle is the (user, hour) dedup; the prefix-sum
    window runs over the hour grid. Assert the dedup aggregate exists
    and the grid join is a broadcast (dsum is delta-sized)."""
    plan = plan_of(REGISTRY["q_sliding_distinct"].fn(spark, sf_smoke))
    assert "hashpartitioning(user_id" in plan or "hashpartitioning(hour_id" in plan


def test_changepoint_window_partitioned_and_stats_broadcast(spark, sf_smoke):
    """E112: the CUSUM window partitions by series; the stats frame
    broadcasts."""
    plan = plan_of(REGISTRY["q_changepoint"].fn(spark, sf_smoke))
    assert "hashpartitioning(event_type" in plan
    assert "BroadcastHashJoin" in plan


def test_merkle_flagged_ranges_broadcast(spark, sf_smoke):
    """E114: flagged l1/l2 range lists are change-sized and must ride
    broadcast joins into the row scans."""
    plan = plan_of(REGISTRY["q_merkle_diff"].fn(spark, sf_smoke))
    assert plan.count("BroadcastHashJoin") >= 2


def test_conformal_mu_and_qhat_broadcast(spark, sf_smoke):
    """E115: per-series mean and quantile frames broadcast onto the
    test-split scan."""
    plan = plan_of(REGISTRY["q_conformal_intervals"].fn(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan


def test_efg_no_event_pair_explosion(spark, sf_smoke):
    """E122: the self-join must be on the (user, type) SPAN rollup, so
    the plan aggregates before any join."""
    plan = plan_of(REGISTRY["q_eventually_follows"].fn(spark, sf_smoke))
    # the span rollup (partial + final agg on user_id, event_type)
    # appears below the join in the plan text
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan


def test_interp_asof_single_window_pass(spark, sf_smoke):
    """E124: the union-merge shape — per-user window, no self-join of
    the events table."""
    plan = plan_of(REGISTRY["q_interp_asof_join"].fn(spark, sf_smoke))
    assert "hashpartitioning(user_id" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_shared_pair_graph_cache_is_reused(spark, sf_smoke):
    """The co-purchase pair cache returns the same checkpointed frame
    for repeated calls in one session, and the consumers' plans read a
    scan-of-existing-RDD instead of rebuilding baskets."""
    import dumpty_spark.queries.shared_graph as SG

    a = SG.copurchase_pairs(spark, sf_smoke)
    b = SG.copurchase_pairs(spark, sf_smoke)
    assert a is b
    # the basket collect_set build is gone from every consumer's plan —
    # it ran once inside the cache build (pagerank's driver regime
    # collapses the rest to a LocalTableScan at this SF, so assert on a
    # distributed consumer too: the k-core peel)
    plan_pr = plan_of(REGISTRY["q_pagerank_parts"].fn(spark, sf_smoke))
    assert "collect_set" not in plan_pr
    # k-core joined the two-regime family in r6 (driver regime at smoke
    # SF collapses it to a local scan too), so the checkpoint-consumer
    # assert moved to Adamic-Adar — an always-distributed consumer
    plan_kc = plan_of(REGISTRY["q_kcore_parts"].fn(spark, sf_smoke))
    assert "collect_set" not in plan_kc
    plan_aa = plan_of(REGISTRY["q_adamic_adar"].fn(spark, sf_smoke))
    assert "collect_set" not in plan_aa
    assert "Scan ExistingRDD" in plan_aa


def test_shared_ann_artifacts_cache_is_reused(spark, sf_smoke):
    import dumpty_spark.queries.vector as V

    cn1, cents1 = V._shared_ann_artifacts(spark, sf_smoke, nlist=16)
    cn2, cents2 = V._shared_ann_artifacts(spark, sf_smoke, nlist=16)
    assert cn1 is cn2 and cents1 is cents2
    assert len(cents1) == 16
