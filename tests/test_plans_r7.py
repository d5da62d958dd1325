"""Round-7 plan/scale assertions (VERDICT r6 next-round tasks 1-3):

1. q_association_rules re-planned onto the E22 map-side pair pattern —
   NO basket self-join on l_orderkey may appear in the executed plan.
2. The warehouse_scratch sweep — ``tempfile`` is banned from every
   query module, so no registered query can root an at-rest store on
   driver-local disk again.
3. q_quantile_normalize's mapping join bounded — the banded interval
   equi-join must compile to a broadcast HASH join, never a
   BroadcastNestedLoopJoin over the full distinct-value frame.
"""

from __future__ import annotations

import pathlib
import re

from tests.test_plans import plan_of

from dumpty_spark.queries import REGISTRY


def test_association_rules_no_basket_self_join(spark, sf_smoke):
    """E155 (VERDICT r6 What's wrong #1): pair generation is map-side
    (collect_set + array-HOF explode); joining the basket table to
    itself on l_orderkey shuffles lineitem twice and explodes skewed
    baskets quadratically inside single tasks. The executed plan must
    contain a Generate (the explode), and no join keyed on
    l_orderkey."""
    plan = plan_of(REGISTRY["q_association_rules"].fn(spark, sf_smoke))
    assert "Generate" in plan, plan[:2000]
    for join_line in re.findall(
        r"(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)[^\n]*", plan
    ):
        assert "l_orderkey" not in join_line, join_line
    # lineitem itself is never re-scanned: the checkpointed basket
    # rollup (Scan ExistingRDD) feeds the pair explode, the item counts
    # and the basket total — no parquet scan remains in this plan
    assert plan.count("Scan parquet") == 0, plan[:2000]
    assert "Scan ExistingRDD" in plan


def test_association_rules_item_counts_broadcast(spark, sf_smoke):
    """The item-count and basket-total frames are vocabulary-sized and
    must ride broadcast joins onto the pair counts."""
    plan = plan_of(REGISTRY["q_association_rules"].fn(spark, sf_smoke))
    assert plan.count("BroadcastHashJoin") >= 2


def test_no_tempfile_in_query_modules():
    """VERDICT r6 What's wrong #2 regression ban: every at-rest store a
    registered query builds must root under spark.sql.warehouse.dir
    (shared storage on a real deployment) via session.warehouse_scratch
    — a driver-local tempdir is only correct in local[n]. Ban the
    module at the import level so the back-catalog can't regress."""
    qdir = pathlib.Path(__file__).resolve().parent.parent / (
        "dumpty_spark/queries"
    )
    offenders = []
    for py in sorted(qdir.glob("*.py")):
        text = py.read_text()
        if re.search(r"^\s*(import tempfile|from tempfile import)", text, re.M):
            offenders.append(py.name)
    assert not offenders, f"tempfile used in query modules: {offenders}"


def test_quantile_normalize_mapping_join_is_hash_join(spark, sf_smoke):
    """E136 (VERDICT r6 What's wrong #3): the source-rank -> global-value
    mapping must be the banded interval equi-join (broadcast HASH join on
    the coarse CDF band with an O(1)-candidate range filter), never a
    BroadcastNestedLoopJoin whose build side is the full distinct-value
    frame (O(D_src x D_global) fanout)."""
    plan = plan_of(REGISTRY["q_quantile_normalize"].fn(spark, sf_smoke))
    assert "BroadcastNestedLoopJoin" not in plan, plan[:3000]
    assert "BroadcastHashJoin" in plan


def test_quantile_normalize_band_join_unique_match(spark, sf_t2):
    """The half-open interval (prev_gfrac, gfrac] partitions rank space:
    every (source, value) row must match EXACTLY one global value —
    multiset equality between the rollup and the joined frame."""
    import pyspark.sql.functions as F

    from dumpty_spark.sources.parquet import load_table

    docs = load_table(spark, sf_t2, "documents")
    n_rollup = docs.select("source", "n_chars").distinct().count()
    out = REGISTRY["q_quantile_normalize"].fn(spark, sf_t2)
    # n_docs sums the per-(source, value) cnt exactly once per row; if a
    # row matched twice the per-source doc counts would inflate
    total = out.agg(F.sum("n_docs")).first()[0]
    assert total == docs.count(), (total, docs.count(), n_rollup)
