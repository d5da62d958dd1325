"""Round-8 ADVICE.md guard fixes: hierarchy depth overflow raises,
Misra-Gries empty-store/empty-batch edges, Hadoop-FS scratch cleanup."""

import pytest

from dumpty_spark.queries import REGISTRY  # noqa: F401  (fixture parity)


def test_ancestor_closure_depth_exceeded_raises(spark):
    """A chain deeper than max_depth must raise, never return a silently
    truncated closure (ADVICE r7: downstream rollups would be quietly
    wrong)."""
    from dumpty_spark.operators.hierarchy import ancestor_closure

    edges = spark.createDataFrame(
        [(i, i - 1) for i in range(1, 10)], ["node", "parent"]
    )
    with pytest.raises(ValueError, match="exceeds max_depth"):
        ancestor_closure(edges, max_depth=4)
    # exactly at the bound still closes completely
    n = ancestor_closure(edges, max_depth=9).count()
    assert n == 9 * 10 // 2


def test_ancestor_closure_exact_power_of_two_depth(spark):
    """Depth == max_depth == 2^k: the final round grows AND completes —
    the post-loop probe must verify the fixpoint instead of raising."""
    from dumpty_spark.operators.hierarchy import ancestor_closure

    edges = spark.createDataFrame(
        [(i, i - 1) for i in range(1, 9)], ["node", "parent"]
    )
    assert ancestor_closure(edges, max_depth=8).count() == 8 * 9 // 2


def test_mg_empty_batch_and_empty_store(spark, tmp_path):
    from dumpty_spark.operators.mg import (
        mg_batch,
        mg_store_append,
        mg_store_estimate,
    )

    empty = spark.createDataFrame([], "k string")
    assert mg_batch(empty, "k", 2, "b0").count() == 0

    # a store that only ever saw empty batches has no on-disk footprint:
    # the read path must surface a clear ValueError, not Spark's opaque
    # schema-inference failure
    store = str(tmp_path / "mg_empty")
    mg_store_append(empty, store, "k", 2, "b0")
    with pytest.raises(ValueError, match="empty or missing"):
        mg_store_estimate(spark, store)

    # a real batch after the empty one recovers the store
    df = spark.createDataFrame([("a",)] * 5 + [("b",)], ["k"])
    mg_store_append(df, store, "k", 2, "b1")
    got = {r["key"]: (r["est"], r["n_total"])
           for r in mg_store_estimate(spark, store).collect()}
    assert got["a"][1] == 6  # mass counts the whole batch


def test_scratch_cleanup_hadoop_fs(spark):
    """scratch_cleanup deletes via the Hadoop FileSystem API (URI-
    portable contract) and no-ops on missing paths."""
    import os

    from dumpty_spark.session import scratch_cleanup, warehouse_scratch

    path = warehouse_scratch(spark, "cleanuptest")
    spark.range(10).write.parquet(path)
    assert os.path.isdir(path)
    scratch_cleanup(spark, path)
    assert not os.path.exists(path)
    scratch_cleanup(spark, path)  # second call: silent no-op
