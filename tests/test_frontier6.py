"""Unit tests for the round-6 store-promotion batch (E129-E131) plus the
re-planned E118 weighted median — crafted inputs with hand-computable
answers, exercising the semantics the sf0.01 oracle run can't isolate
(re-add after delete, cross-batch suppression order, bucket-boundary
crossing)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F


def test_weighted_median_crosses_at_bucket_boundary(spark):
    """Weights 1,1,1,1 over prices 10,20,30,40: total 4, half 2 — the
    crossing row is price 20 (cumw 2 >= 2). The bucket re-plan must hit
    exactly the same row the naive cumulative window would."""
    from dumpty_spark.queries import REGISTRY
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        rows = [
            ("A", 10.0, 1.0, i, 1) for i in [1]
        ] + [
            ("A", 20.0, 1.0, 2, 1),
            ("A", 30.0, 1.0, 3, 1),
            ("A", 40.0, 1.0, 4, 1),
            ("B", 5.0, 3.0, 5, 1),
            ("B", 7.0, 1.0, 6, 1),
        ]
        df = spark.createDataFrame(
            rows,
            "l_returnflag string, l_extendedprice double, l_quantity double,"
            " l_orderkey long, l_linenumber int",
        )
        df.write.parquet(f"{tmp}/lineitem.parquet")
        out = {
            r["flag"]: r
            for r in REGISTRY["q_weighted_median"].fn(spark, tmp).collect()
        }
        assert out["A"]["weighted_median"] == 20.0
        assert out["A"]["total_weight"] == 4.0
        # B: total 4, half 2 — first row (price 5, cumw 3) already crosses
        assert out["B"]["weighted_median"] == 5.0


def test_zorder_probe_aggregates_match_source(spark, sf_smoke):
    """E129's slice aggregates must equal the same aggregates computed
    directly on the raw table (round-trip preservation)."""
    from dumpty_spark.queries import REGISTRY
    from dumpty_spark.sources.parquet import load_table

    li = load_table(spark, sf_smoke, "lineitem").filter(
        F.col("l_orderkey") % 4 == 0  # the query's deterministic slice
    )
    cut = li.agg((F.max("l_partkey") / 16).cast("long")).first()[0]
    want = li.filter(F.col("l_partkey") <= cut).agg(
        F.count("*"), F.round(F.sum("l_quantity"), 2)
    ).first()
    got = {
        r["probe"]: r
        for r in REGISTRY["q_zorder_skipping"].fn(spark, sf_smoke).collect()
    }["pk_range"]
    assert (got["n_rows"], got["sum_qty"]) == (want[0], want[1])


def test_incremental_dedup_store_suppresses_across_batches(spark):
    """Three batches with engineered collisions: the duplicate text in
    batch 1 must be suppressed by batch 0's store entry; the in-batch
    duplicate in batch 2 must collapse to the smallest id."""
    import tempfile

    from dumpty_spark.operators.dedup import incremental_dedup

    with tempfile.TemporaryDirectory() as tmp:
        store = f"{tmp}/store"
        b0 = spark.createDataFrame(
            [(1, "alpha beta"), (2, "gamma")], "doc_id long, text string"
        )
        b1 = spark.createDataFrame(
            [(3, "Alpha,  BETA!"), (4, "delta")], "doc_id long, text string"
        )  # 3 normalizes to batch-0's "alpha beta" -> suppressed
        b2 = spark.createDataFrame(
            [(5, "epsilon"), (6, "epsilon"), (7, "gamma")],
            "doc_id long, text string",
        )  # 5 beats 6 in-batch; 7 suppressed by history
        s0 = sorted(r["doc_id"] for r in incremental_dedup(spark, b0, store).collect())
        s1 = sorted(r["doc_id"] for r in incremental_dedup(spark, b1, store).collect())
        s2 = sorted(r["doc_id"] for r in incremental_dedup(spark, b2, store).collect())
        assert s0 == [1, 2]
        assert s1 == [4]
        assert s2 == [5]


def test_delete_upsert_audit_readds_deleted_key(spark):
    """A key that is deleted then present in the update batch must be
    re-added as an INSERT (it no longer exists to update) — the E131
    mutation has two such overlap keys (0 and 9797) at sf0.01; here the
    semantics are pinned on a 4-row store."""
    import tempfile

    from dumpty_spark.sinks.writers import delete_keys, upsert_keys, write_range_clustered

    with tempfile.TemporaryDirectory() as tmp:
        store = f"{tmp}/store"
        base = spark.createDataFrame(
            [(1, "A", 10.0), (2, "B", 20.0), (3, "C", 30.0), (4, "D", 40.0)],
            "k long, status string, price double",
        )
        write_range_clustered(base, store, ["k"], num_files=2)
        d = delete_keys(spark, store, "k", [2, 3])
        assert d["rows_deleted"] == 2
        updates = spark.createDataFrame(
            [(3, "C", 33.0), (4, "D", 44.0), (9, "Z", 90.0)],
            "k long, status string, price double",
        )
        u = upsert_keys(spark, store, "k", updates)
        assert u["rows_updated"] == 1  # only k=4 still present
        assert u["rows_inserted"] == 2  # k=3 re-added, k=9 new
        final = {
            r["k"]: (r["status"], r["price"])
            for r in spark.read.parquet(store).collect()
        }
        assert final == {
            1: ("A", 10.0),
            3: ("C", 33.0),
            4: ("D", 44.0),
            9: ("Z", 90.0),
        }


def test_warehouse_scratch_cleanup(spark, sf_smoke):
    """The E129-E131 queries must leave no scratch directories behind
    under the warehouse dir."""
    from dumpty_spark.queries import REGISTRY
    from dumpty_spark.queries.frontier6 import warehouse_scratch

    wh = os.path.dirname(warehouse_scratch(spark, "probe"))
    before = set(glob.glob(os.path.join(wh, "_*_scratch_*")))
    REGISTRY["q_delete_upsert_audit"].fn(spark, sf_smoke).collect()
    after = set(glob.glob(os.path.join(wh, "_*_scratch_*")))
    assert after <= before
