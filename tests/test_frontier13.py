"""Round-7 batch (E162-E163): the two store promotions' value contracts
at smoke scale — the sf0.01 hash match is the driver's job; here we pin
the invariants that must hold at ANY scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from dumpty_spark.queries import REGISTRY


def test_neardedup_store_survivor_counts(spark, sf_smoke):
    rows = (
        REGISTRY["q_incremental_neardedup_store"].fn(spark, sf_smoke).collect()
    )
    assert [r["batch"] for r in rows] == [0, 1, 2]
    for r in rows:
        assert 0 < r["n_survivors"] <= r["n_in"]
        # even-id half-slice, batch = (id % 6) / 2
        assert r["min_id"] % 6 == 2 * r["batch"]
        assert r["max_id"] % 6 == 2 * r["batch"]


def test_neardedup_store_later_batches_see_history(spark, sf_smoke):
    """The store must suppress cross-batch near-dups: total survivors
    across the three batches is strictly below n_docs whenever the
    corpus has near-dup pairs straddling a batch boundary (the sf0.001
    fixture plants them), and equals the one-shot LSH dedup's keep-first
    count over the same (batch, id) priority order."""
    from dumpty_spark.sources.parquet import load_table

    rows = (
        REGISTRY["q_incremental_neardedup_store"].fn(spark, sf_smoke).collect()
    )
    n_docs = (
        load_table(spark, sf_smoke, "documents")
        .filter(F.col("doc_id") % 2 == 0)
        .count()
    )
    assert sum(r["n_in"] for r in rows) == n_docs
    assert sum(r["n_survivors"] for r in rows) < n_docs


def test_compaction_audit_counts_and_fingerprint(spark, sf_smoke):
    from dumpty_spark.sources.parquet import load_table

    row = REGISTRY["q_compaction_audit"].fn(spark, sf_smoke).first()
    assert row["n_files_before"] == 64
    assert row["n_files_after"] == 3
    expected_rows = (
        load_table(spark, sf_smoke, "orders")
        .filter(F.col("o_orderkey") % 4 == 1)
        .count()
    )
    assert row["n_rows"] == expected_rows
