"""Deterministic epoch shuffle (queries/relational6.py, EXT E70)."""

from __future__ import annotations

from dumpty_spark.queries import REGISTRY


def _run(spark, sf_dir):
    return {
        r["shard"]: (r["n_docs"], r["docid_checksum"])
        for r in REGISTRY["q_epoch_shuffle"].fn(spark, sf_dir).collect()
    }


def test_shards_exactly_balanced(spark, sf_t2):
    """Round-robin dealing makes shard sizes equal to within one doc —
    the property hash-sharding cannot give (the oracle would hash-match
    an unbalanced-but-agreed split, so pin balance here)."""
    out = _run(spark, sf_t2)
    sizes = [n for n, _ in out.values()]
    assert len(out) == 8
    assert max(sizes) - min(sizes) <= 1


def test_shuffle_is_deterministic(spark, sf_t2):
    """Same seed -> identical permutation (identical per-shard doc-id
    checksums) on a re-run from scratch."""
    assert _run(spark, sf_t2) == _run(spark, sf_t2)


def test_shards_partition_the_corpus(spark, sf_t2):
    from dumpty_spark.sources import load_table

    docs = load_table(spark, sf_t2, "documents")
    out = _run(spark, sf_t2)
    assert sum(n for n, _ in out.values()) == docs.count()
    assert sum(c for _, c in out.values()) == (
        docs.agg({"doc_id": "sum"}).first()[0]
    )
