"""t2 correctness: every registered query with an oracle hash-matches DuckDB
on the same parquet at sf0.01 — the local mirror of the driver's gate."""

from __future__ import annotations

import pytest

from dumpty_spark.queries import REGISTRY
from tests.oracle import compare, run_duckdb

ORACLE_QUERIES = sorted(k for k, v in REGISTRY.items() if v.oracle is not None)
ROWS_ONLY_QUERIES = sorted(k for k, v in REGISTRY.items() if v.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_t2, name):
    spec = REGISTRY[name]
    spark_df = spec.fn(spark, sf_t2)
    oracle_pd = run_duckdb(spec.oracle, sf_t2)
    ok, msg = compare(spark_df, oracle_pd)
    assert ok, f"{name}: {msg}"


def test_no_rows_only_queries_remain():
    """Since round 8 every registered query carries a full oracle entry
    (the last two rows-only ANN top-k queries hash through engine-
    stable audit surfaces) — pin the registry stays that way; a new
    rows-only query needs the explicit terminal-decision treatment."""
    assert ROWS_ONLY_QUERIES == []


def test_chunk_spans_edges(spark):
    """Chunk window/overlap edges: exact multiple, partial tail, doc
    shorter than one window, single word, empty, NULL — and the
    parameter guard."""
    import pytest
    from pyspark.sql import functions as F

    from dumpty_spark.functions.text import chunk_spans, words

    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),   # stride 2, window 3 -> 0,2 + tail 4
            (2, "a b c"),          # exactly one window
            (3, "a"),              # shorter than window
            (4, ""),               # empty
            (5, None),             # null
        ],
        ["id", "text"],
    )
    out = (
        df.select("id", words("text").alias("__w"))
        .select("id", F.explode_outer(chunk_spans(F.col("__w"), 3, 1)).alias("c"))
        .select("id", "c.start", "c.chunk_text")
    )
    got = {(r["id"], r["start"], r["chunk_text"]) for r in out.collect()}
    assert got == {
        (1, 0, "a b c"), (1, 2, "c d e"), (1, 4, "e f"),
        (2, 0, "a b c"),
        (3, 0, "a"),
        (4, None, None),
        (5, None, None),
    }
    with pytest.raises(ValueError):
        chunk_spans(F.col("__w"), 3, 3)
