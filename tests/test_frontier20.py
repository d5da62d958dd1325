"""E180 Luhn scan contracts at smoke scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from dumpty_spark.queries import REGISTRY


def test_luhn_counts_exactly_the_planted_numbers(spark, sf_smoke):
    """Unless the synthetic corpus happens to contain card-length digit
    runs (it doesn't — texts are lowercase words), every valid run comes
    from the %37 seeding and every invalid one from %41."""
    from dumpty_spark.sources.parquet import load_table

    rows = REGISTRY["q_luhn_scan"].fn(spark, sf_smoke).collect()
    docs = load_table(spark, sf_smoke, "documents")
    n37 = docs.filter(F.col("doc_id") % 37 == 0).count()
    n41 = docs.filter(F.col("doc_id") % 41 == 0).count()
    assert sum(r["valid_runs"] for r in rows) == n37
    assert sum(r["invalid_runs"] for r in rows) == n41
    assert sum(r["docs_with_valid"] for r in rows) == n37


def test_luhn_fold_unit(spark):
    """Known vectors: the classic 49927398716 validates; flipping its
    last digit doesn't."""
    df = spark.createDataFrame(
        [(1, "s", "x 49927398716 y"), (2, "s", "x 49927398717 y")],
        ["doc_id", "source", "text"],
    )
    # reuse the registered query's internals via a direct mini-scan:
    # 11-digit runs are below the 13-16 card gate, so widen via raw SQL
    from dumpty_spark.queries.frontier20 import _CC_VALID, _CC_INVALID

    def luhn(s: str) -> bool:
        t = 0
        for i, c in enumerate(reversed(s)):
            d = int(c)
            if i % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            t += d
        return t % 10 == 0

    assert luhn(_CC_VALID) and not luhn(_CC_INVALID)
    assert luhn("49927398716") and not luhn("49927398717")
