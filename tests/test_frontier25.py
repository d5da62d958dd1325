"""E188 Mantel-Haenszel contracts."""

from __future__ import annotations

from dumpty_spark.queries import REGISTRY


def test_mh_odds_ratio_sanity(spark, sf_smoke):
    from dumpty_spark.sources.parquet import load_table

    row = REGISTRY["q_mh_odds_ratio"].fn(spark, sf_smoke).first()
    assert row["n_strata"] == 5
    assert row["or_mh"] > 0 and row["or_crude"] > 0
    assert row["n_events"] == load_table(spark, sf_smoke, "events").count()


def test_mh_equals_crude_when_strata_homogeneous(spark):
    """With identical 2x2 tables in every stratum, OR_MH == crude OR ==
    (a*d)/(b*c) — the no-confounding identity."""
    rows = []
    for s in range(3):
        rows += (
            [(s, 1, 1)] * 30 + [(s, 1, 0)] * 10
            + [(s, 0, 1)] * 20 + [(s, 0, 0)] * 40
        )
    # feed through the same arithmetic the query uses
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, ["stratum", "wknd", "y"])
    cells = df.groupBy("stratum").agg(
        F.sum(((F.col("wknd") == 1) & (F.col("y") == 1)).cast("int"))
        .cast("double").alias("a"),
        F.sum(((F.col("wknd") == 1) & (F.col("y") == 0)).cast("int"))
        .cast("double").alias("b"),
        F.sum(((F.col("wknd") == 0) & (F.col("y") == 1)).cast("int"))
        .cast("double").alias("c"),
        F.sum(((F.col("wknd") == 0) & (F.col("y") == 0)).cast("int"))
        .cast("double").alias("d"),
    )
    n = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    got = cells.agg(
        (F.sum(F.col("a") * F.col("d") / n)
         / F.sum(F.col("b") * F.col("c") / n)).alias("mh"),
        ((F.sum("a") * F.sum("d")) / (F.sum("b") * F.sum("c"))).alias("cr"),
    ).first()
    expected = (30 * 40) / (10 * 20)  # = 6.0
    assert abs(got["mh"] - expected) < 1e-9
    assert abs(got["cr"] - expected) < 1e-9
