"""Misra-Gries mergeable heavy-hitter summaries at rest (EXT E175).

Completes the classical mergeable-sketch store family — HLL (E45,
distinct), coordinated bottom-k (E51, quantiles), CMS (E68, point
frequency) — with the deterministic-guarantee TOP-K summary: a
Misra-Gries summary with k counters underestimates every key's true
count by at most N/(k+1) and never overestimates, and summaries MERGE
by counter addition with the bound adding linearly (Agarwal et al.,
"Mergeable Summaries", PODS 2012).

The per-batch construction here is the batch (not streaming) form:
exact per-key batch counts, offset by the (k+1)-th largest count
(row-ranked with a key tie-break so both engines pick the identical
offset), keep the strictly-positive counters. That is a valid MG
summary — and, unlike a streaming pass, it is a DETERMINISTIC function
of the batch, so a SQL oracle can rebuild the entire store state and
the merged estimates are exactly checkable, not just bound-audited.

Store layout: parquet hive-partitioned by batch_id (idempotent
re-ingest, the E14/E45 contract) carrying (key, est) counter rows plus
each batch's total mass in every row (any_value at read) for the
N/(k+1) bound.

Scale: a batch append shuffles (key, count) partials with map-side
combine and the offset comes from a TakeOrdered top-(k+1) — no global
sort; the at-rest state is k rows per batch. Reads touch counters only,
never history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def mg_batch(df: DataFrame, key_col: str, k: int, batch_id: str) -> DataFrame:
    """One batch's Misra-Gries summary: (key, est, n_batch, batch_id)."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("n")
    )
    # offset = the (k+1)-th largest batch count (0 if fewer keys);
    # TakeOrdered top-(k+1), then min over that tiny frame
    top = counts.orderBy(F.desc("n"), "key").limit(k + 1)
    row = top.agg(
        F.count("*").alias("m"), F.min("n").alias("kth")
    ).first()
    offset = int(row["kth"]) if row["m"] == k + 1 else 0
    mass = counts.agg(F.sum("n")).first()[0] or 0
    return (
        counts.select(
            "key",
            (F.col("n") - F.lit(offset)).alias("est"),
            F.lit(int(mass)).alias("n_batch"),
            F.lit(batch_id).alias("batch_id"),
        )
        .filter(F.col("est") > 0)
    )


def mg_store_append(
    df: DataFrame, store_dir: str, key_col: str, k: int, batch_id: str
) -> None:
    (
        mg_batch(df, key_col, k, batch_id)
        .coalesce(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(store_dir)
    )


def mg_store_estimate(spark: SparkSession, store_dir: str) -> DataFrame:
    """Merged estimates across all batches: (key, est, n_total).
    est <= true always; est >= true - n_total/(k+1) by the additive
    merge bound. Counter rows only — history is never re-read.

    A store that only ever received EMPTY batches has no on-disk
    footprint (an empty summary writes no part files), so the read
    below cannot infer a schema — surfaced as a clear ``ValueError``
    instead of Spark's opaque ``unable to infer schema``."""
    from pyspark.errors import AnalysisException

    try:
        sk = spark.read.parquet(store_dir)
    except AnalysisException as exc:
        raise ValueError(
            f"mg_store_estimate: store at {store_dir!r} is empty or "
            "missing (appending only empty batches writes no files)"
        ) from exc
    mass = (
        sk.groupBy("batch_id")
        .agg(F.first("n_batch").alias("nb"))
        .agg(F.sum("nb"))
        .first()[0]
    )
    # mass is NULL when the store exists but holds zero counter rows
    return (
        sk.groupBy("key")
        .agg(F.sum("est").alias("est"))
        .withColumn("n_total", F.lit(int(mass or 0)))
    )
