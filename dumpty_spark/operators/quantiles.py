"""Mergeable quantile-sketch store at rest (EXT E51): incremental
percentiles without rescanning history.

Companion to the HLL distinct-count store (operators/sketches.py, E45):
the second statistic every recurring corpus report needs — "what is the
p50/p90/p99 of <metric> so far?" — re-asked per ingest batch. Exact
percentiles re-sort the corpus every time; this store reduces each batch
to a fixed-size sketch row per group and answers any cross-batch
quantile from sketch rows only (bytes ∝ batches × groups, never ∝ rows).

Sketch = **bottom-k coordinated sample** (Cohen & Kaplan, "Summarizing
data using bottom-k sketches", PODC 2007 — public literature): keep the
k rows whose ``xxhash64(row_key)`` is smallest. Because the hash is a
fixed function of the row key, the bottom-k of a UNION of batches is
exactly the bottom-k of the union of their bottom-k samples — the merge
is lossless with respect to the sampling design, giving a uniform
without-replacement k-sample of ALL rows ever ingested, from sketch
rows alone. Quantile estimate = interpolated percentile of the merged
sample; rank error is O(1/sqrt(k)) (σ = sqrt(q(1-q)/k) ≈ 1.1% at the
median for k=2048, the default).

Everything is deterministic — the "sample" is a pure function of row
keys — so estimates are reproducible across runs, partitionings, and
merge orders, which is what lets the accuracy audit be an exact oracle
contract (queries/scale3.py).

Scale shape: per-batch reduction is one window top-k per group
(external sort, spill-safe) followed by a groups-sized collect_list
bounded at k; estimation explodes batches×groups sketch rows (KBs).
Nothing driver-side ever sees more than the sketch rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

K_DEFAULT = 2048  # sample size per (group, batch): ~1.1% rank SE at p50


def _bottom_k(df: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Rows with the k smallest ``h`` per group. Window row_number over
    an external sort — spill-safe at any group size; output ≤ k rows
    per group."""
    w = W.partitionBy(*group_cols).orderBy("h")
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def quantile_sketch_batch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    key_col: str,
    batch_id: str,
    k: int = K_DEFAULT,
) -> DataFrame:
    """Reduce one ingest batch to (group, batch_id, sketch, n_rows).

    ``key_col`` must identify rows (e.g. event_id): the bottom-k draw is
    keyed on ``xxhash64(key_col)`` so re-ingesting a batch reproduces
    the identical sketch (idempotence) and merges stay coordinated."""
    hashed = df.select(
        *group_cols,
        F.xxhash64(F.col(key_col)).alias("h"),
        F.col(value_col).cast("double").alias("v"),
    )
    return (
        _bottom_k(hashed, group_cols, k)
        .groupBy(*group_cols)
        .agg(
            F.sort_array(F.collect_list(F.struct("h", "v"))).alias("sketch"),
            F.count("*").alias("n_sample"),
        )
        .select(
            *group_cols, F.lit(batch_id).alias("batch_id"), "sketch", "n_sample"
        )
    )


def quantile_store_append(
    df: DataFrame,
    store_dir: str,
    group_cols: list[str],
    value_col: str,
    key_col: str,
    batch_id: str,
    k: int = K_DEFAULT,
) -> None:
    """Append one batch's sketches, hive-partitioned by batch_id so a
    re-run overwrites only its own partition (idempotent re-ingest, the
    same contract as the HLL and fingerprint stores)."""
    out = quantile_sketch_batch(df, group_cols, value_col, key_col, batch_id, k)
    (
        out.coalesce(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(store_dir)
    )


def quantile_store_estimate(
    spark: SparkSession,
    store_dir: str,
    group_cols: list[str],
    qs: list[float],
    k: int = K_DEFAULT,
    batches: list[str] | None = None,
) -> DataFrame:
    """Quantile estimates per group across batches, from sketch rows
    only. Returns (group_cols..., q, est). ``batches`` prunes via
    partition filters exactly like the HLL store.

    The merge is the coordinated-sample property in one line: explode
    every stored sample, re-take the global bottom-k per group — the
    result is the bottom-k of all rows ever ingested."""
    sk = spark.read.parquet(store_dir)
    if batches is not None:
        sk = sk.filter(F.col("batch_id").isin(batches))
    merged = _bottom_k(
        sk.select(
            *group_cols, F.explode("sketch").alias("s")
        ).select(*group_cols, F.col("s.h").alias("h"), F.col("s.v").alias("v")),
        group_cols,
        k,
    )
    qarr = F.array(*[F.lit(float(q)) for q in qs])
    return (
        merged.groupBy(*group_cols)
        .agg(F.percentile("v", qarr).alias("ests"))
        .select(
            *group_cols,
            F.posexplode("ests").alias("qi", "est"),
        )
        .join(
            spark.createDataFrame(
                [(i, float(q)) for i, q in enumerate(qs)], ["qi", "q"]
            ),
            "qi",
        )
        .select(*group_cols, "q", "est")
    )
