"""Mergeable-sketch store at rest (EXT E45): incremental distinct
counting without rescanning history.

The 100 TB problem: "how many distinct users/documents/keys so far?"
re-asked daily. An exact COUNT(DISTINCT) re-scans the corpus every time;
keeping a distinct-keys table grows with cardinality. Apache DataSketches
HLL (exposed as Spark's ``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate`` since 3.5 — public API) makes the aggregate
MERGEABLE: each ingest batch reduces to a few-KB binary sketch, sketches
live in a parquet store partitioned by batch, and any cross-batch
distinct count is a union over sketches — bytes ∝ batches, never ∝ rows.

This is the E14 incremental-store pattern applied to statistics instead
of fingerprints: history is never re-read, each batch appends one
sketch row per group, and the union query runs in milliseconds at any
corpus size.

Error model: HLL with lgConfigK=12 gives ~1.6% relative standard error
(DataSketches published bounds); the tests assert a 5% envelope against
exact counts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LG_K = 12  # DataSketches lgConfigK: 2^12 buckets ≈ 1.6% RSE, ~4 KB/sketch


def sketch_batch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    batch_id: str,
) -> DataFrame:
    """Reduce one ingest batch to (group, batch_id, sketch, n_rows):
    a partial-aggregated shuffle whose output is groups-sized."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(LG_K)).alias("sketch"),
        F.count("*").alias("n_rows"),
    ).select(
        *group_cols, F.lit(batch_id).alias("batch_id"), "sketch", "n_rows"
    )


def sketch_store_append(
    df: DataFrame,
    store_dir: str,
    group_cols: list[str],
    value_col: str,
    batch_id: str,
) -> None:
    """Append one batch's sketches into the store, hive-partitioned by
    batch_id so re-running a batch overwrites only its own partition
    (idempotent re-ingest, the same contract as the E14 stores)."""
    out = sketch_batch(df, group_cols, value_col, batch_id)
    (
        out.coalesce(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(store_dir)
    )


def sketch_store_estimate(
    spark: SparkSession,
    store_dir: str,
    group_cols: list[str],
    batches: list[str] | None = None,
) -> DataFrame:
    """Distinct-count estimate per group across batches — a scan of
    sketch rows only (batches × groups rows, KBs each). ``batches``
    prunes to a subset via partition filters (e.g. a date range)."""
    sk = spark.read.parquet(store_dir)
    if batches is not None:
        sk = sk.filter(F.col("batch_id").isin(batches))
    return sk.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch", F.lit(True))).alias(
            "approx_distinct"
        ),
        F.sum("n_rows").alias("n_rows"),
    )


def sketch_store_total(
    spark: SparkSession, store_dir: str, batches: list[str] | None = None
) -> int:
    """Global distinct estimate across every group and batch."""
    sk = spark.read.parquet(store_dir)
    if batches is not None:
        sk = sk.filter(F.col("batch_id").isin(batches))
    row = sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch", F.lit(True)))
    ).first()
    return int(row[0]) if row[0] is not None else 0


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) sketches — set-operation cardinality estimates
# (Beyer, Haas, Reinwald, Sismanis, Gemulla, "On synopses for
# distinct-value estimation under multiset operations", SIGMOD 2007 —
# public literature). Complements the HLL store above: HLL unions are
# cheap but HLL INTERSECTIONS via inclusion-exclusion blow up the
# relative error; KMV sketches are coordinated (same hash function), so
# Jaccard is estimated directly on the merged sketch and the
# intersection estimate inherits its accuracy. This is the join-size
# estimator the E55 skew report pairs with: |A ⋈ B| on a key =
# |distinct(A) ∩ distinct(B)| when the key is unique per side.
# Deterministic: the "sample" is a pure function of key hashes.
# ---------------------------------------------------------------------------


def kmv_sketch(df: DataFrame, key_col: str, k: int = 512) -> DataFrame:
    """The k smallest normalized hashes of the DISTINCT keys: one
    distinct-aggregate plus a k-bounded window — sketch-sized output
    (h ∈ [0,1), k rows)."""
    from pyspark.sql import Window as W

    hashed = (
        df.select(F.col(key_col).alias("key"))
        .distinct()
        .select(
            (
                (F.xxhash64("key").cast("double") / F.lit(float(2**63)) + 1.0)
                / 2.0
            ).alias("h")
        )
    )
    # two-level bottom-k so no window ever sees corpus-scale input (the
    # rownum.py rule: a partitionless window must only ever read
    # metadata-sized rows): salt-partitioned bottom-k first (64
    # partitions, external-sorted), then the final bottom-k over at most
    # 64·k surviving rows
    n_salt = 64
    salted = hashed.withColumn(
        "s", F.pmod(F.hash("h"), F.lit(n_salt))
    )
    ws = W.partitionBy("s").orderBy("h")
    pre = (
        salted.withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") <= k)
        .select("h")
    )
    w = W.orderBy("h")
    return (
        pre.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_intersection_estimate(
    sk_a: DataFrame, sk_b: DataFrame, k: int = 512
) -> DataFrame:
    """1-row estimate frame (est_union, est_jaccard, est_intersection)
    from two coordinated KMV sketches: merge → global bottom-k K;
    D_union ≈ (k-1)/max(K); J ≈ |{x ∈ K present in both sketches}|/|K|;
    D_inter = J × D_union. All sketch-sized arithmetic."""
    from pyspark.sql import Window as W

    a = sk_a.select("h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    b = sk_b.select("h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    merged = (
        a.unionAll(b)
        .groupBy("h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = W.orderBy("h")
    kk = (
        merged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
    # below k the merged sketch IS the union — count exactly (the
    # standard KMV small-set case)
    d_union = F.when(
        F.col("n_k") < F.lit(k), F.col("n_k").cast("double")
    ).otherwise((F.col("n_k") - 1) / F.col("u_k"))
    return kk.agg(
        F.count("*").alias("n_k"),
        F.max("h").alias("u_k"),
        F.sum((F.col("in_a") * F.col("in_b"))).alias("n_both"),
    ).select(
        F.round(d_union, 4).alias("est_union"),
        F.round(F.col("n_both") / F.col("n_k"), 4).alias("est_jaccard"),
        F.round((F.col("n_both") / F.col("n_k")) * d_union, 4).alias(
            "est_intersection"
        ),
    )
