"""Incremental aggregate-view maintenance (EXT E113).

The materialized-view primitive every warehouse pipeline wants at 100 TB:
keep per-group aggregates current WITHOUT re-reading history. Same store
design as the sketch/quantile/CMS family (operators/sketches.py:49 —
hive-partitioned by batch_id, so re-ingesting a batch overwrites only its
own partition and stays idempotent), but the state is EXACT mergeable
aggregate moments: (count, sum, min, max). Reading the view re-aggregates
batches×groups PARTIAL rows — KBs — never the raw events; avg is derived
at read time (sum/count is algebraic, so it merges exactly; a stored avg
would not).

Merge algebra: count/sum add, min/max take least/greatest — all
commutative + associative, so batch order, partitioning, and re-splits of
history cannot change the result (the append ≡ full-recompute test pins
this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def agg_view_batch(
    df: DataFrame, group_cols: list[str], value_col: str, batch_id: str
) -> DataFrame:
    """One batch reduced to per-group mergeable aggregate state."""
    return df.groupBy(*group_cols).agg(
        F.count(value_col).alias("cnt"),
        F.sum(value_col).alias("s"),
        F.min(value_col).alias("mn"),
        F.max(value_col).alias("mx"),
    ).withColumn("batch_id", F.lit(batch_id))


def agg_view_append(
    df: DataFrame,
    store_dir: str,
    group_cols: list[str],
    value_col: str,
    batch_id: str,
) -> None:
    """Append one batch's partial aggregates, idempotently per batch."""
    (
        agg_view_batch(df, group_cols, value_col, batch_id)
        .coalesce(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(store_dir)
    )


def agg_view_read(
    spark: SparkSession,
    store_dir: str,
    group_cols: list[str],
    batches: list[str] | None = None,
) -> DataFrame:
    """Current per-group aggregates from partials only; ``batches``
    prunes to a subset via partition filters (e.g. a date range)."""
    st = spark.read.parquet(store_dir)
    if batches is not None:
        st = st.filter(F.col("batch_id").isin(batches))
    return st.groupBy(*group_cols).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("s").alias("s"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    ).withColumn("avg", F.col("s") / F.col("cnt"))
