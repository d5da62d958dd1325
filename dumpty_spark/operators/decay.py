"""Exponentially-decayed aggregate store (EXT E116).

Recency-weighted aggregates are the production answer to "what's the
current rate/level?" over unbounded history: every observation's weight
halves each half-life, so old data fades without ever being deleted or
re-read. The state is mergeable because decay composes multiplicatively:
a batch's decayed sum at its own reference time t_ref re-decays to any
later T by one scalar factor 2^-((T - t_ref)/hl) — so the store keeps
per-(group, batch) partials (decayed_sum, decayed_n, t_ref) and the
readout folds batches with one weighted sum, exactly like the HLL /
quantile / CMS / agg-view stores (same hive-partitioned idempotent
layout), but for the time-weighted family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _epoch_s(col: str):
    # TIMESTAMP_NTZ has no direct double cast; route through timestamp
    # under the pinned-UTC session so values equal DuckDB's naive epoch,
    # sub-second fractions included (the q_session_paths convention)
    return F.col(col).cast("timestamp").cast("double")


def decay_batch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    ts_col: str,
    half_life_s: float,
    batch_id: str,
) -> DataFrame:
    """One batch reduced to per-group decayed partials at the batch's own
    reference time (its max event time)."""
    tref = df.agg(F.max(_epoch_s(ts_col)).alias("t_ref"))
    w = F.pow(2.0, -(F.col("t_ref") - _epoch_s(ts_col)) / half_life_s)
    return (
        df.crossJoin(F.broadcast(tref))
        .groupBy(*group_cols, "t_ref")
        .agg(
            F.sum(F.col(value_col) * w).alias("ds"),
            F.sum(w).alias("dn"),
            F.count("*").alias("cnt"),
        )
        .withColumn("batch_id", F.lit(batch_id))
    )


def decay_store_append(
    df: DataFrame,
    store_dir: str,
    group_cols: list[str],
    value_col: str,
    ts_col: str,
    half_life_s: float,
    batch_id: str,
) -> None:
    (
        decay_batch(df, group_cols, value_col, ts_col, half_life_s, batch_id)
        .coalesce(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(store_dir)
    )


def decay_store_read(
    spark: SparkSession,
    store_dir: str,
    group_cols: list[str],
    half_life_s: float,
    t_now: float | None = None,
) -> DataFrame:
    """Decayed aggregates as of ``t_now`` (default: the newest reference
    time in the store) from partials only — history never re-read."""
    st = spark.read.parquet(store_dir)
    if t_now is None:
        t = st.agg(F.max("t_ref").alias("t_now"))
        st = st.crossJoin(F.broadcast(t))
    else:
        st = st.withColumn("t_now", F.lit(float(t_now)))
    fade = F.pow(2.0, -(F.col("t_now") - F.col("t_ref")) / half_life_s)
    return (
        st.groupBy(*group_cols)
        .agg(
            F.sum(F.col("ds") * fade).alias("decayed_sum"),
            F.sum(F.col("dn") * fade).alias("decayed_n"),
            F.sum("cnt").alias("n_rows"),
        )
        .withColumn("decayed_mean", F.col("decayed_sum") / F.col("decayed_n"))
    )
