"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Give CPU-heavy per-row operators (shingling, hashing, decoding) a
    parallelism floor.

    A small parquet file scans as ONE task, which serializes all downstream
    compute on one core; at 100 TB inputs are already wide and this is a
    no-op (we never coalesce down). The repartition cost on a small input
    is negligible next to the compute it unblocks."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
