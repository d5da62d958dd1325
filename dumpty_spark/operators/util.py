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


def round_half_up(x: float, scale: int) -> float:
    """Driver-side replica of Spark's ``F.round`` on DoubleType (and
    DuckDB's ``ROUND``): decimal HALF_UP — away from zero at ties — on
    the double's SHORTEST decimal representation. Java's
    ``BigDecimal.valueOf(double)`` goes through ``Double.toString`` and
    Python's ``repr(float)`` is the same shortest-roundtrip string, so
    ``Decimal(repr(x))`` sees the identical decimal BigDecimal does.
    Used by driver-regime fast paths that must requantize exactly like
    the in-plan expression they replace."""
    import decimal

    if x != x or x in (float("inf"), float("-inf")):
        return x
    q = decimal.Decimal(1).scaleb(-scale)
    return float(
        decimal.Decimal(repr(float(x))).quantize(
            q, rounding=decimal.ROUND_HALF_UP
        )
    )
