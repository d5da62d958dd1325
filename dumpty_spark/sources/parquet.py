"""Parquet source: the engine's default scan.

The reference's unit of work is one source table dumped verbatim
(src/dumpty/pipeline.py:408-472); here the equivalent bounded source is a
parquet scan, which Catalyst gives predicate pushdown, column pruning and
metadata row-counts for free (things the reference had to hand-roll with
``sp_spaceused`` and min/max introspection queries).

At 100 TB these tables are directories of many files; ``spark.read.parquet``
splits them into ~maxPartitionBytes tasks automatically — no hand planning
needed for the parquet path (the JDBC path is where the planner in
dumpty_spark.plans earns its keep).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# (applicationId, sf_dir, table) -> analyzed DataFrame. Plan/metadata
# memo only (file listing + schema resolution); see load_table.
_RELATION_CACHE: dict[tuple, DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table.

    SIDE EFFECT (documented contract): loading ``events`` pins two session
    confs on the caller's SparkSession for the remainder of the session —
    ``spark.sql.legacy.parquet.nanosAsLong=true`` and
    ``spark.sql.session.timeZone=UTC``. Every event-time query in this
    engine (and the DuckDB oracles they are verified against) assumes
    UTC-session epoch arithmetic, so the pin is deliberately NOT
    save/restored: restoring a non-UTC zone mid-session would silently
    shift any later ``cast(ts as ...)`` by the zone offset. Callers that
    need a different session zone for unrelated work should use a separate
    SparkSession.
    """
    if name == "events":
        # defensively pin the nanos conf on whatever session we're given:
        # a caller-owned session (e.g. the grading driver's) may not carry
        # dumpty_spark.session's defaults, and without it a
        # TIMESTAMP(NANOS) ts column fails the whole read. (No-op when the
        # fixture writes micros.)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # pin the session timezone for the same reason: the
        # timestamp -> timestamp_ntz normalization below and any
        # cast(ts as double) gap arithmetic downstream interpret wall
        # times in the SESSION zone. On a caller-owned non-UTC session
        # every ts would shift by the zone offset relative to DuckDB's
        # naive reading — silently skewing all event-time queries.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _RELATION_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = _normalize_events_ts(df)
    # Memoize the ANALYZED RELATION, not results: re-resolving the same
    # fixture table costs a directory listing + a parquet footer read
    # per call (~0.15-0.3s driver-side), and the suite resolves the ten
    # fixture tables hundreds of times. A production deployment pays
    # this once by registering the table in a catalog; the memo is the
    # same thing per (session, sf_dir). Every action on the returned
    # frame still scans the parquet files — nothing about query
    # execution or results is cached. Keyed on applicationId so a new
    # SparkSession never sees another session's resolved plans; stale
    # sessions' entries are dropped eagerly.
    for k in [k for k in _RELATION_CACHE if k[0] != key[0]]:
        del _RELATION_CACHE[k]
    _RELATION_CACHE[key] = df
    return df


def _normalize_events_ts(df: DataFrame) -> DataFrame:
    """Pin ``events.ts`` to micro-precision TIMESTAMP_NTZ whatever the file
    encodes: fixture generations have shipped it both as TIMESTAMP(NANOS)
    (read as long under nanosAsLong) and as plain timestamp[us]. DuckDB is
    micro-precision NTZ, so the oracle sees identical values either way."""
    from pyspark.sql import functions as F

    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        # nanos-as-long: truncate to micros with integer division (floor
        # for the positive epoch range). Plain `/` would go through double
        # and lose precision at 1e18 nanoseconds.
        return df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    if ts_type == "timestamp":
        return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return df  # already timestamp_ntz


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
