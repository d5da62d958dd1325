"""Ingestion/planning surface as t2 queries (SURVEY §2.1, §2.4 W1, §2.9 X8).

The planner's decisions are pure Python (tests/test_planner.py); the
queries here expose the underlying *data* computations — julienne
boundaries, equal-frequency histograms, slice routing — as oracle-checked
SQL so the driver can hash-verify the semantics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dumpty_spark.plans.planner import slice_id_column
from dumpty_spark.queries import register
from dumpty_spark.sources import load_table

# ---------------------------------------------------------------------------
# W1: the julienne — every 5000th l_orderkey in sort order (exact,
# reference pipeline.py:236-267). Deterministic despite ties because the
# VALUE at a given sorted position is tie-order-independent and the result
# is DISTINCT.
# ---------------------------------------------------------------------------

_JULIENNE_ORACLE = """
SELECT DISTINCT id AS boundary
FROM (
  SELECT l_orderkey AS id,
         ROW_NUMBER() OVER (ORDER BY l_orderkey) AS rn
  FROM lineitem
)
WHERE rn % 5000 = 0
ORDER BY boundary
"""


@register(
    "q_julienne_boundaries",
    oracle=_JULIENNE_ORACLE,
    doc="exact equal-frequency boundary extraction (SURVEY W1, julienne)",
)
def q_julienne_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = W.orderBy("l_orderkey")
    return (
        li.select(F.col("l_orderkey").alias("id"), F.row_number().over(w).alias("rn"))
        .filter((F.col("rn") % 5000) == 0)
        .select(F.col("id").alias("boundary"))
        .distinct()
        .orderBy("boundary")
    )


# ---------------------------------------------------------------------------
# Equal-frequency partition histogram via NTILE — the scalable shape of the
# julienne (what approxQuantile approximates), checkable exactly in SQL.
# ---------------------------------------------------------------------------

_NTILE_ORACLE = """
SELECT bucket, COUNT(*) AS n, MIN(o_orderkey) AS lo, MAX(o_orderkey) AS hi
FROM (
  SELECT o_orderkey, NTILE(8) OVER (ORDER BY o_orderkey) AS bucket
  FROM orders
)
GROUP BY bucket
ORDER BY bucket
"""


@register(
    "q_ntile_partition_hist",
    oracle=_NTILE_ORACLE,
    doc="NTILE equal-frequency bucketing histogram (scalable julienne shape)",
)
def q_ntile_partition_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.orderBy("o_orderkey")
    return (
        orders.select("o_orderkey", F.ntile(8).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("o_orderkey").alias("lo"),
            F.max("o_orderkey").alias("hi"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# P2/P3 slice routing: fixed boundaries → slice id per row → histogram.
# Exercises slice_id_column (the engine's typed-Column predicate slices,
# including NULL routing) end-to-end against a CASE-expression oracle.
# ---------------------------------------------------------------------------

_BOUNDS = [3000, 6000, 9000, 12000]

_SLICE_ORACLE = """
SELECT
  CASE
    WHEN o_orderkey IS NULL OR o_orderkey <= 3000 THEN 0
    WHEN o_orderkey <= 6000  THEN 1
    WHEN o_orderkey <= 9000  THEN 2
    WHEN o_orderkey <= 12000 THEN 3
    ELSE 4
  END AS slice_id,
  COUNT(*) AS n
FROM orders
GROUP BY 1
ORDER BY slice_id
"""


@register(
    "q_slice_histogram",
    oracle=_SLICE_ORACLE,
    doc="range-predicate slice routing with NULL-safe first slice (SURVEY P2/P3)",
)
def q_slice_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn("slice_id", slice_id_column("o_orderkey", _BOUNDS))
        .groupBy("slice_id")
        .agg(F.count("*").alias("n"))
        .orderBy("slice_id")
    )


def _profile_oracle() -> str:
    numeric = {"o_orderkey", "o_custkey", "o_totalprice"}
    parts = []
    for c in (
        "o_orderkey o_custkey o_orderstatus o_totalprice "
        "o_orderdate o_orderpriority"
    ).split():
        mn = f"ROUND(MIN({c})::DOUBLE, 4)" if c in numeric else "NULL::DOUBLE"
        mx = f"ROUND(MAX({c})::DOUBLE, 4)" if c in numeric else "NULL::DOUBLE"
        parts.append(
            f"SELECT '{c}' AS col_name, COUNT(*) AS n_rows, "
            f"COUNT(*) - COUNT({c}) AS n_nulls, "
            f"COUNT(DISTINCT {c}) AS n_distinct, "
            f"{mn} AS min_num, {mx} AS max_num FROM orders"
        )
    return " UNION ALL ".join(parts) + " ORDER BY col_name"


@register(
    "q_profile_columns",
    oracle=_profile_oracle(),
    doc="one-scan whole-table column profiler: per-column count/nulls/"
    "exact-distinct/min/max — the reference's PK introspection "
    "(pipeline.py:328-339, A1) generalized to every column; single "
    "partial-agg shuffle, per-column fan-out on the 1-row result (X8)",
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.plans.planner import profile_columns

    orders = load_table(spark, sf_dir, "orders")
    return profile_columns(orders).orderBy("col_name")


_SKEW_ORACLE = """
WITH sizes AS (
  SELECT l_orderkey, COUNT(*) AS sz FROM lineitem GROUP BY 1
)
SELECT COUNT(*) AS n_keys,
       MAX(sz) AS max_sz,
       ROUND(AVG(sz), 4) AS avg_sz,
       ROUND(quantile_cont(sz, 0.5), 4) AS p50,
       ROUND(quantile_cont(sz, 0.9), 4) AS p90,
       ROUND(quantile_cont(sz, 0.99), 4) AS p99,
       ROUND(MAX(sz) * 1.0 / AVG(sz), 4) AS skew_ratio
FROM sizes
"""


@register(
    "q_skew_report",
    oracle=_SKEW_ORACLE,
    doc="join-key skew report: group-size distribution (exact "
    "interpolated percentiles, max, skew ratio vs mean) in one "
    "partial-agg pass + one tiny agg over keys — the diagnostic that "
    "decides salting (E8) / AQE skew handling, generalizing the "
    "reference's planner stats (X8, pipeline.py:359-400)",
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sizes = li.groupBy("l_orderkey").agg(F.count("*").alias("sz"))
    return sizes.agg(
        F.count("*").alias("n_keys"),
        F.max("sz").alias("max_sz"),
        F.round(F.avg("sz"), 4).alias("avg_sz"),
        F.round(F.percentile("sz", 0.5), 4).alias("p50"),
        F.round(F.percentile("sz", 0.9), 4).alias("p90"),
        F.round(F.percentile("sz", 0.99), 4).alias("p99"),
        F.round(F.max("sz") / F.avg("sz"), 4).alias("skew_ratio"),
    )


_CSV_QUARANTINE_ORACLE = """
SELECT event_type,
       COUNT(*) FILTER (WHERE event_id % 97 != 0)            AS n_clean,
       ROUND(SUM(value) FILTER (WHERE event_id % 97 != 0), 2) AS sum_value,
       COUNT(*) FILTER (WHERE event_id % 97 = 0)             AS n_quarantined
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q_csv_quarantine",
    oracle=_CSV_QUARANTINE_ORACLE,
    doc="CSV ingest with malformed-row quarantine (S7): events exported "
    "to CSV with every event_id%97==0 row deterministically corrupted "
    "(non-numeric value field), read back PERMISSIVE with a corrupt-"
    "record column, bad lines quarantined, clean rows aggregated — the "
    "oracle recomputes both halves from the source table, proving no "
    "row was lost or double-counted",
)
def q_csv_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from pyspark.sql import types as T

    from dumpty_spark.session import warehouse_scratch
    from dumpty_spark.sources.csv_source import read_csv_quarantine

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    tmp = warehouse_scratch(spark, "csvq")
    try:
        csv_dir = f"{tmp}/events_csv"
        # deterministic corruption: value becomes a non-numeric token
        ev.select(
            "event_id",
            "event_type",
            F.when(F.col("event_id") % 97 == 0, F.lit("<<BAD>>"))
            .otherwise(F.col("value").cast("string"))
            .alias("value"),
        ).coalesce(4).write.option("header", "true").csv(csv_dir)

        schema = T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
            ]
        )
        clean, quarantined = read_csv_quarantine(spark, csv_dir, schema)
        # quarantined rows still carry their parseable id+type prefix in
        # the raw line; recover the type for the per-type accounting
        bad_types = quarantined.select(
            F.split("raw_line", ",")[1].alias("event_type")
        ).groupBy("event_type").agg(F.count("*").alias("n_quarantined"))
        good = clean.groupBy("event_type").agg(
            F.count("*").alias("n_clean"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        # FULL outer: an event_type whose every row was corrupted has no
        # clean rows, but the 'no row was lost' contract still owes it a
        # (0, NULL, n_quarantined) line — a left join from `good` would
        # silently drop it while the oracle (one GROUP BY over the source
        # table) still emits it
        return (
            good.join(bad_types, "event_type", "full")
            .select(
                "event_type",
                F.coalesce("n_clean", F.lit(0)).alias("n_clean"),
                "sum_value",
                F.coalesce("n_quarantined", F.lit(0)).alias("n_quarantined"),
            )
            .orderBy("event_type")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
