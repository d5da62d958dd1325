"""Temporal join t2 queries: as-of and range joins on the events table.

Oracle note: events.ts is TIMESTAMP(NANOS) on disk; Spark reads it
micro-truncated (sources/parquet.py), so every oracle comparison goes
through ``CAST(ts AS TIMESTAMP)`` — DuckDB's ns→us cast truncates the
same way, making boundary comparisons bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.operators import temporal as T
from dumpty_spark.queries import register
from dumpty_spark.sources import load_table

_ASOF_ORACLE = """
WITH p AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE event_type = 'click'
)
SELECT p.event_id AS purchase_id, p.user_id,
       STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       c.event_id AS click_id,
       STRFTIME(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       ROUND(c.value, 4) AS click_value
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY purchase_id
"""


@register(
    "q_asof_join",
    oracle=_ASOF_ORACLE,
    doc="as-of join: each purchase picks up the user's latest click at-or-before "
    "it (union-merge window, one shuffle, zero row amplification)",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts", "value"
    )
    joined = T.asof_join(p, c, on=["user_id"], suffix="_r")
    return joined.select(
        "purchase_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.col("click_id_r").alias("click_id"),
        F.date_format("ts_r", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.round("value_r", 4).alias("click_value"),
    ).orderBy("purchase_id")


_RANGE_ORACLE = """
WITH p AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'click'
)
SELECT p.event_id AS purchase_id, p.user_id,
       STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       COUNT(c.ts) AS n_clicks_1h
FROM p LEFT JOIN c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 3600 SECOND
 AND c.ts <  p.ts
GROUP BY p.event_id, p.user_id, p.ts
ORDER BY purchase_id
"""


@register(
    "q_range_join",
    oracle=_RANGE_ORACLE,
    doc="range join: clicks in the hour before each purchase "
    "(time-bucketed equi-join, constant 2x amplification — no theta-join)",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    c = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    counted = T.range_join_count(
        p, c, on=["user_id"], window_s=3600, count_col="n_clicks_1h"
    )
    return counted.select(
        "purchase_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        "n_clicks_1h",
    ).orderBy("purchase_id")


_ASOF_FWD_ORACLE = """
WITH p AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE event_type = 'click'
)
SELECT p.event_id AS purchase_id, p.user_id,
       STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       c.event_id AS click_id,
       STRFTIME(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts
ORDER BY purchase_id
"""


@register(
    "q_asof_join_forward",
    oracle=_ASOF_FWD_ORACLE,
    doc="forward as-of join: each purchase picks up the user's NEXT click "
    "at-or-after it (same union-merge window pass, direction='forward')",
)
def q_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    joined = T.asof_join(p, c, on=["user_id"], suffix="_r", direction="forward")
    return joined.select(
        "purchase_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.col("click_id_r").alias("click_id"),
        F.date_format("ts_r", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
    ).orderBy("purchase_id")


_ASOF_NEAR_ORACLE = """
WITH p AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'click'
),
back AS (
  SELECT p.event_id AS pid, c.event_id AS cid, c.ts AS cts
  FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
),
fwd AS (
  SELECT p.event_id AS pid, c.event_id AS cid, c.ts AS cts
  FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts
)
SELECT p.event_id AS purchase_id, p.user_id,
       STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       CASE WHEN f.cts IS NULL THEN b.cid
            WHEN b.cts IS NULL THEN f.cid
            WHEN (p.ts - b.cts) <= (f.cts - p.ts) THEN b.cid
            ELSE f.cid END AS click_id
FROM p
LEFT JOIN back b ON b.pid = p.event_id
LEFT JOIN fwd  f ON f.pid = p.event_id
ORDER BY purchase_id
"""


@register(
    "q_asof_join_nearest",
    oracle=_ASOF_NEAR_ORACLE,
    doc="nearest as-of join: each purchase picks up the user's temporally "
    "CLOSEST click (tie -> backward, pandas rule); backward+forward fills "
    "share one sorted window partition — no extra shuffle",
)
def q_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    joined = T.asof_join(p, c, on=["user_id"], suffix="_r", direction="nearest")
    return joined.select(
        "purchase_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.col("click_id_r").alias("click_id"),
    ).orderBy("purchase_id")
