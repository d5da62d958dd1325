"""Event-time windowing t2 queries (SURVEY §2.7 DELEG surface), executed
in batch mode against the same functions the streaming path uses —
Spark's unified API means the oracle checks the streaming semantics.

DuckDB equivalences: tumbling = time_bucket; sliding = union of offset
buckets; session = lag/gap/cumsum sessionization."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.sources import load_table
from dumpty_spark.streaming.windows import session_agg, sliding_agg, tumbling_agg

_TUMBLING_ORACLE = """
SELECT STRFTIME(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
       event_type,
       COUNT(*) AS n,
       ROUND(SUM(value), 4) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register(
    "q_tumbling_window",
    oracle=_TUMBLING_ORACLE,
    doc="1h tumbling event-time windows: count+sum per type (streaming DELEG, batch-checked)",
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return tumbling_agg(ev, "1 hour").orderBy("w_start", "event_type")


_SLIDING_ORACLE = """
SELECT STRFTIME(time_bucket(INTERVAL '1 hour', ts) - o * INTERVAL '1 hour',
                '%Y-%m-%d %H:%M:%S') AS w_start,
       event_type,
       COUNT(*) AS n
FROM events, UNNEST([0, 1]) AS t(o)
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register(
    "q_sliding_window",
    oracle=_SLIDING_ORACLE,
    doc="2h/1h sliding windows — each event in 2 windows (streaming DELEG)",
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return sliding_agg(ev, "2 hours", "1 hour").orderBy("w_start", "event_type")


_SESSION_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, value,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS total_value,
       DATE_DIFF('second', MIN(ts), MAX(ts)) AS span_sec
FROM sessions
GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


@register(
    "q_session_windows",
    oracle=_SESSION_ORACLE,
    doc="30-min-gap session windows per user (F.session_window vs lag/cumsum oracle)",
)
def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return session_agg(ev, "30 minutes").orderBy("user_id", "session_start")


_JSON_ORACLE = """
SELECT event_type,
       SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
       COUNT(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q_json_props",
    oracle=_JSON_ORACLE,
    doc="JSON scalar extraction from props (SURVEY §2.6 DELEG: from_json/get_json_object)",
)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count("*").alias("n"))
        .orderBy("event_type")
    )


_WATERMARK_ORACLE = """
SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS total_value
FROM events
WHERE ts > TIMESTAMP '2024-01-25 00:00:00'
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q_incremental_watermark",
    oracle=_WATERMARK_ORACLE,
    doc="high-water-mark incremental selection (SURVEY I1: rows since last_successful_run)",
)
def q_incremental_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts") > F.lit("2024-01-25 00:00:00").cast("timestamp_ntz"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .orderBy("event_type")
    )


_INTERVAL_JOIN_ORACLE = """
SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
       STRFTIME(CAST(a.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS a_time,
       ROUND(epoch(CAST(b.ts AS TIMESTAMP)) - epoch(CAST(a.ts AS TIMESTAMP)), 4)
         AS gap_secs
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'click' AND b.event_type = 'purchase'
 AND CAST(b.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP)
 AND CAST(b.ts AS TIMESTAMP) <= CAST(a.ts AS TIMESTAMP) + INTERVAL '1 hour'
WHERE a.user_id < 50
ORDER BY a.user_id, a_id, b_id
"""


@register(
    "q_interval_join",
    oracle=_INTERVAL_JOIN_ORACLE,
    doc="stream-stream interval join (click→purchase within 1h per user): "
    "watermark-bounded state when streaming, equi-join + time residual in "
    "batch (unified API, oracle-checked)",
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.streaming.windows import interval_join

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    out = interval_join(ev)
    return out.select(
        "user_id",
        "a_id",
        "b_id",
        F.date_format("a_ts", "yyyy-MM-dd HH:mm:ss").alias("a_time"),
        F.round(
            (
                F.unix_micros(F.col("b_ts").cast("timestamp"))
                - F.unix_micros(F.col("a_ts").cast("timestamp"))
            )
            / 1e6,
            4,
        ).alias("gap_secs"),
    ).orderBy("user_id", "a_id", "b_id")


_VARIANT_ORACLE = """
SELECT event_type,
       ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS max_k,
       COUNT(*) FILTER (WHERE json_extract_string(props, '$.k') IS NULL)
         AS n_missing
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q_variant_props",
    oracle=_VARIANT_ORACLE,
    doc="semi-structured props via Spark 4 VARIANT (parse_json + "
    "variant_get): binary-encoded once at parse, typed extraction "
    "without re-tokenizing the JSON per access — the scale path for "
    "repeated multi-field access that get_json_object re-parses each "
    "time (see q_json_props for the string-JSON predecessor)",
)
def q_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count_if(F.col("k").isNull()).alias("n_missing"),
        )
        .orderBy("event_type")
    )


_CHAINED_ORACLE = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hr, event_type, COUNT(*) AS n_hour
  FROM events GROUP BY date_trunc('hour', ts), event_type
)
SELECT strftime(date_trunc('day', hr), '%Y-%m-%d') AS day, event_type,
       SUM(n_hour)::BIGINT AS n_day, COUNT(*) AS n_hours_present
FROM hourly
GROUP BY date_trunc('day', hr), event_type
ORDER BY day, event_type
"""


@register(
    "q_chained_window_rollup",
    oracle=_CHAINED_ORACLE,
    doc="chained time-window aggregations (hourly tumbling → daily "
    "re-window of the window struct) — ONE plan serving batch here and "
    "two back-to-back stateful operators under streaming "
    "(test_chained_window_rollup_stream_matches_batch)",
)
def q_chained_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.streaming.windows import chained_window_rollup

    ev = load_table(spark, sf_dir, "events")
    return chained_window_rollup(ev).orderBy("day", "event_type")
