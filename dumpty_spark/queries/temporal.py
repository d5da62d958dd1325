"""Temporal join t2 queries: as-of and range joins on the events table.

Oracle note: events.ts is TIMESTAMP(NANOS) on disk; Spark reads it
micro-truncated (sources/parquet.py), so every oracle comparison goes
through ``CAST(ts AS TIMESTAMP)`` — DuckDB's ns→us cast truncates the
same way, making boundary comparisons bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


_FUNNEL_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END)
           AS first_click
  FROM events GROUP BY user_id
),
conv AS (
  SELECT u.user_id, u.first_click,
         MIN(CASE WHEN e.event_type = 'purchase'
                   AND CAST(e.ts AS TIMESTAMP) >= u.first_click
                   AND CAST(e.ts AS TIMESTAMP) < u.first_click + INTERVAL 7 DAY
              THEN CAST(e.ts AS TIMESTAMP) END) AS first_purchase
  FROM per_user u LEFT JOIN events e ON e.user_id = u.user_id
  GROUP BY u.user_id, u.first_click
)
SELECT COUNT(*) AS n_users,
       COUNT(first_click) AS n_clicked,
       COUNT(first_purchase) AS n_converted,
       ROUND(COUNT(first_purchase)::DOUBLE / NULLIF(COUNT(first_click), 0), 4)
         AS conv_rate,
       ROUND(AVG(EPOCH(first_purchase - first_click)) / 3600.0, 4)
         AS avg_hours_to_convert
FROM conv
"""


@register(
    "q_funnel_conversion",
    oracle=_FUNNEL_ORACLE,
    doc="event-funnel analytics: first click → purchase within 7 days per "
    "user; conversion rate + mean latency — conditional-min aggregates, "
    "one shuffle per rollup, no self-join row amplification",
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "first_click"
        )
    )
    conv = (
        per_user.join(ev, "user_id", "left")
        .groupBy("user_id", "first_click")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("first_click"))
                    & (
                        F.col("ts")
                        < F.col("first_click") + F.expr("INTERVAL 7 DAYS")
                    ),
                    F.col("ts"),
                )
            ).alias("first_purchase")
        )
    )
    secs = (
        F.col("first_purchase").cast("timestamp").cast("double")
        - F.col("first_click").cast("timestamp").cast("double")
    )
    return conv.agg(
        F.count("*").alias("n_users"),
        F.count("first_click").alias("n_clicked"),
        F.count("first_purchase").alias("n_converted"),
        F.round(
            F.count("first_purchase")
            / F.nullif(F.count("first_click"), F.lit(0)),
            4,
        ).alias("conv_rate"),
        F.round(F.avg(secs) / 3600.0, 4).alias("avg_hours_to_convert"),
    )


_RETENTION_ORACLE = """
WITH cohort AS (
  SELECT user_id,
         DATE_TRUNC('week', MIN(CAST(ts AS TIMESTAMP))) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id,
         DATE_TRUNC('week', CAST(ts AS TIMESTAMP)) AS active_week
  FROM events
)
SELECT STRFTIME(c.cohort_week, '%Y-%m-%d') AS cohort_week,
       DATE_DIFF('week', c.cohort_week, a.active_week) AS offset_weeks,
       COUNT(DISTINCT a.user_id) AS n_active
FROM cohort c JOIN activity a ON c.user_id = a.user_id
GROUP BY c.cohort_week, a.active_week
ORDER BY cohort_week, offset_weeks
"""


@register(
    "q_retention_cohorts",
    oracle=_RETENTION_ORACLE,
    doc="weekly retention cohorts: first-seen week × activity-week offset "
    "matrix — two rollups + an equi-join on user_id (AQE picks the join "
    "strategy: broadcast while the cohort table is small, shuffle when "
    "user cardinality outgrows it)",
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    offset = (
        F.datediff(F.col("active_week").cast("date"), F.col("cohort_week").cast("date"))
        / 7
    ).cast("long")
    return (
        activity.join(cohort, "user_id")
        .groupBy("cohort_week", "active_week")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            offset.alias("offset_weeks"),
            "n_active",
        )
        .orderBy("cohort_week", "offset_weeks")
    )


_TRANSITIONS_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id)
           AS next_type
  FROM events
)
SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n,
       ROUND(COUNT(*)::DOUBLE
             / SUM(COUNT(*)) OVER (PARTITION BY event_type), 4) AS p
FROM seq
WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
ORDER BY from_type, to_type
"""


@register(
    "q_event_transitions",
    oracle=_TRANSITIONS_ORACLE,
    doc="event-sequence transition matrix (bigram counts + per-source "
    "transition probabilities): per-user lead window, then a rollup — "
    "the sequence-modeling-prep shape, one shuffle per stage",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counts = seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count("*").alias("n"))
    wp = W.partitionBy("from_type")
    return (
        counts.withColumn("p", F.round(F.col("n") / F.sum("n").over(wp), 4))
        .orderBy("from_type", "to_type")
    )


# ---------------------------------------------------------------------------
# MapType mid-plan (SURVEY §2.6 DELEG — the map-function surface): the
# per-user event profile is materialized as a genuine MapType column
# (map_from_entries), reshaped with transform_values (count → share) and
# map_filter (over-represented types only), then exploded back to flat rows for
# the oracle. The map stays inside one groupBy output row, so nothing
# here changes the shuffle shape vs the flat equivalent — it's the typed
# representation downstream feature stores want.
# ---------------------------------------------------------------------------

_MAP_PROFILE_ORACLE = """
SELECT user_id, event_type AS dominant_type,
       ROUND(cnt::DOUBLE / total, 4) AS share
FROM (
  SELECT user_id, event_type, COUNT(*) AS cnt,
         SUM(COUNT(*)) OVER (PARTITION BY user_id) AS total
  FROM events
  GROUP BY user_id, event_type
)
WHERE cnt::DOUBLE / total >= 0.3
ORDER BY user_id, dominant_type
"""


@register(
    "q_map_event_profile",
    oracle=_MAP_PROFILE_ORACLE,
    doc="MapType surface: per-user event-type map via map_from_entries, "
    "transform_values to shares, map_filter for over-represented types, exploded "
    "flat for the oracle (SURVEY §2.6 DELEG)",
)
def q_map_event_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    prof = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "cnt"))
        ).alias("m"),
        F.sum("cnt").alias("total"),
    )
    shares = prof.select(
        "user_id",
        F.map_filter(
            F.transform_values(
                F.col("m"), lambda _, v: v.cast("double") / F.col("total")
            ),
            lambda _, v: v >= 0.3,
        ).alias("dom"),
    )
    return (
        shares.select("user_id", F.explode("dom").alias("dominant_type", "share"))
        .select("user_id", "dominant_type", F.round("share", 4).alias("share"))
        .orderBy("user_id", "dominant_type")
    )


# ---------------------------------------------------------------------------
# Time-RANGE window frame (SURVEY §2.4 DELEG — the one frame kind the
# row-based windows above don't cover): each hour's event count compared
# to its trailing-24h hourly average, the standard rate-anomaly monitor.
# rangeBetween on epoch seconds handles GAPS in the hour series
# correctly — a rowsBetween(-24, -1) frame would silently span more than
# 24 hours whenever an hour bucket is empty. The window partitions by
# event type, so at scale each type's hour series sorts independently;
# the hourly rollup before it is a partial-agg shuffle of hour-bucket
# cardinality, not event cardinality.
# ---------------------------------------------------------------------------

_ANOMALY_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         epoch(date_trunc('hour', ts))::BIGINT AS ep, COUNT(*) AS cnt
  FROM events
  GROUP BY event_type, date_trunc('hour', ts)
),
scored AS (
  SELECT event_type, hr, cnt,
         AVG(cnt) OVER (PARTITION BY event_type ORDER BY ep
                        RANGE BETWEEN 86400 PRECEDING AND 3600 PRECEDING)
           AS trailing_avg
  FROM hourly
)
SELECT event_type, strftime(hr, '%Y-%m-%d %H:%M:%S') AS hour,
       cnt, ROUND(trailing_avg, 4) AS trailing_avg,
       ROUND(cnt / trailing_avg, 4) AS rate_ratio
FROM scored
WHERE trailing_avg IS NOT NULL AND cnt / trailing_avg >= 1.5
ORDER BY event_type, hour
"""


@register(
    "q_event_rate_anomaly",
    oracle=_ANOMALY_ORACLE,
    doc="trailing-24h rate anomaly per event type: time-RANGE window "
    "frame on epoch seconds (gap-correct), hourly partial-agg rollup "
    "(SURVEY §2.4 DELEG)",
)
def q_event_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.select("event_type", F.date_trunc("hour", "ts").alias("hr"))
        .groupBy("event_type", "hr")
        .agg(F.count("*").alias("cnt"))
        .withColumn("ep", F.unix_timestamp("hr"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ep")
        .rangeBetween(-86400, -3600)
    )
    scored = hourly.withColumn("trailing_avg", F.avg("cnt").over(w))
    return (
        scored.filter(
            F.col("trailing_avg").isNotNull()
            & (F.col("cnt") / F.col("trailing_avg") >= 1.5)
        )
        .select(
            "event_type",
            F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "cnt",
            F.round("trailing_avg", 4).alias("trailing_avg"),
            F.round(F.col("cnt") / F.col("trailing_avg"), 4).alias("rate_ratio"),
        )
        .orderBy("event_type", "hour")
    )


_RESAMPLE_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h, ROUND(SUM(value), 6) AS v
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, MIN(h) AS mn, MAX(h) AS mx FROM hourly GROUP BY 1
),
grid AS (
  SELECT event_type, UNNEST(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
  FROM bounds
),
joined AS (
  SELECT g.event_type, g.h, hr.v
  FROM grid g LEFT JOIN hourly hr ON hr.event_type = g.event_type AND hr.h = g.h
)
SELECT event_type,
       strftime(h, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
       LAST_VALUE(v IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled,
       CASE WHEN v IS NULL THEN 1 ELSE 0 END AS is_gap
FROM joined
ORDER BY event_type, h
"""


@register(
    "q_resample_ffill",
    oracle=_RESAMPLE_ORACLE,
    doc="time-series densify: hourly resample of events per type, full "
    "per-key hour grid via sequence+explode, forward-fill through gaps "
    "with last(ignorenulls) window — the row-level gap-fill the "
    "reference's table-level incrementality never does (SURVEY §2.7)",
)
def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators.temporal import resample_ffill

    ev = load_table(spark, sf_dir, "events")
    out = resample_ffill(ev, "event_type", "ts", "value", "1 hour")
    return out.select(
        "event_type",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        "value_filled",
        "is_gap",
    ).orderBy("event_type", "bucket_ts")
