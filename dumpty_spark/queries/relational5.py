"""Round-3 statistical analytics batch (E60-E63): per-series trend
regression, winsorized robust stats, chi-square independence screen,
bounded-window EWMA. All pure Column expressions with exact DuckDB
oracles — the screening statistics a data-quality / drift monitor runs
per ingest batch at corpus scale (each is one scan + a groups-sized
aggregate; no windows over unbounded partitions except the per-series
sorts that define the semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E60: per-series linear trend (OLS slope/intercept/R²) over time
# ---------------------------------------------------------------------------
_TREND_ORACLE = """
WITH pts AS (
  SELECT event_type, floor(epoch(ts)) - 1577836800 AS x, value AS y FROM events
)
SELECT event_type,
       ROUND(REGR_SLOPE(y, x) * 86400, 5) AS slope_per_day,
       ROUND(REGR_INTERCEPT(y, x), 2) AS intercept,
       ROUND(REGR_R2(y, x), 5) AS r2,
       COUNT(*)::BIGINT AS n
FROM pts
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q_series_trend",
    oracle=_TREND_ORACLE,
    doc="per-series OLS trend (E60): slope/day, intercept, R² of value "
    "vs time from the closed-form moment identities (covar_pop/var_pop "
    "/corr — one partial-aggregated scan, groups-sized output); the "
    "is-this-metric-drifting screen run per ingest batch",
)
def q_series_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # x in seconds since a fixed epoch (2020-01-01) keeps the moments
    # small; slope reported per DAY for human-sized magnitudes
    pts = ev.select(
        "event_type",
        (F.unix_timestamp("ts") - F.lit(1577836800)).cast("double").alias("x"),
        F.col("value").alias("y"),
    )
    agg = pts.groupBy("event_type").agg(
        F.covar_pop("y", "x").alias("cxy"),
        F.var_pop("x").alias("vx"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.corr("y", "x").alias("r"),
        F.count("*").alias("n"),
    )
    slope = F.col("cxy") / F.col("vx")
    return agg.select(
        "event_type",
        F.round(slope * 86400, 5).alias("slope_per_day"),
        F.round(F.col("my") - slope * F.col("mx"), 2).alias("intercept"),
        F.round(F.col("r") * F.col("r"), 5).alias("r2"),
        "n",
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# E61: winsorized robust statistics — clip at p05/p95 before the mean
# ---------------------------------------------------------------------------
_WINSOR_ORACLE = """
WITH b AS (
  SELECT event_type,
         QUANTILE_CONT(value, 0.05) AS lo,
         QUANTILE_CONT(value, 0.95) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       ROUND(AVG(e.value), 4) AS raw_mean,
       ROUND(AVG(LEAST(GREATEST(e.value, b.lo), b.hi)), 4) AS winsor_mean,
       ROUND(b.lo, 4) AS p05,
       ROUND(b.hi, 4) AS p95,
       SUM(CASE WHEN e.value < b.lo OR e.value > b.hi THEN 1 ELSE 0 END)::BIGINT
         AS n_clipped
FROM events e JOIN b ON e.event_type = b.event_type
GROUP BY e.event_type, b.lo, b.hi
ORDER BY e.event_type
"""


@register(
    "q_winsorized_stats",
    oracle=_WINSOR_ORACLE,
    doc="winsorized per-group means (E61): exact p05/p95 bounds from a "
    "groups-sized stats pass broadcast back onto the scan, values "
    "clipped before averaging — the heavy-tail-robust featurization "
    "twin of the z-score scaler (E24); clip counts reported so the "
    "tail mass is visible",
)
def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("lo"),
        F.percentile("value", F.lit(0.95)).alias("hi"),
    )
    clipped = ev.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "value",
        F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")).alias(
            "w"
        ),
        "lo",
        "hi",
        ((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")))
        .cast("int")
        .alias("is_clipped"),
    )
    return (
        clipped.groupBy("event_type")
        .agg(
            F.round(F.avg("value"), 4).alias("raw_mean"),
            F.round(F.avg("w"), 4).alias("winsor_mean"),
            F.round(F.first("lo"), 4).alias("p05"),
            F.round(F.first("hi"), 4).alias("p95"),
            F.sum("is_clipped").alias("n_clipped"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# E62: chi-square independence screen — event_type × hour-of-day
# ---------------------------------------------------------------------------
_CHI2_ORACLE = """
WITH obs AS (
  SELECT event_type, (EXTRACT(hour FROM ts) // 6) AS h6,
         COUNT(*)::DOUBLE AS o
  FROM events GROUP BY 1, 2
),
tot AS (SELECT SUM(o) AS n FROM obs),
rowm AS (SELECT event_type, SUM(o) AS ro FROM obs GROUP BY 1),
colm AS (SELECT h6, SUM(o) AS co FROM obs GROUP BY 1)
SELECT 'event_type x hour6' AS pair_name,
       COUNT(*)::BIGINT AS n_cells,
       ROUND(SUM((obs.o - rowm.ro * colm.co / tot.n) ^ 2
                 / (rowm.ro * colm.co / tot.n)), 4) AS chi2,
       ((COUNT(DISTINCT obs.event_type) - 1)
        * (COUNT(DISTINCT obs.h6) - 1))::BIGINT AS dof
FROM obs, tot, rowm, colm
WHERE obs.event_type = rowm.event_type AND obs.h6 = colm.h6
"""


@register(
    "q_chi2_independence",
    oracle=_CHI2_ORACLE,
    doc="chi-square independence screen (E62): observed vs expected "
    "contingency of event_type × 6-hour bucket — one scan into a "
    "cells-sized table, marginals broadcast back; the "
    "is-this-categorical-pair-correlated check a feature audit runs "
    "before trusting two columns as independent signals",
)
def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    obs = (
        ev.select(
            "event_type", (F.hour("ts") / 6).cast("int").alias("h6")
        )
        .groupBy("event_type", "h6")
        .agg(F.count("*").cast("double").alias("o"))
    )
    tot = obs.agg(F.sum("o").alias("n"))
    rowm = obs.groupBy("event_type").agg(F.sum("o").alias("ro"))
    colm = obs.groupBy("h6").agg(F.sum("o").alias("co"))
    joined = (
        obs.join(F.broadcast(rowm), "event_type")
        .join(F.broadcast(colm), "h6")
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("ro") * F.col("co") / F.col("n")
    return joined.agg(
        F.lit("event_type x hour6").alias("pair_name"),
        F.count("*").alias("n_cells"),
        F.round(F.sum((F.col("o") - e) * (F.col("o") - e) / e), 4).alias(
            "chi2"
        ),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("h6") - 1)
        ).alias("dof"),
    )


# ---------------------------------------------------------------------------
# E63: bounded-window EWMA — exponential smoothing as a Column fold
# ---------------------------------------------------------------------------
_EWMA_ALPHA = 0.3
_EWMA_WIN = 10  # truncation window; (1-α)^10 ≈ 0.028 residual weight

_EWMA_ORACLE = f"""
WITH ordered AS (
  SELECT event_type, event_id, value,
         list(value) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
           ROWS BETWEEN {_EWMA_WIN - 1} PRECEDING AND CURRENT ROW
         ) AS vs
  FROM events
),
sm AS (
  SELECT event_type, event_id,
         list_sum(list_transform(list_reverse(vs),
             (v, i) -> v * {_EWMA_ALPHA} * (1 - {_EWMA_ALPHA}) ^ (i - 1)))
         / list_sum(list_transform(list_reverse(vs),
             (v, i) -> {_EWMA_ALPHA} * (1 - {_EWMA_ALPHA}) ^ (i - 1)))
         AS s
  FROM ordered
)
SELECT event_type,
       ROUND(AVG(s), 4) AS mean_smoothed,
       ROUND(MAX(s), 4) AS max_smoothed
FROM sm
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q_ewma_smoothing",
    oracle=_EWMA_ORACLE,
    doc=f"bounded-window EWMA (E63): α={_EWMA_ALPHA} exponential "
    f"smoothing truncated at {_EWMA_WIN} lags (≈3% residual weight, "
    "renormalized — so the truncation is principled, not silent) as a "
    "collect_list window + Column fold; per-series smoothed summary "
    "the anomaly monitors consume. One sort shuffle per series",
)
def q_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_EWMA_WIN - 1), 0)
    )
    a = _EWMA_ALPHA
    vs = F.reverse(F.collect_list("value").over(w))
    wsum = F.expr(
        f"aggregate(transform(vs, (v, i) -> v * {a} * pow(1 - {a}, i)), "
        "0D, (acc, x) -> acc + x)"
    )
    norm = F.expr(
        f"aggregate(transform(vs, (v, i) -> {a} * pow(1 - {a}, i)), "
        "0D, (acc, x) -> acc + x)"
    )
    sm = ev.select("event_type", vs.alias("vs")).select(
        "event_type", (wsum / norm).alias("s")
    )
    return (
        sm.groupBy("event_type")
        .agg(
            F.round(F.avg("s"), 4).alias("mean_smoothed"),
            F.round(F.max("s"), 4).alias("max_smoothed"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# E65: CUSUM change-point detection — recursion eliminated via prefix-min
# ---------------------------------------------------------------------------
# One-sided CUSUM (Page 1954 — public literature): S_t = max(0, S_{t-1}
# + (x_t - target - slack)). The recursion looks window-hostile, but
# reflects away: with P_t = prefix_sum(x - target - slack),
# S_t = P_t - prefix_min(P_t) over the SAME ordering — two cumulative
# windows, no recursion, no UDF, identical in both engines. The
# standard drift alarm over metric streams, per event series against
# its own global mean with the textbook 0.5σ slack.

_CUSUM_ORACLE = """
WITH stats AS (
  SELECT event_type, AVG(value) AS mu, STDDEV_POP(value) AS sd
  FROM events GROUP BY event_type
),
pref AS (
  SELECT e.event_type, e.ts, e.event_id, s.sd,
         SUM(e.value - s.mu - 0.5 * s.sd) OVER (
           PARTITION BY e.event_type ORDER BY e.ts, e.event_id
           ROWS UNBOUNDED PRECEDING) AS p
  FROM events e JOIN stats s USING (event_type)
),
cusum AS (
  SELECT event_type, sd,
         p - MIN(p) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS s
  FROM pref
)
SELECT event_type,
       ROUND(MAX(s) / ANY_VALUE(sd), 3) AS peak_sigma,
       (MAX(s / sd) > 5.0) AS alarm
FROM cusum
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q_cusum_alarm",
    oracle=_CUSUM_ORACLE,
    doc="one-sided CUSUM drift alarm (E65): the max(0, ·) recursion "
    "eliminated via the reflection identity S = prefix_sum − prefix_min "
    "(two cumulative windows per series, no recursion, no UDF) — "
    "per-series peak CUSUM in σ units + alarm boolean at the 5σ "
    "textbook threshold",
)
def q_cusum_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_pop("value").alias("sd")
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    pref = ev.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "ts",
        "event_id",
        "sd",
        F.sum(F.col("value") - F.col("mu") - 0.5 * F.col("sd"))
        .over(w)
        .alias("p"),
    )
    cusum = pref.select(
        "event_type", "sd", (F.col("p") - F.min("p").over(w)).alias("s")
    )
    return (
        cusum.groupBy("event_type")
        .agg(
            F.round(F.max("s") / F.first("sd"), 3).alias("peak_sigma"),
            (F.max(F.col("s") / F.col("sd")) > 5.0).alias("alarm"),
        )
        .orderBy("event_type")
    )
