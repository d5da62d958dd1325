"""Round-8 engine extensions, seventh batch (EXT E206-E207): blocked
Jaro-Winkler record linkage and Holt-Winters triple-exponential
seasonal smoothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E206: blocked Jaro-Winkler record linkage
# ---------------------------------------------------------------------------
# The entity-resolution scorer the edit-distance family lacks: PassJoin
# (E78) bounds absolute edit OPERATIONS, JW scores prefix-weighted
# agreement — the standard for short name-like strings (Winkler 1990,
# census record linkage). Plan shape is classic blocked linkage: block
# on the first name token (one shuffle each side of a self-equi-join;
# candidate volume is sum of C(block,2), never corpus²), score each
# candidate pair with the Arrow-batched JW kernel, keep the top-50 by
# (sim desc, names) via TakeOrderedAndProject. At 100 TB the block key
# widens (more tokens / phonetic key) to hold block sizes constant —
# the same df-capping discipline as hot shingles; the kernel is
# verified bit-identical to DuckDB's jaro_winkler_similarity, so the
# oracle checks VALUES, not just mechanics.

_JW_TOPK = 50

_JW_ORACLE = f"""
WITH names AS (SELECT DISTINCT p_name FROM part),
b AS (
  SELECT p_name, string_split(p_name, ' ')[1] AS blk FROM names
),
pairs AS (
  SELECT a.p_name AS name_a, c.p_name AS name_b
  FROM b a JOIN b c ON a.blk = c.blk AND a.p_name < c.p_name
)
SELECT name_a, name_b,
       ROUND(jaro_winkler_similarity(name_a, name_b), 6) AS jw_sim
FROM pairs
ORDER BY jw_sim DESC, name_a, name_b
LIMIT {_JW_TOPK}
"""


@register(
    "q_jaro_winkler_match",
    oracle=_JW_ORACLE,
    doc="blocked Jaro-Winkler linkage (E206): distinct part names "
    "blocked on the first token, within-block candidate pairs scored "
    "by an Arrow-batched JW kernel (bit-identical to DuckDB's "
    "jaro_winkler_similarity — full value oracle), top-50 by "
    "similarity via a driver-merged heap; the name-matching scorer "
    "next to PassJoin's absolute edit bound",
)
def q_jaro_winkler_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators.editdist import jaro_winkler

    names = load_table(spark, sf_dir, "part").select("p_name").distinct()
    b = names.select(
        "p_name", F.split("p_name", " ").getItem(0).alias("blk")
    )
    left = b.select(F.col("p_name").alias("name_a"), "blk")
    right = b.select(F.col("p_name").alias("name_b"), "blk")
    pairs = left.join(right, "blk").filter(F.col("name_a") < F.col("name_b"))
    return (
        pairs.select(
            "name_a",
            "name_b",
            F.round(jaro_winkler("name_a", "name_b"), 6).alias("jw_sim"),
        )
        .orderBy(F.desc("jw_sim"), "name_a", "name_b")
        .limit(_JW_TOPK)
    )


# ---------------------------------------------------------------------------
# E207: Holt-Winters additive seasonal smoothing (m=7)
# ---------------------------------------------------------------------------
# Completes the forecasting ladder: E139 Holt (level+trend) had no
# seasonal state; E193 seasonal-naive had no smoothing. Additive
# Holt-Winters carries (level, trend, 7-slot seasonal queue) per
# series; the recursion is inherently sequential IN TIME but
# embarrassingly parallel ACROSS series — per event_type the
# calendar-densified daily counts collapse to ONE ordered array and
# the whole trajectory is a single F.aggregate fold (pure Column
# HOFs, zero UDF, zero driver loop), so a million series = a million
# independent folds after one shuffle, each bounded by days-not-rows.
# Init: level = week-1 mean, trend = (week-2 mean − week-1 mean)/7,
# seasonal_j = x_j − week-1 mean; recursion from day 8 with
# alpha=0.3, beta=0.05, gamma=0.2. Every state update is requantized
# at 9dp (the E143/E169 trajectory discipline) and the one-step-ahead
# absolute error is integerized to micro-units PER TERM and summed as
# BIGINT, so both engines walk identical doubles; the oracle replays
# the identical fold as a recursive CTE. Output: the 7-day forecast
# fan (level + h·trend + seasonal) per series plus the in-sample
# error mass.

_HW_ALPHA, _HW_BETA, _HW_GAMMA = 0.3, 0.05, 0.2

_HW_ORACLE = f"""
WITH RECURSIVE bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS mn, MAX(CAST(ts AS DATE)) AS mx FROM events
),
days AS (
  SELECT CAST(UNNEST(generate_series(mn::TIMESTAMP, mx::TIMESTAMP,
                                     INTERVAL 1 DAY)) AS DATE) AS d
  FROM bounds
),
types AS (SELECT DISTINCT event_type FROM events),
grid AS (SELECT t.event_type, d.d FROM types t CROSS JOIN days d),
counts AS (
  SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
),
series AS (
  SELECT g.event_type, g.d, CAST(COALESCE(c.n, 0) AS DOUBLE) AS n
  FROM grid g LEFT JOIN counts c
    ON c.event_type = g.event_type AND c.d = g.d
),
vals AS (
  SELECT event_type, LIST(n ORDER BY d) AS xs, COUNT(*)::INT AS nday
  FROM series GROUP BY event_type HAVING COUNT(*) >= 15
),
init AS (
  SELECT event_type, xs, nday,
         ROUND(list_aggregate(xs[1:7], 'sum') / 7.0, 9) AS w1
  FROM vals
),
state0 AS (
  SELECT event_type, xs, nday,
         w1 AS lvl,
         ROUND((list_aggregate(xs[8:14], 'sum') / 7.0 - w1) / 7.0, 9) AS tr,
         list_transform(xs[1:7], v -> ROUND(v - w1, 9)) AS seas
  FROM init
),
rec AS (
  SELECT event_type, xs, nday, 7 AS t, lvl, tr, seas, 0::BIGINT AS sae
  FROM state0
  UNION ALL
  SELECT event_type, xs, nday, t + 1,
    ROUND({_HW_ALPHA} * (xs[t+1] - seas[1])
          + {1 - _HW_ALPHA} * (lvl + tr), 9),
    ROUND({_HW_BETA} * (ROUND({_HW_ALPHA} * (xs[t+1] - seas[1])
                              + {1 - _HW_ALPHA} * (lvl + tr), 9) - lvl)
          + {1 - _HW_BETA} * tr, 9),
    list_append(seas[2:7],
      ROUND({_HW_GAMMA} * (xs[t+1]
                           - ROUND({_HW_ALPHA} * (xs[t+1] - seas[1])
                                   + {1 - _HW_ALPHA} * (lvl + tr), 9))
            + {1 - _HW_GAMMA} * seas[1], 9)),
    sae + CAST(ROUND(1000000 * ABS(xs[t+1] - (lvl + tr + seas[1])), 0)
               AS BIGINT)
  FROM rec WHERE t < nday
),
final AS (SELECT * FROM rec WHERE t = nday)
SELECT f.event_type, h.h::INT AS h,
       ROUND(f.lvl + h.h * f.tr + f.seas[h.h], 4) AS forecast,
       f.sae AS sae_micro,
       (f.nday - 7)::BIGINT AS n_fit
FROM final f, UNNEST(generate_series(1, 7)) AS h(h)
ORDER BY f.event_type, h
"""


@register(
    "q_holt_winters",
    oracle=_HW_ORACLE,
    doc="Holt-Winters additive seasonal smoothing (E207): per-series "
    "(level, trend, 7-slot seasonal queue) recursion folded as ONE "
    "F.aggregate over the calendar-densified daily array — sequential "
    "in time, embarrassingly parallel across series; 9dp-requantized "
    "trajectory + micro-unit integerized one-step errors (the E143 "
    "discipline), recursive-CTE oracle replays the identical fold; "
    "7-day forecast fan per event type",
)
def q_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select("event_type", F.col("ts").cast("date").alias("d"))
    bounds = daily.agg(F.min("d").alias("__mn"), F.max("d").alias("__mx"))
    days = bounds.select(F.explode(F.sequence("__mn", "__mx")).alias("d"))
    types = daily.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(days))
    counts = daily.groupBy("event_type", "d").agg(F.count("*").alias("n"))
    series = grid.join(counts, ["event_type", "d"], "left").select(
        "event_type",
        "d",
        F.coalesce("n", F.lit(0)).cast("double").alias("n"),
    )
    vals = (
        series.groupBy("event_type")
        .agg(
            F.array_sort(F.collect_list(F.struct("d", "n"))).alias("pairs"),
            F.count("*").alias("T"),
        )
        .filter(F.col("T") >= 15)
        .select(
            "event_type",
            F.col("pairs.n").alias("xs"),
            F.col("T").cast("int").alias("T"),
        )
    )
    a, b, g = _HW_ALPHA, _HW_BETA, _HW_GAMMA
    folded = vals.withColumn(
        "st",
        F.expr(
            f"""
aggregate(
  slice(xs, 8, T - 7),
  named_struct(
    'lvl', round(aggregate(slice(xs, 1, 7), 0D, (s, v) -> s + v) / 7.0, 9),
    'tr', round((aggregate(slice(xs, 8, 7), 0D, (s, v) -> s + v) / 7.0
                 - round(aggregate(slice(xs, 1, 7), 0D, (s, v) -> s + v)
                         / 7.0, 9)) / 7.0, 9),
    'seas', transform(slice(xs, 1, 7),
              v -> round(v - round(aggregate(slice(xs, 1, 7), 0D,
                                             (s, v2) -> s + v2) / 7.0, 9), 9)),
    'sae', 0L
  ),
  (st, x) -> named_struct(
    'lvl', round({a} * (x - element_at(st.seas, 1))
                 + {1 - a} * (st.lvl + st.tr), 9),
    'tr', round({b} * (round({a} * (x - element_at(st.seas, 1))
                             + {1 - a} * (st.lvl + st.tr), 9) - st.lvl)
                + {1 - b} * st.tr, 9),
    'seas', concat(slice(st.seas, 2, 6),
              array(round({g} * (x - round({a} * (x - element_at(st.seas, 1))
                                           + {1 - a} * (st.lvl + st.tr), 9))
                          + {1 - g} * element_at(st.seas, 1), 9))),
    'sae', st.sae + cast(round(1000000 * abs(
             x - (st.lvl + st.tr + element_at(st.seas, 1))), 0) as long)
  )
)
"""
        ),
    )
    h = F.explode(F.sequence(F.lit(1), F.lit(7))).alias("h")
    return (
        folded.select("event_type", "T", "st", h)
        .select(
            "event_type",
            F.col("h").cast("int").alias("h"),
            F.round(
                F.col("st.lvl")
                + F.col("h") * F.col("st.tr")
                + F.element_at("st.seas", F.col("h")),
                4,
            ).alias("forecast"),
            F.col("st.sae").alias("sae_micro"),
            (F.col("T") - 7).cast("long").alias("n_fit"),
        )
        .orderBy("event_type", "h")
    )
