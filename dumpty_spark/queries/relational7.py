"""Round-4 relational extensions: rolling Bollinger bands (E81)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E81: rolling Bollinger bands — windowed mean ± k·σ breach detection
# ---------------------------------------------------------------------------
# The classic rolling-volatility screen (Bollinger, public methodology):
# over each series ordered by time, a trailing 25-row window yields
# mean and population σ; a point breaching mean ± 2σ is an excursion.
# Pure window frames — the whole computation is one sort-shuffle per
# series partition, no self-joins, no UDFs; at 100 TB the partition key
# (event_type here; a (series, day) composite in practice) bounds every
# window to one task's range scan.

_BOLLINGER_ORACLE = """
WITH w AS (
  SELECT event_type, ts, value,
         AVG(value) OVER win AS mu,
         COALESCE(STDDEV_POP(value) OVER win, 0.0) AS sigma,
         COUNT(*) OVER win AS n_win
  FROM events
  WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN 24 PRECEDING AND CURRENT ROW)
)
SELECT event_type,
       COUNT(*)::BIGINT AS n,
       SUM(CASE WHEN n_win = 25 AND ABS(value - mu) > 2 * sigma
                THEN 1 ELSE 0 END)::BIGINT AS n_breaches,
       ROUND(AVG(sigma), 4) AS avg_sigma
FROM w
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q_rolling_bollinger",
    oracle=_BOLLINGER_ORACLE,
    doc="rolling Bollinger bands (E81): trailing 25-row mean ± 2σ per "
    "series (ordered by ts with event_id tie-break — total order, so "
    "both engines frame identically), breaches counted only on full "
    "windows; one sort-shuffle per series, window frames end-to-end",
)
def q_rolling_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    )
    win = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-24, 0)
    )
    w = ev.select(
        "event_type",
        "value",
        F.avg("value").over(win).alias("mu"),
        F.coalesce(F.stddev_pop("value").over(win), F.lit(0.0)).alias("sigma"),
        F.count("*").over(win).alias("n_win"),
    )
    return (
        w.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(
                    (F.col("n_win") == 25)
                    & (F.abs(F.col("value") - F.col("mu")) > 2 * F.col("sigma")),
                    1,
                ).otherwise(0)
            ).alias("n_breaches"),
            F.round(F.avg("sigma"), 4).alias("avg_sigma"),
        )
        .orderBy("event_type")
    )
