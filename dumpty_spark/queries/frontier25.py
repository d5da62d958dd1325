"""Round-7 engine extensions, thirteenth batch (EXT E188): the
Mantel-Haenszel pooled odds ratio — stratified association for the
experimentation family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E188: Mantel-Haenszel pooled odds ratio
# ---------------------------------------------------------------------------
# "Is the weekend/purchase association real, or is it Simpson's paradox
# across user segments?" — the stratified 2x2 question every
# observational readout hits. Per stratum (user-id % 5 segments) the
# 2x2 is (weekend x purchase) over events; the MH estimator pools
# OR_MH = sum(a_i*d_i/n_i) / sum(b_i*c_i/n_i) — weights each stratum by
# precision without fitting a model — next to the crude (collapsed) OR
# so confounding shows as the gap between them. One stacked-agg scan
# builds every stratum's four cells; everything downstream is
# strata-sized. 6dp rounding on the two ratios only (cells are exact
# integers).

_MH_ORACLE = """
WITH e AS (
  SELECT user_id % 5 AS stratum,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS wknd,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
cells AS (
  SELECT stratum,
         SUM(CASE WHEN wknd = 1 AND y = 1 THEN 1 ELSE 0 END)::DOUBLE AS a,
         SUM(CASE WHEN wknd = 1 AND y = 0 THEN 1 ELSE 0 END)::DOUBLE AS b,
         SUM(CASE WHEN wknd = 0 AND y = 1 THEN 1 ELSE 0 END)::DOUBLE AS c,
         SUM(CASE WHEN wknd = 0 AND y = 0 THEN 1 ELSE 0 END)::DOUBLE AS d
  FROM e GROUP BY stratum
),
mh AS (
  SELECT SUM(a * d / (a + b + c + d)) AS num,
         SUM(b * c / (a + b + c + d)) AS den,
         SUM(a) AS ta, SUM(b) AS tb, SUM(c) AS tc, SUM(d) AS td,
         COUNT(*)::BIGINT AS n_strata
  FROM cells
)
SELECT n_strata,
       ROUND(num / den, 6) AS or_mh,
       ROUND((ta * td) / (tb * tc), 6) AS or_crude,
       (ta + tb + tc + td)::BIGINT AS n_events
FROM mh
"""


@register(
    "q_mh_odds_ratio",
    oracle=_MH_ORACLE,
    doc="Mantel-Haenszel pooled odds ratio (E188): weekend x purchase "
    "2x2 per user-segment stratum, pooled OR_MH = sum(ad/n)/sum(bc/n) "
    "next to the crude collapsed OR (the gap IS the confounding) — the "
    "Simpson's-paradox-proof association readout; one stacked-agg scan, "
    "strata-sized downstream, integer cells",
)
def q_mh_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # DuckDB dayofweek: 0=Sunday..6=Saturday; Spark dayofweek: 1=Sunday..
    wknd = F.dayofweek("ts").isin(1, 7).cast("int")
    y = (F.col("event_type") == "purchase").cast("int")
    e = ev.select(
        (F.col("user_id") % 5).alias("stratum"),
        wknd.alias("wknd"),
        y.alias("y"),
    )
    cells = e.groupBy("stratum").agg(
        F.sum(((F.col("wknd") == 1) & (F.col("y") == 1)).cast("int"))
        .cast("double")
        .alias("a"),
        F.sum(((F.col("wknd") == 1) & (F.col("y") == 0)).cast("int"))
        .cast("double")
        .alias("b"),
        F.sum(((F.col("wknd") == 0) & (F.col("y") == 1)).cast("int"))
        .cast("double")
        .alias("c"),
        F.sum(((F.col("wknd") == 0) & (F.col("y") == 0)).cast("int"))
        .cast("double")
        .alias("d"),
    )
    n = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    return cells.agg(
        F.count("*").alias("n_strata"),
        F.round(
            F.sum(F.col("a") * F.col("d") / n)
            / F.sum(F.col("b") * F.col("c") / n),
            6,
        ).alias("or_mh"),
        F.round(
            (F.sum("a") * F.sum("d")) / (F.sum("b") * F.sum("c")), 6
        ).alias("or_crude"),
        (F.sum("a") + F.sum("b") + F.sum("c") + F.sum("d"))
        .cast("long")
        .alias("n_events"),
    )
