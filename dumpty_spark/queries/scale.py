"""Scale-strategy t2 queries: skew-salted join (semantics-preserving, so
fully oracle-checked) and sketch-based approximate distinct counting."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.operators.joins import salted_join
from dumpty_spark.queries import register
from dumpty_spark.sources import load_table

_SALTED_ORACLE = """
SELECT o.o_orderpriority,
       COUNT(*) AS n_items,
       ROUND(SUM(l.l_quantity), 2) AS sum_qty
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@register(
    "q_salted_join",
    oracle=_SALTED_ORACLE,
    doc="skew-salted fact-dim join: large side salted over 8 sub-keys, "
    "small side replicated 8x — identical semantics to the plain join "
    "(the oracle IS the plain join), hot keys spread over 8 tasks",
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "okey"
    )
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "okey"
    )
    joined = salted_join(
        li, orders.select("okey", "o_orderpriority"), on=["okey"], salt_buckets=8
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q_approx_distinct",
    oracle=None,  # HLL++ estimates are engine-specific; the ±2% error
    # bound vs exact COUNT(DISTINCT) is asserted in tests/test_scale_ops.py
    doc="HyperLogLog++ approximate distinct counts per group — the "
    "constant-memory path for 100 TB cardinality estimation",
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type")
    )
