"""Subquery surface (SURVEY §2.5 DELEG): correlated EXISTS, NOT IN with
null semantics, and scalar subqueries — Catalyst decorrelates all three
into joins (semi/anti/cross-aggregate), asserted by running the same ANSI
SQL in Spark and DuckDB."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dumpty_spark.queries import register
from dumpty_spark.sources import load_table

_EXISTS_SQL = """
SELECT c.c_mktsegment, COUNT(*) AS n_customers
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000
)
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


@register(
    "q_exists_subquery",
    oracle=_EXISTS_SQL,
    doc="correlated EXISTS → decorrelated to a left-semi join by Catalyst",
)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_EXISTS_SQL)


_NOTIN_SQL = """
SELECT COUNT(*) AS n_never_urgent
FROM customer c
WHERE c.c_custkey NOT IN (
  SELECT o.o_custkey FROM orders o WHERE o.o_orderpriority = '1-URGENT'
)
"""


@register(
    "q_not_in_subquery",
    oracle=_NOTIN_SQL,
    doc="NOT IN subquery (null-aware anti join)",
)
def q_not_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_NOTIN_SQL)


_SCALAR_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_above_avg
FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "q_scalar_subquery",
    oracle=_SCALAR_SQL,
    doc="uncorrelated scalar subquery (global average) as a filter bound",
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SCALAR_SQL)
