"""Relational operator surface (SURVEY.md §2.2-2.6 DELEG).

The reference delegates all row-level relational work to its SQL backends
(MSSQL executes extraction SQL, BigQuery executes downstream analytics);
our engine exposes that surface as first-class Catalyst-optimized
DataFrame plans. Each query here is one operator family's t2 entry:
scan → filter → agg (Q1), multi-way joins (Q3/Q5), top-k, windows,
set ops, semi/anti joins, distinct, rollup, pivot, multi-agg introspection.

Scale notes (100 TB):
- dimension joins (region/nation/supplier/customer) are explicitly
  broadcast — no shuffle of the fact table for dimension enrichment;
- fact-fact joins (orders⋈lineitem) shuffle on the join key once and AQE
  coalesces/splits skewed partitions at runtime;
- aggregations are partial (map-side combine) by construction in Spark's
  hash-agg; filters sit directly on the scan so parquet row-group pruning
  and predicate pushdown engage (verified in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.sources import load_table

# ---------------------------------------------------------------------------
# Q1-style pricing summary — the flagship: scan → filter → hash-agg → sort.
# ---------------------------------------------------------------------------

_Q01_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 4)                                        AS sum_qty,
  ROUND(SUM(l_extendedprice), 4)                                   AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)  AS sum_charge,
  ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
  ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
  ROUND(AVG(l_discount), 4)                                        AS avg_disc,
  COUNT(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register(
    "q01_pricing_summary",
    oracle=_Q01_ORACLE,
    doc="TPC-H Q1 shape: filter+groupBy+8 aggs (SURVEY A1/A2 DELEG surface)",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(charge), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Q3-style shipping priority — broadcast dim join + fact-fact shuffle join
# + group + deterministic top-k.
# ---------------------------------------------------------------------------

_Q03_ORACLE = """
SELECT
  l_orderkey,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
  STRFTIME(o_orderdate, '%Y-%m-%d')                 AS orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register(
    "q03_shipping_priority",
    oracle=_Q03_ORACLE,
    doc="3-way join + agg + top-k; customer dim broadcast, orders⋈lineitem shuffled on key",
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q5-style local supplier volume — 6-way star join, all dims broadcast.
# ---------------------------------------------------------------------------

_Q05_ORACLE = """
SELECT
  n_name,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer
JOIN orders   ON c_custkey   = o_custkey
JOIN lineitem ON l_orderkey  = o_orderkey
JOIN supplier ON l_suppkey   = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@register(
    "q05_local_supplier_volume",
    oracle=_Q05_ORACLE,
    doc="6-way star join: fact shuffle on orderkey, every dim broadcast",
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {n: load_table(spark, sf_dir, n) for n in ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp_ntz"))
    )
    region = t["region"].filter(F.col("r_name") == "ASIA")
    return (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


# ---------------------------------------------------------------------------
# Top-k: global orderBy + limit (Spark executes as TakeOrderedAndProject —
# per-partition heaps + driver merge; no full sort at scale).
# ---------------------------------------------------------------------------

_TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 4) AS totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
"""


@register(
    "q_topk_orders",
    oracle=_TOPK_ORACLE,
    doc="ORDER BY + LIMIT → TakeOrderedAndProject, the scale-safe top-k (SURVEY §2.5 DELEG)",
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 4).alias("totalprice"))
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Window functions: rank per group (top-3 customers per market segment by
# account balance) — partitioned window, no global sort.
# ---------------------------------------------------------------------------

_WINDOW_RANK_ORACLE = """
SELECT c_mktsegment, c_custkey, ROUND(c_acctbal, 4) AS acctbal, rnk
FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS rnk
  FROM customer
)
WHERE rnk <= 3
ORDER BY c_mktsegment, rnk
"""


@register(
    "q_window_rank_per_segment",
    oracle=_WINDOW_RANK_ORACLE,
    doc="ROW_NUMBER over partitioned window → top-3 per group (SURVEY §2.4 DELEG)",
)
def q_window_rank_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        load_table(spark, sf_dir, "customer")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "c_mktsegment",
            "c_custkey",
            F.round("c_acctbal", 4).alias("acctbal"),
            "rnk",
        )
        .orderBy("c_mktsegment", "rnk")
    )


# ---------------------------------------------------------------------------
# Window functions: running total + lag within a customer's order history.
# ---------------------------------------------------------------------------

_WINDOW_RUNNING_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
    AS running_spend,
  ROUND(COALESCE(LAG(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey), 0.0), 4)
    AS prev_price
FROM orders
WHERE o_custkey <= 50
ORDER BY o_custkey, o_orderkey
"""


@register(
    "q_window_running_total",
    oracle=_WINDOW_RUNNING_ORACLE,
    doc="cumulative SUM + LAG over partitioned ordered window (SURVEY §2.4 DELEG)",
)
def q_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(
                F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
                4,
            ).alias("running_spend"),
            F.round(F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)), 4).alias(
                "prev_price"
            ),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# Set operations: UNION / INTERSECT / EXCEPT over derived key sets.
# ---------------------------------------------------------------------------

_SETOPS_ORACLE = """
WITH big_spenders AS (
  SELECT o_custkey AS custkey FROM orders GROUP BY o_custkey
  HAVING SUM(o_totalprice) > 150000
),
urgent_buyers AS (
  SELECT DISTINCT o_custkey AS custkey FROM orders
  WHERE o_orderpriority = '1-URGENT'
)
SELECT 'union' AS op, COUNT(*) AS n
  FROM (SELECT custkey FROM big_spenders UNION SELECT custkey FROM urgent_buyers)
UNION ALL
SELECT 'intersect' AS op, COUNT(*) AS n
  FROM (SELECT custkey FROM big_spenders INTERSECT SELECT custkey FROM urgent_buyers)
UNION ALL
SELECT 'except' AS op, COUNT(*) AS n
  FROM (SELECT custkey FROM big_spenders EXCEPT SELECT custkey FROM urgent_buyers)
ORDER BY op
"""


@register(
    "q_setops_customers",
    oracle=_SETOPS_ORACLE,
    doc="union/intersect/except distinct semantics (SURVEY §2.5 DELEG)",
)
def q_setops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    big = (
        orders.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("spend"))
        .filter(F.col("spend") > 150000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    spark_union = big.union(urgent).distinct()
    rows = [
        spark_union.agg(F.count("*").alias("n")).withColumn("op", F.lit("union")),
        big.intersect(urgent).agg(F.count("*").alias("n")).withColumn("op", F.lit("intersect")),
        big.exceptAll(urgent.distinct())
        .distinct()
        .agg(F.count("*").alias("n"))
        .withColumn("op", F.lit("except")),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.union(r)
    return out.select("op", "n").orderBy("op")


# ---------------------------------------------------------------------------
# Semi / anti joins — the reference's reconcile (P5) and incremental
# selection (P6) are exactly these shapes.
# ---------------------------------------------------------------------------

_SEMI_ANTI_ORACLE = """
SELECT 'with_orders' AS bucket, COUNT(*) AS n
  FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
UNION ALL
SELECT 'without_orders' AS bucket, COUNT(*) AS n
  FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
ORDER BY bucket
"""


@register(
    "q_semi_anti_join",
    oracle=_SEMI_ANTI_ORACLE,
    doc="left_semi / left_anti joins (SURVEY P5/P6: reconcile + incremental selection)",
)
def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    on = F.col("c_custkey") == F.col("o_custkey")
    semi = (
        cust.join(orders, on, "left_semi")
        .agg(F.count("*").alias("n"))
        .withColumn("bucket", F.lit("with_orders"))
    )
    anti = (
        cust.join(orders, on, "left_anti")
        .agg(F.count("*").alias("n"))
        .withColumn("bucket", F.lit("without_orders"))
    )
    return semi.union(anti).select("bucket", "n").orderBy("bucket")


# ---------------------------------------------------------------------------
# DISTINCT (SURVEY A5) + multi-agg introspection (SURVEY A1): the planner's
# min/max/count probe expressed as a query.
# ---------------------------------------------------------------------------

_DISTINCT_ORACLE = """
SELECT DISTINCT l_returnflag, l_linestatus
FROM lineitem
ORDER BY l_returnflag, l_linestatus
"""


@register(
    "q_distinct_flags",
    oracle=_DISTINCT_ORACLE,
    doc="DISTINCT over group keys (SURVEY A5)",
)
def q_distinct_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    )


_INTROSPECT_ORACLE = """
SELECT
  MIN(o_orderkey) AS min_pk,
  MAX(o_orderkey) AS max_pk,
  COUNT(*)        AS n_rows,
  COUNT(DISTINCT o_custkey) AS n_custkeys
FROM orders
"""


@register(
    "q_introspect_minmax",
    oracle=_INTROSPECT_ORACLE,
    doc="single-pass min/max/count introspection (SURVEY A1, pipeline.py:328-339 parity)",
)
def q_introspect_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").agg(
        F.min("o_orderkey").alias("min_pk"),
        F.max("o_orderkey").alias("max_pk"),
        F.count("*").alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_custkeys"),
    )


# ---------------------------------------------------------------------------
# ROLLUP with grouping id — multi-level aggregation in one pass.
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = """
SELECT
  COALESCE(l_returnflag, '<all>') AS returnflag,
  COALESCE(l_linestatus, '<all>') AS linestatus,
  GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
  ROUND(SUM(l_quantity), 4) AS sum_qty,
  COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY gid, returnflag, linestatus
"""


@register(
    "q_rollup_quantity",
    oracle=_ROLLUP_ORACLE,
    doc="ROLLUP + GROUPING() multi-level agg (SURVEY §2.3 DELEG)",
)
def q_rollup_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "gid",
            "sum_qty",
            "n",
        )
        .orderBy("gid", "returnflag", "linestatus")
    )


# ---------------------------------------------------------------------------
# PIVOT — conditional aggregation, expressed with .pivot() on the Spark
# side and FILTER-agg on the oracle side (identical semantics).
# ---------------------------------------------------------------------------

_PIVOT_ORACLE = """
SELECT
  l_returnflag,
  ROUND(COALESCE(SUM(l_quantity) FILTER (WHERE l_linestatus = 'O'), 0.0), 4) AS qty_open,
  ROUND(COALESCE(SUM(l_quantity) FILTER (WHERE l_linestatus = 'F'), 0.0), 4) AS qty_filled
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register(
    "q_pivot_linestatus",
    oracle=_PIVOT_ORACLE,
    doc="pivot on low-cardinality column with pinned values (SURVEY §2.3 DELEG)",
)
def q_pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity"))
        .select(
            "l_returnflag",
            F.round(F.coalesce(F.col("O"), F.lit(0.0)), 4).alias("qty_open"),
            F.round(F.coalesce(F.col("F"), F.lit(0.0)), 4).alias("qty_filled"),
        )
        .orderBy("l_returnflag")
    )
