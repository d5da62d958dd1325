"""Third relational batch — the remaining classic TPC-H query *shapes*
expressible on the reduced fixture schema (SURVEY §2.5 DELEG: the
reference delegates all relational joins/aggregates to its SQL backends;
these exercise the join-strategy corners the first batches don't:
outer-join distributions, decorrelated per-group scalar subqueries,
disjunctive predicate pushdown, anti-join + global scalar gate, and a
multi-hop fact/dim chain with a pair-symmetric filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.sources import load_table

# ---------------------------------------------------------------------------
# TPC-H Q13 shape: how many customers placed 0, 1, 2, ... orders. The
# left outer join keeps zero-order customers; the double aggregation is
# two shuffles (by c_custkey, then by n_orders) — the second input is one
# row per customer, so AQE coalesces it to a handful of partitions.
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
SELECT n_orders, COUNT(*) AS n_customers
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS n_orders
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY n_orders
ORDER BY n_customers DESC, n_orders DESC
"""


@register(
    "q13_customer_distribution",
    oracle=_Q13_ORACLE,
    doc="TPC-H Q13 shape: left-outer join + double aggregation "
    "(order-count histogram over customers, zero-order bin included)",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count("*").alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: items ordered in quantities below 20% of that part's
# average. The correlated scalar subquery decorrelates to a per-part
# aggregate joined back — in Spark we write the decorrelated form
# directly (groupBy l_partkey, then join), which is exactly the plan
# Catalyst would rewrite the subquery into. The per-part aggregate is
# partial (map-side combine) so the shuffle carries one row per part.
# ---------------------------------------------------------------------------

_Q17_ORACLE = """
SELECT ROUND(SUM(l_extendedprice) / 7.0, 4) AS avg_yearly,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand IN ('Brand#1', 'Brand#2')
  AND l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity)
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""


@register(
    "q17_small_quantity",
    oracle=_Q17_ORACLE,
    doc="TPC-H Q17 shape: correlated scalar subquery, written decorrelated "
    "(per-part avg joined back) — the Spark-idiomatic plan",
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_cutoff")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cutoff"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive multi-column predicates. All three OR arms
# reference both sides, so the filter runs post-join, but the
# part-side-only implications (brand/size) and lineitem-side bounds
# (l_quantity >= 1) are what a pushdown-aware planner extracts; part
# broadcasts so the only data movement is the lineitem scan.
# ---------------------------------------------------------------------------

_Q19_ORACLE = """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#4' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_size BETWEEN 25 AND 50 AND l_quantity >= 25)
"""


@register(
    "q19_disjunctive_revenue",
    oracle=_Q19_ORACLE,
    doc="TPC-H Q19 shape: three-arm OR predicate across joined tables "
    "with broadcast dim",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    arm1 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    )
    arm2 = (
        (F.col("p_brand") == "Brand#4")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 20)
    )
    arm3 = F.col("p_size").between(25, 50) & (F.col("l_quantity") >= 25)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(arm1 | arm2 | arm3)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: wealthy customers with no urgent orders, by nation.
# The global average is a scalar broadcast (one row), the "no urgent
# order" gate is a left-anti join against the filtered orders fact — no
# correlated execution anywhere. (The classic "never ordered at all"
# predicate is degenerate on this fixture: every customer has orders.)
# ---------------------------------------------------------------------------

_Q22_ORACLE = """
SELECT n_name,
       COUNT(*) AS n_cust,
       ROUND(SUM(c_acctbal), 4) AS total_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY n_name
ORDER BY n_name
"""


@register(
    "q22_idle_customers",
    oracle=_Q22_ORACLE,
    doc="TPC-H Q22 shape: scalar-subquery gate + anti join + dim rollup",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    nation = load_table(spark, sf_dir, "nation")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("ab"))
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.sum("c_acctbal"), 4).alias("total_bal"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# TPC-H Q7 shape: shipping volume between two nations by year. Five joins:
# lineitem is the only fact that shuffles (against orders); supplier,
# customer, and both nation legs broadcast. The symmetric pair filter
# ((s=A and c=B) or (s=B and c=A)) lands after the dim joins.
# ---------------------------------------------------------------------------

_Q07_ORACLE = """
SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 4) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         YEAR(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register(
    "q07_nation_volume",
    oracle=_Q07_ORACLE,
    doc="TPC-H Q7 shape: 5-way join chain, one fact-fact shuffle + four "
    "broadcast dims, symmetric nation-pair filter, rollup by year",
)
def q07_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# TPC-H Q4 shape: order-priority distribution of orders with at least one
# late-shipping line. The correlated EXISTS compares an inner column to
# an OUTER column (l_shipdate > o_orderdate + 30), which Spark executes
# as a left-semi join with a non-equi conjunct on top of the key equality.
# ---------------------------------------------------------------------------

_Q04_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "q04_priority_check",
    oracle=_Q04_ORACLE,
    doc="TPC-H Q4 shape: correlated EXISTS with inner-vs-outer column "
    "comparison → left-semi join with non-equi conjunct",
)
def q04_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# TPC-H Q15 shape: the supplier(s) achieving the maximum quarterly
# revenue. The revenue rollup is computed once and reused for both the
# scalar MAX and the equality gate — in Spark, a cached/derived frame
# joined against its own aggregate (broadcast one-row max).
# ---------------------------------------------------------------------------

_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, ROUND(total_rev, 4) AS total_rev
FROM supplier
JOIN revenue ON s_suppkey = l_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
ORDER BY s_suppkey
"""


@register(
    "q15_top_supplier",
    oracle=_Q15_ORACLE,
    doc="TPC-H Q15 shape: derived revenue view reused for scalar-max gate "
    "+ equality filter (ties kept), supplier dim broadcast",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    supp = load_table(spark, sf_dir, "supplier")
    # materialize the rollup ONCE: the frame feeds both the scalar max
    # and the equality gate, and two independent evaluations could merge
    # float partials in different orders — a 1-ULP difference would drop
    # the top supplier (one row per suppkey: small at any SF)
    revenue = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "raw_rev"
            )
        )
        .localCheckpoint()
    )
    max_rev = revenue.agg(F.max("raw_rev").alias("mx"))
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("raw_rev") == F.col("mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.round("raw_rev", 4).alias("total_rev"))
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: a nation's market share inside one region for one part
# type — the widest join tree expressible on the fixtures (7 tables:
# lineitem ⋈ orders is the only fact-fact shuffle; part, supplier,
# customer, nation×2, region all broadcast). The region filter reaches
# the customer side through two broadcast hops BEFORE the fact shuffle,
# so the shuffled volume is already region-pruned; the share itself is a
# conditional-sum ratio per order year.
# ---------------------------------------------------------------------------

_Q08_ORACLE = """
SELECT o_year,
       ROUND(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0 END)
             / SUM(volume), 6) AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o_orderdate)::BIGINT AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
    AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate <  TIMESTAMP '1999-01-01'
)
GROUP BY o_year
ORDER BY o_year
"""


@register(
    "q08_market_share",
    oracle=_Q08_ORACLE,
    doc="TPC-H Q8 shape: national market share — 7-table join tree, one "
    "fact-fact shuffle, six broadcast dims, conditional-sum ratio by year",
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1999-01-01")
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    supp = load_table(spark, sf_dir, "supplier")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    # region-prune customers driver-free: customer ⋈ nation ⋈ region are
    # all broadcast, so the orders side of the fact shuffle only carries
    # ASIA customers' orders
    asia_cust = (
        cust.join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    share_num = F.when(F.col("supp_nation") == "NATION_2", volume).otherwise(0.0)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            orders.join(F.broadcast(asia_cust), F.col("o_custkey") == F.col("c_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(share_num) / F.sum(volume), 6).alias("mkt_share"))
        .orderBy("o_year")
    )
