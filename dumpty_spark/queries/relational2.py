"""Second relational batch: outer/cross joins, scalar function coverage
(SURVEY §2.6 DELEG), conditional aggregation, exact percentiles, CUBE,
LIMIT/OFFSET, and the Pandas-UDF surface (§2.8) with an oracle."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.sources import load_table

# ---------------------------------------------------------------------------
# Outer join with null-handling: every customer's order count, including
# zero-order customers (left outer), plus the orphan check (full outer
# would surface orders with no customer — none in the fixture).
# ---------------------------------------------------------------------------

_OUTER_ORACLE = """
SELECT c_custkey,
       COALESCE(n_orders, 0) AS n_orders,
       ROUND(COALESCE(spend, 0.0), 4) AS spend
FROM customer
LEFT JOIN (
  SELECT o_custkey, COUNT(*) AS n_orders, SUM(o_totalprice) AS spend
  FROM orders GROUP BY o_custkey
) o ON c_custkey = o_custkey
WHERE c_custkey <= 100
ORDER BY c_custkey
"""


@register(
    "q_outer_join_counts",
    oracle=_OUTER_ORACLE,
    doc="left outer join + COALESCE null handling (SURVEY §2.5 DELEG)",
)
def q_outer_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), F.sum("o_totalprice").alias("spend"))
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(
            "c_custkey",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.round(F.coalesce("spend", F.lit(0.0)), 4).alias("spend"),
        )
        .orderBy("c_custkey")
    )


_CROSS_ORACLE = """
SELECT r1.r_name AS from_region, r2.r_name AS to_region
FROM region r1 CROSS JOIN region r2
WHERE r1.r_regionkey != r2.r_regionkey
ORDER BY from_region, to_region
"""


@register(
    "q_cross_join_regions",
    oracle=_CROSS_ORACLE,
    doc="explicit cross join (SURVEY §2.5 DELEG)",
)
def q_cross_join_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    r1 = r.select(F.col("r_regionkey").alias("k1"), F.col("r_name").alias("from_region"))
    r2 = r.select(F.col("r_regionkey").alias("k2"), F.col("r_name").alias("to_region"))
    return (
        r1.crossJoin(r2)
        .filter(F.col("k1") != F.col("k2"))
        .select("from_region", "to_region")
        .orderBy("from_region", "to_region")
    )


# ---------------------------------------------------------------------------
# Scalar string functions (F1-F6 surface + DELEG string inventory).
# ---------------------------------------------------------------------------

_STRING_ORACLE = """
SELECT p_partkey,
       UPPER(p_brand)                              AS brand_upper,
       SUBSTRING(p_name, 1, 10)                    AS name_prefix,
       CONCAT(p_brand, ':', p_type)                AS brand_type,
       REPLACE(LOWER(p_type), ' ', '_')            AS type_slug,
       LPAD(CAST(p_size AS VARCHAR), 4, '0')       AS size_padded,
       LENGTH(p_name)                              AS name_len,
       CASE WHEN p_retailprice > 1500 THEN 'premium'
            WHEN p_retailprice > 800  THEN 'standard'
            ELSE 'budget' END                      AS price_band
FROM part
WHERE p_partkey <= 50
ORDER BY p_partkey
"""


@register(
    "q_scalar_strings",
    oracle=_STRING_ORACLE,
    doc="string scalar functions: upper/substr/concat/replace/lpad/case (SURVEY §2.6)",
)
def q_scalar_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 50)
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.lower("p_type"), F.lit(" "), F.lit("_")).alias("type_slug"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.length("p_name").alias("name_len"),
        F.when(F.col("p_retailprice") > 1500, "premium")
        .when(F.col("p_retailprice") > 800, "standard")
        .otherwise("budget")
        .alias("price_band"),
    ).orderBy("p_partkey")


_NORMALIZE_ORACLE = """
SELECT DISTINCT p_type,
       LOWER(REGEXP_REPLACE(p_type, '[^a-zA-Z0-9]', '_', 'g')) AS type_normalized
FROM part
ORDER BY p_type
"""


@register(
    "q_normalize_data",
    oracle=_NORMALIZE_ORACLE,
    doc="identifier-normalization regex applied as a data function (SURVEY F1)",
)
def q_normalize_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            "p_type",
            F.lower(F.regexp_replace("p_type", "[^a-zA-Z0-9]", "_")).alias(
                "type_normalized"
            ),
        )
        .distinct()
        .orderBy("p_type")
    )


# ---------------------------------------------------------------------------
# Date arithmetic (SURVEY F4/F5).
# ---------------------------------------------------------------------------

_DATE_ORACLE = """
SELECT YEAR(o_orderdate)  AS y,
       QUARTER(o_orderdate) AS q,
       COUNT(*) AS n,
       CAST(MIN(DATE_DIFF('day', o_orderdate,
                TIMESTAMP '2002-01-01 00:00:00')) AS BIGINT) AS min_age_days,
       STRFTIME(MAX(o_orderdate + INTERVAL 90 DAY), '%Y-%m-%d') AS max_due
FROM orders
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register(
    "q_date_arithmetic",
    oracle=_DATE_ORACLE,
    doc="year/quarter extraction, datediff, interval add (SURVEY F5)",
)
def q_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("y"), F.quarter("o_orderdate").alias("q")
        )
        .agg(
            F.count("*").alias("n"),
            F.min(
                F.datediff(
                    F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")
                )
            )
            .cast("long")
            .alias("min_age_days"),
            F.date_format(
                F.max(F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")), "yyyy-MM-dd"
            ).alias("max_due"),
        )
        .orderBy("y", "q")
    )


# ---------------------------------------------------------------------------
# Conditional aggregation (FILTER / count_if) + exact percentiles.
# ---------------------------------------------------------------------------

_COND_ORACLE = """
SELECT o_orderstatus,
       COUNT(*) AS n,
       COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
       ROUND(SUM(o_totalprice) FILTER (WHERE YEAR(o_orderdate) = 1997), 4) AS rev_1997,
       ROUND(AVG(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END), 4) AS avg_low
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register(
    "q_conditional_agg",
    oracle=_COND_ORACLE,
    doc="FILTER-style conditional aggregation (SURVEY §2.3 DELEG)",
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
            F.round(
                F.sum(F.when(F.year("o_orderdate") == 1997, F.col("o_totalprice"))), 4
            ).alias("rev_1997"),
            F.round(
                F.avg(F.when(F.col("o_orderpriority") == "5-LOW", F.col("o_totalprice"))),
                4,
            ).alias("avg_low"),
        )
        .orderBy("o_orderstatus")
    )


_PCT_ORACLE = """
SELECT o_orderstatus,
       ROUND(QUANTILE_CONT(o_totalprice, 0.5), 4) AS median_price,
       ROUND(QUANTILE_CONT(o_totalprice, 0.9), 4) AS p90_price,
       ROUND(MIN(o_totalprice), 4) AS min_price,
       ROUND(MAX(o_totalprice), 4) AS max_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register(
    "q_percentiles",
    oracle=_PCT_ORACLE,
    doc="exact interpolated percentiles per group (SURVEY §2.3; approx_percentile is the scale path)",
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
            F.round(F.min("o_totalprice"), 4).alias("min_price"),
            F.round(F.max("o_totalprice"), 4).alias("max_price"),
        )
        .orderBy("o_orderstatus")
    )


_CUBE_ORACLE = """
SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
       COALESCE(l_linestatus, '<all>') AS linestatus,
       GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
       COUNT(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY gid, returnflag, linestatus
"""


@register(
    "q_cube_counts",
    oracle=_CUBE_ORACLE,
    doc="CUBE multi-dimensional aggregate with grouping id (SURVEY §2.3 DELEG)",
)
def q_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.grouping_id().alias("gid"), F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "gid",
            "n",
        )
        .orderBy("gid", "returnflag", "linestatus")
    )


_OFFSET_ORACLE = """
SELECT o_orderkey, ROUND(o_totalprice, 4) AS totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10 OFFSET 10
"""


@register(
    "q_limit_offset",
    oracle=_OFFSET_ORACLE,
    doc="deterministic pagination: ORDER BY + OFFSET + LIMIT (SURVEY §2.5)",
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", F.round("o_totalprice", 4).alias("totalprice"))
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .offset(10)
        .limit(10)
    )


# ---------------------------------------------------------------------------
# §2.8 UDF surface: grouped-map Pandas UDF (applyInPandas) computing
# per-group z-scores — Arrow-batched, oracle-checkable because z-score is
# plain SQL on the other side.
# ---------------------------------------------------------------------------

_ZSCORE_ORACLE = """
SELECT o_orderkey,
       ROUND((o_totalprice - AVG(o_totalprice) OVER (PARTITION BY o_orderstatus))
             / STDDEV_SAMP(o_totalprice) OVER (PARTITION BY o_orderstatus), 4) AS zscore
FROM orders
WHERE o_custkey <= 20
ORDER BY o_orderkey
"""


@register(
    "q_pandas_zscore",
    oracle=_ZSCORE_ORACLE,
    doc="grouped-map Pandas UDF (applyInPandas) z-score vs SQL window oracle (SURVEY §2.8)",
)
def q_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 20)

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf["o_totalprice"]
        return pd.DataFrame(
            {
                "o_orderkey": pdf["o_orderkey"],
                "zscore": ((s - s.mean()) / s.std(ddof=1)).round(4),
            }
        )

    return (
        orders.groupBy("o_orderstatus")
        .applyInPandas(zscore, schema="o_orderkey long, zscore double")
        .orderBy("o_orderkey")
    )


_UNPIVOT_ORACLE = """
SELECT l_orderkey, l_linenumber, metric, ROUND(val, 4) AS val
FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
      FROM lineitem WHERE l_orderkey < 40)
UNPIVOT (val FOR metric IN (l_quantity, l_discount, l_tax))
ORDER BY l_orderkey, l_linenumber, metric
"""


@register(
    "q_unpivot",
    oracle=_UNPIVOT_ORACLE,
    doc="unpivot/melt (wide→long) via DataFrame.unpivot — the inverse of "
    "q_pivot_linestatus; map-side Expand, no shuffle",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 40)
    return (
        li.unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_discount", "l_tax"],
            "metric",
            "raw_val",
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "metric",
            F.round("raw_val", 4).alias("val"),
        )
        .orderBy("l_orderkey", "l_linenumber", "metric")
    )


_Q06_ORACLE = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register(
    "q06_forecast_revenue",
    oracle=_Q06_ORACLE,
    doc="TPC-H Q6 shape: pure filter+agg — every predicate reaches the "
    "parquet scan (PushedFilters), zero shuffle beyond the final "
    "single-row combine",
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
            "revenue"
        ),
        F.count("*").alias("n_items"),
    )


_Q10_ORACLE = """
SELECT c_custkey, c_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       ROUND(c_acctbal, 4) AS acctbal,
       n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-04-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register(
    "q10_returned_items",
    oracle=_Q10_ORACLE,
    doc="TPC-H Q10 shape: fact-fact shuffle join (orders⋈lineitem) + two "
    "broadcast dimension joins (customer, nation) + top-20 on revenue — "
    "the canonical multi-join report at scale",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-04-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 4).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_LAG_LEAD_ORACLE = """
SELECT o_custkey, o_orderkey,
       ROUND(o_totalprice, 4) AS price,
       ROUND(LAG(o_totalprice)  OVER w, 4) AS prev_price,
       ROUND(LEAD(o_totalprice) OVER w, 4) AS next_price,
       ROUND((epoch(o_orderdate) -
              epoch(LAG(o_orderdate) OVER w)) / 86400.0, 4) AS days_since_prev
FROM orders
WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
"""


@register(
    "q_window_lag_lead",
    oracle=_LAG_LEAD_ORACLE,
    doc="lag/lead analytic windows (SURVEY §2.4 DELEG): per-customer "
    "previous/next order price and inter-order gap in days — partitioned "
    "window, unique (orderdate, orderkey) ordering for determinism",
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gap = (
        F.unix_timestamp("o_orderdate")
        - F.unix_timestamp(F.lag("o_orderdate").over(w))
    ) / 86400.0
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 4).alias("price"),
        F.round(F.lag("o_totalprice").over(w), 4).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 4).alias("next_price"),
        F.round(gap, 4).alias("days_since_prev"),
    ).orderBy("o_custkey", "o_orderkey")


_ARRAY_HOF_ORACLE = """
SELECT vec_id,
       len(list_filter(embedding, x -> x > 0)) AS n_pos,
       ROUND(list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
                         (a, b) -> a + b), 4) AS sum_sq,
       ROUND(list_max(list_transform(embedding::DOUBLE[], x -> abs(x))), 4)
         AS max_abs
FROM embeddings
WHERE vec_id < 100
ORDER BY vec_id
"""


@register(
    "q_array_hof",
    oracle=_ARRAY_HOF_ORACLE,
    doc="higher-order array functions (SURVEY §2.6 DELEG): filter / "
    "transform / aggregate / array_max lambdas — all codegen'd JVM-side, "
    "zero UDFs, zero shuffles (map-only plan)",
)
def q_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    v = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
        F.round(
            F.aggregate(
                F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, b: a + b
            ),
            4,
        ).alias("sum_sq"),
        F.round(F.array_max(F.transform(v, lambda x: F.abs(x))), 4).alias("max_abs"),
    ).orderBy("vec_id")


_Q14_ORACLE = """
SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'ECONOMY'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate <  TIMESTAMP '1996-04-01'
"""


@register(
    "q14_promo_revenue",
    oracle=_Q14_ORACLE,
    doc="TPC-H Q14 shape: fact⋈broadcast-dim + conditional-ratio global agg "
    "— the month filter reaches the lineitem scan, part broadcasts, one "
    "partial-agg combine",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    part = load_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "ECONOMY", disc).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(disc), 4).alias("promo_pct"),
            F.count("*").alias("n_items"),
        )
    )


_Q18_ORACLE = """
SELECT c_custkey, c_name, o_orderkey,
       STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
       ROUND(o_totalprice, 4) AS totalprice,
       ROUND(total_qty, 4) AS total_qty
FROM (
  SELECT l_orderkey, SUM(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
) big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY totalprice DESC, o_orderkey
LIMIT 25
"""


@register(
    "q18_large_orders",
    oracle=_Q18_ORACLE,
    doc="TPC-H Q18 shape: agg→HAVING→join chain — the quantity rollup "
    "shuffles once on l_orderkey, the HAVING prunes before any join, then "
    "orders/customer enrich and TakeOrdered picks the top 25",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .filter(F.col("raw_qty") > 150)
    )
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 4).alias("totalprice"),
            F.round("raw_qty", 4).alias("total_qty"),
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Distribution windows: percent_rank + cume_dist per market segment —
# the remaining analytic-window pair (SURVEY §2.4 DELEG). Both engines
# define them identically ((rank-1)/(n-1), n_le/n); rounded 6dp.

_PCTRANK_ORACLE = """
SELECT c_custkey, c_mktsegment,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
ORDER BY c_custkey
"""


@register(
    "q_percent_rank",
    oracle=_PCTRANK_ORACLE,
    doc="percent_rank + cume_dist over per-segment balance order — "
    "partitioned analytic windows, deterministic via key tie-break",
)
def q_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    ).orderBy("c_custkey")
