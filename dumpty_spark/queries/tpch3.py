"""Fourth relational batch — the 7 TPC-H shapes the reduced fixture schema
previously blocked (Q2/Q9/Q11/Q12/Q16/Q20/Q21), completing 22/22.

The fixtures lack partsupp and the lineitem commit/receipt/shipmode
columns, so this module DERIVES them deterministically from the columns
that do exist — pure integer arithmetic on the keys, expressed identically
in the Spark builders below and in the shared oracle CTE prologue
(`_CTES`), so both engines see the exact same extended tables:

  ps_suppkey     = (p_partkey*13 + j*29) % |supplier|,  j ∈ {0..3}
  ps_availqty    = (ps_partkey*7 + ps_suppkey*3) % 9999 + 1
  ps_supplycost  = ((ps_partkey*31 + ps_suppkey*17) % 100000)/100.0 + 1.0
  l_shipmode     = MODES[(l_orderkey + l_linenumber) % 7]
  l_commitdate   = date(l_shipdate) + ((l_orderkey*13 + l_linenumber*7) % 61 - 30)
  l_receiptdate  = date(l_shipdate) + ((l_orderkey*17 + l_linenumber*11) % 30 + 1)
  p_mfgr         = 'Manufacturer#' || (p_partkey % 5 + 1)
  s_complaint    = s_suppkey % 17 = 3        (the Q16 exclusion set)

Query shapes follow the public TPC-H spec (predicates adapted to the
fixture's value domains, e.g. p_type = 'PROMO' for '%BRASS', NATION_n for
named nations; missing address/phone/comment output columns dropped).
The reference (SURVEY §2 DELEG) delegates all of this to its SQL
backends; here each query is an idiomatic Catalyst plan — small dims
broadcast, facts shuffle on join keys, correlated subqueries
decorrelated into grouped joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.sources import load_table

MODES = ["REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB"]

# Shared oracle prologue: DuckDB binds CTEs lazily, so every oracle can
# carry the full set and only pay for the ones it references.
_CTES = """partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         (ps_partkey * 7 + ps_suppkey * 3) % 9999 + 1 AS ps_availqty,
         ((ps_partkey * 31 + ps_suppkey * 17) % 100000)::DOUBLE / 100.0 + 1.0
           AS ps_supplycost
  FROM (
    SELECT p_partkey AS ps_partkey,
           (p_partkey * 13 + j.j * 29) % (SELECT COUNT(*) FROM supplier)
             AS ps_suppkey
    FROM part, (VALUES (0),(1),(2),(3)) j(j)
  )
),
lineitem_ext AS (
  SELECT l.*,
         list_extract(['REG AIR','AIR','RAIL','SHIP','TRUCK','MAIL','FOB'],
                      ((l_orderkey + l_linenumber) % 7 + 1)::INT) AS l_shipmode,
         l_shipdate::DATE
           + ((l_orderkey * 13 + l_linenumber * 7) % 61 - 30)::INT
           AS l_commitdate,
         l_shipdate::DATE
           + ((l_orderkey * 17 + l_linenumber * 11) % 30 + 1)::INT
           AS l_receiptdate
  FROM lineitem l
),
part_ext AS (
  SELECT p.*, 'Manufacturer#' || (p_partkey % 5 + 1) AS p_mfgr FROM part p
),
supplier_ext AS (
  SELECT s.*, (s_suppkey % 17 = 3) AS s_complaint FROM supplier s
)"""


def partsupp_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived partsupp: 4 suppliers per part by modular spreading (the
    spec's partsupp also assigns exactly 4 per part). Part-sized ×4, so
    it broadcasts wherever part would."""
    s_count = load_table(spark, sf_dir, "supplier").count()
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            F.col("p_partkey").alias("ps_partkey"),
            F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("j"),
        )
        .select(
            "ps_partkey",
            ((F.col("ps_partkey") * 13 + F.col("j") * 29) % s_count).alias(
                "ps_suppkey"
            ),
        )
        .select(
            "ps_partkey",
            "ps_suppkey",
            ((F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 3) % 9999 + 1).alias(
                "ps_availqty"
            ),
            (
                ((F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17) % 100000)
                .cast("double")
                / 100.0
                + 1.0
            ).alias("ps_supplycost"),
        )
    )


def lineitem_ext_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem + derived shipmode/commitdate/receiptdate — pure Column
    arithmetic, stays inside whole-stage codegen."""
    li = load_table(spark, sf_dir, "lineitem")
    idx = ((F.col("l_orderkey") + F.col("l_linenumber")) % 7 + 1).cast("int")
    ship = F.col("l_shipdate").cast("date")
    return (
        li.withColumn(
            "l_shipmode", F.element_at(F.array(*[F.lit(m) for m in MODES]), idx)
        )
        .withColumn(
            "l_commitdate",
            F.date_add(
                ship,
                ((F.col("l_orderkey") * 13 + F.col("l_linenumber") * 7) % 61 - 30)
                .cast("int"),
            ),
        )
        .withColumn(
            "l_receiptdate",
            F.date_add(
                ship,
                ((F.col("l_orderkey") * 17 + F.col("l_linenumber") * 11) % 30 + 1)
                .cast("int"),
            ),
        )
    )


def part_ext_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "part").withColumn(
        "p_mfgr", F.concat(F.lit("Manufacturer#"), F.col("p_partkey") % 5 + 1)
    )


# ---------------------------------------------------------------------------
# Q2: minimum-cost supplier. The correlated MIN subquery decorrelates
# into a grouped min over the region-eligible partsupp, broadcast back.
# ---------------------------------------------------------------------------

_Q2_ORACLE = f"""
WITH {_CTES}
SELECT s_acctbal, s_name, n_name, p_partkey, p_mfgr, ps_supplycost
FROM part_ext, supplier, partsupp, nation, region
WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
  AND p_size = 15 AND p_type = 'PROMO'
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND ps_supplycost = (
    SELECT MIN(ps2.ps_supplycost)
    FROM partsupp ps2, supplier s2, nation n2, region r2
    WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@register(
    "q02_min_cost_supplier",
    oracle=_Q2_ORACLE,
    doc="TPC-H Q2 shape on derived partsupp: correlated per-part MIN "
    "subquery decorrelated into grouped-min + broadcast join back; "
    "region/nation/supplier dims broadcast",
)
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = partsupp_df(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eligible = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    min_cost = eligible.groupBy("ps_partkey").agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    part = part_ext_df(spark, sf_dir).filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "PROMO")
    )
    return (
        eligible.join(F.broadcast(min_cost), "ps_partkey")
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_mfgr",
                "ps_supplycost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q9: product-type profit by nation and year. lineitem ⋈ orders is the
# one fact-fact shuffle; every other side is broadcast (part-derived
# partsupp rides the part broadcast).
# ---------------------------------------------------------------------------

_Q9_ORACLE = f"""
WITH {_CTES}
SELECT nation, o_year, ROUND(SUM(amount), 4) AS sum_profit
FROM (
  SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity
           AS amount
  FROM lineitem l, orders o, supplier s, partsupp, part p, nation n
  WHERE o.o_orderkey = l.l_orderkey AND s.s_suppkey = l.l_suppkey
    AND partsupp.ps_suppkey = l.l_suppkey AND partsupp.ps_partkey = l.l_partkey
    AND p.p_partkey = l.l_partkey AND s.s_nationkey = n.n_nationkey
    AND p.p_name LIKE '%red%'
)
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@register(
    "q09_product_profit",
    oracle=_Q9_ORACLE,
    doc="TPC-H Q9 shape: 6-way join, profit = revenue - supply cost; "
    "part filter applied before the fact-fact orders shuffle, all dims "
    "broadcast",
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    ps = partsupp_df(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            F.broadcast(ps),
            (F.col("l_suppkey") == ps.ps_suppkey)
            & (F.col("l_partkey") == ps.ps_partkey),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
    )
    return (
        joined.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - F.col("ps_supplycost") * F.col("l_quantity")
            ).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 4).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# Q11: important stock identification — per-part inventory value in one
# nation vs a global-threshold scalar (broadcast as a literal-free
# cross join, the decorrelated HAVING).
# ---------------------------------------------------------------------------

_Q11_ORACLE = f"""
WITH {_CTES}
SELECT ps_partkey, ROUND(SUM(ps_supplycost * ps_availqty), 4) AS value
FROM partsupp, supplier, nation
WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
  AND n_name = 'NATION_7'
GROUP BY ps_partkey
HAVING SUM(ps_supplycost * ps_availqty) > (
  SELECT SUM(ps_supplycost * ps_availqty) * 0.005
  FROM partsupp, supplier, nation
  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
    AND n_name = 'NATION_7')
ORDER BY value DESC, ps_partkey
"""


@register(
    "q11_important_stock",
    oracle=_Q11_ORACLE,
    doc="TPC-H Q11 shape: grouped inventory value vs a global-fraction "
    "scalar threshold (decorrelated HAVING via scalar broadcast)",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = partsupp_df(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    national = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("ps_partkey", (F.col("ps_supplycost") * F.col("ps_availqty")).alias("v"))
    )
    per_part = national.groupBy("ps_partkey").agg(F.sum("v").alias("value_raw"))
    threshold = national.agg((F.sum("v") * 0.005).alias("thr"))
    return (
        per_part.crossJoin(F.broadcast(threshold))
        .filter(F.col("value_raw") > F.col("thr"))
        .select("ps_partkey", F.round("value_raw", 4).alias("value"))
        .orderBy(F.desc("value"), "ps_partkey")
    )


# ---------------------------------------------------------------------------
# Q12: shipping-mode / order-priority correlation over the derived
# commit/receipt dates. One fact-fact shuffle, conditional aggregation.
# ---------------------------------------------------------------------------

_Q12_ORACLE = f"""
WITH {_CTES}
SELECT l_shipmode,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS low_line_count
FROM orders, lineitem_ext
WHERE o_orderkey = l_orderkey
  AND l_shipmode IN ('MAIL', 'SHIP')
  AND l_commitdate < l_receiptdate
  AND l_shipdate::DATE < l_commitdate
  AND l_receiptdate >= DATE '1997-01-01'
  AND l_receiptdate < DATE '1998-01-01'
GROUP BY l_shipmode
ORDER BY l_shipmode
"""


@register(
    "q12_shipmode_priority",
    oracle=_Q12_ORACLE,
    doc="TPC-H Q12 shape on derived shipmode/commit/receipt dates: "
    "selective lineitem filter pushed below the orders shuffle, "
    "conditional-sum pivot by priority class",
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = lineitem_ext_df(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    filtered = li.filter(
        F.col("l_shipmode").isin("MAIL", "SHIP")
        & (F.col("l_commitdate") < F.col("l_receiptdate"))
        & (F.col("l_shipdate").cast("date") < F.col("l_commitdate"))
        & (F.col("l_receiptdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_receiptdate") < F.lit("1998-01-01").cast("date"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        filtered.join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_shipmode")
    )


# ---------------------------------------------------------------------------
# Q16: parts/supplier relationship — distinct supplier count per
# (brand, type, size), excluding complaint suppliers via broadcast
# anti-join.
# ---------------------------------------------------------------------------

_Q16_ORACLE = f"""
WITH {_CTES}
SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp, part
WHERE p_partkey = ps_partkey
  AND p_brand <> 'Brand#45' AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22, 25)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier_ext WHERE s_complaint)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@register(
    "q16_parts_supplier_cnt",
    oracle=_Q16_ORACLE,
    doc="TPC-H Q16 shape: distinct-supplier counts per part attribute "
    "group, complaint suppliers removed by broadcast anti-join",
)
def q16_parts_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = partsupp_df(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & ~F.col("p_type").like("MEDIUM%")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22, 25)
    )
    complaints = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 17 == 3)
        .select(F.col("s_suppkey").alias("ps_suppkey"))
    )
    return (
        ps.join(F.broadcast(complaints), "ps_suppkey", "left_anti")
        .join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q20: potential part promotion — suppliers whose available quantity
# exceeds half of what they actually shipped of 'red%' parts in 1997.
# The correlated quantity subquery decorrelates into a grouped sum on
# (partkey, suppkey) left-joined onto partsupp.
# ---------------------------------------------------------------------------

_Q20_ORACLE = f"""
WITH {_CTES}
SELECT s_suppkey, s_name
FROM supplier, nation
WHERE s_nationkey = n_nationkey AND n_name = 'NATION_3'
  AND s_suppkey IN (
    SELECT ps_suppkey FROM partsupp
    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND ps_availqty > (
        SELECT 0.5 * COALESCE(SUM(l_quantity), 0) FROM lineitem
        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
          AND l_shipdate >= DATE '1997-01-01'
          AND l_shipdate < DATE '1998-01-01'))
ORDER BY s_name
"""


@register(
    "q20_promotion_suppliers",
    oracle=_Q20_ORACLE,
    doc="TPC-H Q20 shape: nested IN chain decorrelated — shipped-quantity "
    "grouped sum left-joined onto partsupp, semi-joined up to suppliers",
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = partsupp_df(spark, sf_dir)
    red_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select(F.col("p_partkey").alias("ps_partkey"))
    )
    shipped = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
        )
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(F.sum("l_quantity").alias("qty"))
    )
    qualified = (
        ps.join(F.broadcast(red_parts), "ps_partkey", "left_semi")
        .join(shipped, ["ps_partkey", "ps_suppkey"], "left")
        .filter(F.col("ps_availqty") > 0.5 * F.coalesce(F.col("qty"), F.lit(0.0)))
        .select("ps_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        supp.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualified, supp.s_suppkey == F.col("ps_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Q21: suppliers who kept orders waiting — the only late supplier in a
# multi-supplier order. EXISTS/NOT EXISTS become non-equi semi/anti
# joins on the orderkey with a suppkey inequality.
# ---------------------------------------------------------------------------

_Q21_ORACLE = f"""
WITH {_CTES}
SELECT s_name, COUNT(*)::BIGINT AS numwait
FROM supplier, lineitem_ext l1, orders, nation
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F' AND l1.l_receiptdate > l1.l_commitdate
  AND EXISTS (
    SELECT * FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT * FROM lineitem_ext l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_receiptdate > l3.l_commitdate)
  AND s_nationkey = n_nationkey AND n_name = 'NATION_5'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


@register(
    "q21_waiting_suppliers",
    oracle=_Q21_ORACLE,
    doc="TPC-H Q21 shape on derived receipt/commit dates: EXISTS / NOT "
    "EXISTS as non-equi left-semi and left-anti self-joins on orderkey, "
    "late-supplier isolation in F-status multi-supplier orders",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = lineitem_ext_df(spark, sf_dir).select(
        "l_orderkey", "l_suppkey", "l_commitdate", "l_receiptdate"
    )
    late = li.filter(F.col("l_receiptdate") > F.col("l_commitdate"))
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    l1 = (
        late.join(
            l2,
            (F.col("l_orderkey") == F.col("o2"))
            & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("o3"))
            & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    orders_f = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    return (
        l1.join(orders_f, F.col("l_orderkey") == orders_f.o_orderkey, "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
