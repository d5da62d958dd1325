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


_APPROX_DISTINCT_ORACLE = """
SELECT event_type,
       COUNT(*)::BIGINT AS n_events,
       TRUE AS in_envelope
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q_approx_distinct",
    oracle=_APPROX_DISTINCT_ORACLE,
    doc="HyperLogLog++ approximate distinct counts per group — the "
    "constant-memory path for 100 TB cardinality estimation, and it "
    "really is: NO exact-distinct shuffle anywhere in this plan (the "
    "exact-vs-approx audit lives in q_approx_distinct_check). The "
    "hashed surface is exact row counts plus a sanity envelope the "
    "sketch guarantees without knowing the exact answer: 1 <= estimate "
    "<= n_events x (1 + 4 sigma), sigma = the configured 2% rsd",
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx"),
            F.count("*").alias("n_events"),
        )
        .select(
            "event_type",
            "n_events",
            (
                (F.col("approx") >= 1)
                & (F.col("approx") <= F.col("n_events") * 1.08)
            ).alias("in_envelope"),
        )
        .orderBy("event_type")
    )


_APPROX_CHECK_ORACLE = """
SELECT event_type,
       COUNT(DISTINCT user_id)::BIGINT AS exact_users,
       TRUE AS in_envelope
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q_approx_distinct_check",
    oracle=_APPROX_CHECK_ORACLE,
    doc="HLL++ error-bound audit the oracle can check EXACTLY: per group, "
    "the exact distinct count plus a boolean asserting the HLL++ estimate "
    "landed within 4 sigma of its configured 2% relative-standard-error "
    "(rsd is a standard deviation, not a bound — a 1-sigma envelope "
    "legitimately fails on fresh data) — the sketch's accuracy contract "
    "as a hash-matchable row, companion to the shuffle-free "
    "q_approx_distinct",
)
def q_approx_distinct_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", 0.02).alias("approx"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx") - F.col("exact_users"))
                / F.col("exact_users")
                <= 0.08
            ).alias("in_envelope"),
        )
        .orderBy("event_type")
    )


_ROWNUM_ORACLE = """
SELECT rn, o_orderkey
FROM (
  SELECT o_orderkey,
         ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
  FROM orders
)
WHERE rn % 500 = 0
ORDER BY rn
"""


@register(
    "q_global_rownum",
    oracle=_ROWNUM_ORACLE,
    doc="global row numbering WITHOUT a global window (range repartition + "
    "per-partition numbering + broadcast offsets) — every-500th-row "
    "boundary extraction over the PK, the reference's julienne at scale",
)
def q_global_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators.rownum import global_row_number

    orders = load_table(spark, sf_dir, "orders")
    numbered = global_row_number(orders, ["o_orderkey"], out_col="rn")
    return (
        numbered.filter(F.col("rn") % 500 == 0)
        .select("rn", "o_orderkey")
        .orderBy("rn")
    )


_GSETS_ORACLE = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS revenue
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@register(
    "q_grouping_sets",
    oracle=_GSETS_ORACLE,
    doc="explicit GROUPING SETS (flag-only, status-only, grand total) — "
    "single shuffle via Expand, not three scans",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS revenue
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """)


_BUCKETED_ORACLE = """
SELECT o_orderstatus,
       COUNT(*) AS n_items,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register(
    "q_bucketed_join",
    oracle=_BUCKETED_ORACLE,
    doc="co-located fact⋈fact join over bucketed-at-rest tables: both "
    "sides bucketed on the join key (8 buckets) so the join plan has NO "
    "Exchange — pay the shuffle once at ingest, never per query; "
    "semantics identical to the plain join (this oracle)",
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re

    from dumpty_spark.operators.joins import bucketed_join, write_bucketed

    # per-sf table names: runs at different scale factors never clobber
    # each other's tables, and re-runs at the same sf overwrite in place
    # (bounded garbage); concurrent same-sf runs still assume the store's
    # single-writer contract, like every at-rest layout here
    tag = re.sub(r"[^a-zA-Z0-9]", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    t_li, t_ord = f"bkt_lineitem_{tag}", f"bkt_orders_{tag}"
    # project to the join/agg columns BEFORE bucketing: at-rest layouts
    # should carry what their queries read — manual column pruning at
    # ingest time, the write-side twin of scan-side ReadSchema pruning
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    write_bucketed(li, t_li, ["l_orderkey"], 8, ["l_orderkey"])
    write_bucketed(orders, t_ord, ["o_orderkey"], 8, ["o_orderkey"])
    return (
        bucketed_join(
            spark,
            t_li,
            t_ord,
            on=[F.col("l_orderkey") == F.col("o_orderkey")],
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
        )
        .orderBy("o_orderstatus")
    )


_APPROX_QUANTILE_CHECK_ORACLE = """
SELECT o_orderstatus,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS exact_p50,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS exact_p90,
       TRUE AS p50_within_1pct,
       TRUE AS p90_within_1pct
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register(
    "q_approx_quantile_check",
    oracle=_APPROX_QUANTILE_CHECK_ORACLE,
    doc="approx_percentile error-bound audit the oracle checks EXACTLY: "
    "per group, the exact interpolated p50/p90 plus booleans asserting "
    "the sketch estimate landed within 1% relative error — completes the "
    "sketch-audit family (HLL, ANN recall) for the quantile sketch, the "
    "scale path for all percentile work",
)
def q_approx_quantile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("e50"),
        F.percentile("o_totalprice", F.lit(0.9)).alias("e90"),
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10000)).alias("a50"),
        F.percentile_approx("o_totalprice", F.lit(0.9), F.lit(10000)).alias("a90"),
    )
    return (
        agg.select(
            "o_orderstatus",
            F.round("e50", 4).alias("exact_p50"),
            F.round("e90", 4).alias("exact_p90"),
            (F.abs(F.col("a50") - F.col("e50")) / F.col("e50") <= 0.01).alias(
                "p50_within_1pct"
            ),
            (F.abs(F.col("a90") - F.col("e90")) / F.col("e90") <= 0.01).alias(
                "p90_within_1pct"
            ),
        )
        .orderBy("o_orderstatus")
    )
