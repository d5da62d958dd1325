"""Round-3 scale additions: mergeable quantile store (E51) and friends.

Each query follows the registry contract (queries/__init__.py): aliased
columns match the DuckDB oracle exactly; approximate operators are
audited with boolean error-bound contracts the oracle checks EXACTLY
(the E37/E45 sketch-audit pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E51: mergeable quantile-sketch store — accuracy audit
#
# The estimate itself is a function of xxhash64 (not reproducible in
# DuckDB), so the oracle contract is the RANK-ERROR bound: for each
# group and each q, the fraction of true rows ≤ the estimate must land
# within 0.05 of q (k=2048 → σ ≈ 1.1% at the median; 0.05 ≈ 4.5σ).
# Deterministic because the sample is a pure function of row keys.
# ---------------------------------------------------------------------------

_QUANTILE_STORE_ORACLE = """
SELECT event_type,
       TRUE AS p50_ok,
       TRUE AS p90_ok
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q_quantile_store_batches",
    oracle=_QUANTILE_STORE_ORACLE,
    doc="mergeable quantile-sketch store (E51): events split into two "
    "ingest batches, each reduced to a bottom-k coordinated sample per "
    "event_type and appended to the at-rest store; p50/p90 are then "
    "estimated from sketch rows only and audited against the exact "
    "distribution — the oracle checks the rank-error booleans EXACTLY "
    "(the E45 HLL-store pattern applied to percentiles)",
)
def q_quantile_store_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from dumpty_spark.operators.quantiles import (
        quantile_store_append,
        quantile_store_estimate,
    )
    from dumpty_spark.session import warehouse_scratch

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    tmp = warehouse_scratch(spark, "qstore")
    try:
        store = f"{tmp}/qstore"
        for parity in (0, 1):
            quantile_store_append(
                ev.filter(F.col("event_id") % 2 == parity),
                store,
                ["event_type"],
                "value",
                "event_id",
                f"b{parity}",
            )
        est = (
            quantile_store_estimate(spark, store, ["event_type"], [0.5, 0.9])
            .groupBy("event_type")
            .pivot("q", [0.5, 0.9])
            .agg(F.first("est"))
            .select(
                "event_type",
                F.col("`0.5`").alias("p50_est"),
                F.col("`0.9`").alias("p90_est"),
            )
        )
        # audit: rank position of each estimate in the TRUE distribution
        audit = (
            ev.join(F.broadcast(est), "event_type")
            .groupBy("event_type")
            .agg(
                (
                    F.sum((F.col("value") <= F.col("p50_est")).cast("int"))
                    / F.count("*")
                ).alias("f50"),
                (
                    F.sum((F.col("value") <= F.col("p90_est")).cast("int"))
                    / F.count("*")
                ).alias("f90"),
            )
        )
        return (
            audit.select(
                "event_type",
                (F.abs(F.col("f50") - 0.5) <= 0.05).alias("p50_ok"),
                (F.abs(F.col("f90") - 0.9) <= 0.05).alias("p90_ok"),
            )
            .orderBy("event_type")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# E52: autocorrelation (ACF) — temporal self-similarity per series
# ---------------------------------------------------------------------------
_ACF_ORACLE = """
WITH ordered AS (
  SELECT event_type, value,
         LAG(value, 1) OVER w AS v1,
         LAG(value, 2) OVER w AS v2,
         LAG(value, 3) OVER w AS v3
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
)
SELECT event_type,
       ROUND(CORR(value, v1), 4) AS acf1,
       ROUND(CORR(value, v2), 4) AS acf2,
       ROUND(CORR(value, v3), 4) AS acf3
FROM ordered
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q_autocorrelation",
    oracle=_ACF_ORACLE,
    doc="lag-1/2/3 autocorrelation of event values per series (E52): "
    "LAG windows + CORR — the stationarity screen run before any "
    "time-series featurization; one sort shuffle per series partition, "
    "groups-sized output",
)
def q_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    lagged = ev.select(
        "event_type",
        "value",
        F.lag("value", 1).over(w).alias("v1"),
        F.lag("value", 2).over(w).alias("v2"),
        F.lag("value", 3).over(w).alias("v3"),
    )
    return (
        lagged.groupBy("event_type")
        .agg(
            F.round(F.corr("value", "v1"), 4).alias("acf1"),
            F.round(F.corr("value", "v2"), 4).alias("acf2"),
            F.round(F.corr("value", "v3"), 4).alias("acf3"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# E54: dataset content fingerprint — order-independent table hash
# ---------------------------------------------------------------------------
# Reproducibility primitive for dataset cards and snapshot diffs: a
# 64-bit content hash that is invariant to row order and partitioning
# (XOR of per-row md5-derived ints), so "same fingerprint" ⇒ same rows
# regardless of how either side was shuffled or split. Both engines
# compute md5 of the identical canonical string, so the oracle match is
# bit-exact.
_FINGERPRINT_ORACLE = """
WITH rows_o AS (
  SELECT ('0x' || substr(md5(
           o_orderkey::VARCHAR || '|' || o_custkey::VARCHAR || '|' ||
           o_orderstatus || '|' || ROUND(o_totalprice, 2)::VARCHAR
         ), 1, 15))::BIGINT AS h
  FROM orders
),
rows_c AS (
  SELECT ('0x' || substr(md5(
           c_custkey::VARCHAR || '|' || c_name || '|' ||
           c_nationkey::VARCHAR
         ), 1, 15))::BIGINT AS h
  FROM customer
)
SELECT 'customer' AS tbl, COUNT(*)::BIGINT AS n_rows, bit_xor(h) AS fingerprint
FROM rows_c
UNION ALL
SELECT 'orders', COUNT(*)::BIGINT, bit_xor(h) FROM rows_o
ORDER BY tbl
"""


@register(
    "q_dataset_fingerprint",
    oracle=_FINGERPRINT_ORACLE,
    doc="order-independent 64-bit content fingerprint per table (E54): "
    "XOR-aggregated md5 row hashes over a canonical column encoding — "
    "equal fingerprints certify equal row multisets across engines, "
    "partitionings and row orders (XOR self-cancels duplicates swaps); "
    "the reproducibility stamp a dataset card publishes. One scan, "
    "map-side hash, 8-byte aggregate",
)
def q_dataset_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    def fp(df: DataFrame, name: str, canon) -> DataFrame:
        h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("bigint")
        return df.select(h.alias("h")).agg(
            F.lit(name).alias("tbl"),
            F.count("*").alias("n_rows"),
            F.expr("bit_xor(h)").alias("fingerprint"),
        )

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    canon_o = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.round("o_totalprice", 2).cast("string"),
    )
    canon_c = F.concat_ws(
        "|",
        F.col("c_custkey").cast("string"),
        F.col("c_name"),
        F.col("c_nationkey").cast("string"),
    )
    return (
        fp(cust, "customer", canon_c)
        .unionAll(fp(orders, "orders", canon_o))
        .orderBy("tbl")
    )


# ---------------------------------------------------------------------------
# E55: join-key skew diagnostics — the pre-flight check for 100 TB joins
# ---------------------------------------------------------------------------
_SKEW_ORACLE = """
WITH freq AS (
  SELECT l_partkey AS key, COUNT(*)::BIGINT AS cnt FROM lineitem GROUP BY 1
),
-- SQL-standard PERCENTILE_DISC semantics spelled out (value at 1-based
-- index ceil(q*n) of the sorted counts) so the oracle matches Spark's
-- percentile_disc for EVERY n, not only when 0.99*n is an integer
-- (DuckDB's QUANTILE_DISC uses floor(q*(n-1)), a different statistic)
p99 AS (
  SELECT cnt AS p99_cnt FROM (
    SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt) AS rn,
           COUNT(*) OVER () AS n
    FROM freq
  ) WHERE rn = CEIL(0.99 * n)
),
stats AS (
  SELECT COUNT(*)::BIGINT AS n_keys,
         SUM(cnt)::BIGINT AS n_rows,
         MAX(cnt)::BIGINT AS max_cnt,
         AVG(cnt) AS avg_cnt,
         (SELECT p99_cnt FROM p99) AS p99_cnt
  FROM freq
)
SELECT 'lineitem.l_partkey' AS key_name,
       n_keys, n_rows, max_cnt,
       ROUND(max_cnt / avg_cnt, 4) AS max_over_avg,
       ROUND(p99_cnt / avg_cnt, 4) AS p99_over_avg,
       CAST(CEIL(max_cnt / GREATEST(avg_cnt, 1.0)) AS BIGINT) AS suggested_salt
FROM stats
"""


@register(
    "q_join_skew_report",
    oracle=_SKEW_ORACLE,
    doc="join-key skew diagnostics (E55): per-key frequency profile "
    "(max/avg, p99/avg, suggested salting factor) for a prospective "
    "join key — the pre-flight planning report that decides between "
    "plain shuffle join, AQE skew split, and explicit salting (E8) "
    "BEFORE launching a 100 TB join; one partial-aggregated count plus "
    "a keys-sized stats pass",
)
def q_join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    freq = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count("*").alias("cnt")
    )
    stats = freq.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
        F.avg("cnt").alias("avg_cnt"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY cnt)").alias(
            "p99_cnt"
        ),
    )
    return stats.select(
        F.lit("lineitem.l_partkey").alias("key_name"),
        "n_keys",
        "n_rows",
        "max_cnt",
        F.round(F.col("max_cnt") / F.col("avg_cnt"), 4).alias("max_over_avg"),
        F.round(F.col("p99_cnt") / F.col("avg_cnt"), 4).alias("p99_over_avg"),
        F.ceil(F.col("max_cnt") / F.greatest(F.col("avg_cnt"), F.lit(1.0)))
        .cast("bigint")
        .alias("suggested_salt"),
    )


# ---------------------------------------------------------------------------
# E58: KMV join-cardinality estimate — the planner's join-size probe
# ---------------------------------------------------------------------------
_KMV_ORACLE = """
WITH f AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'),
     o AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'O')
SELECT 'orders.F_custkey x orders.O_custkey' AS pair_name,
       (SELECT COUNT(*) FROM f JOIN o USING (k))::BIGINT AS exact_intersection,
       TRUE AS est_within_10pct
"""


@register(
    "q_join_cardinality_est",
    oracle=_KMV_ORACLE,
    doc="KMV coordinated-sketch join-cardinality estimate (E58): "
    "distinct-key intersection of two order segments estimated from two "
    "k=512 minimum-hash sketches (Beyer et al. SIGMOD'07 — direct "
    "Jaccard on the merged sketch, no inclusion-exclusion blow-up), "
    "audited within 10% of the exact intersection — the sketch-sized "
    "join-size probe that pairs with the E55 skew report for 100 TB "
    "join planning",
)
def q_join_cardinality_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators.sketches import (
        kmv_intersection_estimate,
        kmv_sketch,
    )

    orders = load_table(spark, sf_dir, "orders")
    fa = orders.filter(F.col("o_orderstatus") == "F")
    ob = orders.filter(F.col("o_orderstatus") == "O")
    est = kmv_intersection_estimate(
        kmv_sketch(fa, "o_custkey"), kmv_sketch(ob, "o_custkey")
    )
    exact = (
        fa.select(F.col("o_custkey").alias("k"))
        .distinct()
        .join(ob.select(F.col("o_custkey").alias("k")).distinct(), "k")
        .agg(F.count("*").alias("exact_intersection"))
    )
    # zero guard: with an empty true intersection the relative-error
    # expression divides by zero (NULL in Spark, never TRUE/FALSE) — the
    # correct contract there is est == 0 exactly
    ok = F.when(
        F.col("exact_intersection") == 0, F.col("est_intersection") == 0.0
    ).otherwise(
        F.abs(F.col("est_intersection") - F.col("exact_intersection"))
        / F.col("exact_intersection")
        <= 0.10
    )
    return exact.crossJoin(F.broadcast(est)).select(
        F.lit("orders.F_custkey x orders.O_custkey").alias("pair_name"),
        "exact_intersection",
        ok.alias("est_within_10pct"),
    )
