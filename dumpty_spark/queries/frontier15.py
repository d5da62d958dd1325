"""Round-7 engine extensions, third batch (EXT E169-E172): distributed
logistic regression via IRLS moment algebra, k-anonymity/l-diversity
release audit, golden-record survivorship consolidation, and a
schema-evolution (mergeSchema) read contract.

Design rules: iteration only over coefficient-sized state (the IRLS
loop collects five moments per round and requantizes the coefficients at
9dp — the E143 trajectory discipline, so both engines walk identical
doubles), deterministic record-variant construction the oracle can
replay, exact DuckDB oracles.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.session import warehouse_scratch
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E169: distributed logistic regression (Newton / IRLS from moments)
# ---------------------------------------------------------------------------
# P(purchase) ~ sigmoid(a + b·z) over events, z = 6dp-pre-rounded
# standardized value (the E141 z-score discipline). Each Newton step
# needs exactly FIVE partial-aggregable moments — gradient (Σ(y-p),
# Σ(y-p)x) and Hessian (Σw, Σwx, Σwx²) with w = p(1-p) — so a 100 TB
# fit is 4 scans with map-side combine and a 2×2 Cramer solve on the
# driver; no MLlib, no per-row prediction materialized. Coefficients are
# requantized at 9dp after every step (E143: cross-engine ulps in the
# moment sums die at the 1e-9 grid instead of compounding), and the
# oracle unrolls the identical 4 steps as chained scalar CTEs. Final
# log-loss evaluated at the converged coefficients in the same scan
# shape.

_IRLS_STEPS = 4


def _irls_oracle() -> str:
    head = """
WITH pts AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y, value
  FROM events
),
st AS (SELECT AVG(value) AS mu, STDDEV_POP(value) AS sd FROM pts),
d AS MATERIALIZED (
  SELECT y, ROUND((value - st.mu) / st.sd, 6) AS x FROM pts, st
),
c0 AS (SELECT 0.0 AS a, 0.0 AS b)"""
    ctes = [head.strip()]
    for i in range(1, _IRLS_STEPS + 1):
        p = f"1 / (1 + exp(-(c{i-1}.a + c{i-1}.b * x)))"
        ctes.append(
            f"""m{i} AS (
  SELECT SUM(y - p) AS gy, SUM((y - p) * x) AS gx,
         SUM(p * (1 - p)) AS w, SUM(p * (1 - p) * x) AS wx,
         SUM(p * (1 - p) * x * x) AS wxx
  FROM (SELECT y, x, {p} AS p FROM d, c{i-1})
)"""
        )
        ctes.append(
            f"""c{i} AS (
  SELECT ROUND(c{i-1}.a + (m{i}.wxx * m{i}.gy - m{i}.wx * m{i}.gx)
               / (m{i}.w * m{i}.wxx - m{i}.wx * m{i}.wx), 9) AS a,
         ROUND(c{i-1}.b + (m{i}.w * m{i}.gx - m{i}.wx * m{i}.gy)
               / (m{i}.w * m{i}.wxx - m{i}.wx * m{i}.wx), 9) AS b
  FROM m{i}, c{i-1}
)"""
        )
    last = f"c{_IRLS_STEPS}"
    ctes.append(
        f"""ll AS (
  SELECT -AVG(y * ln(p) + (1 - y) * ln(1 - p)) AS loss
  FROM (SELECT y, x, 1 / (1 + exp(-({last}.a + {last}.b * x))) AS p
        FROM d, {last})
)"""
    )
    return (
        ",\n".join(ctes)
        + f"""
SELECT ROUND({last}.a, 6) AS coef_a, ROUND({last}.b, 6) AS coef_b,
       ROUND(ll.loss, 6) AS log_loss,
       (SELECT COUNT(*) FROM d)::BIGINT AS n_rows
FROM {last}, ll"""
    )


@register(
    "q_logistic_irls",
    oracle=_irls_oracle(),
    doc="distributed logistic regression via IRLS (E169): 4 Newton "
    "steps, each ONE five-moment partial-agg scan + a driver-side 2x2 "
    "Cramer solve; coefficients requantized at 9dp per step (the E143 "
    "trajectory discipline) so both engines walk identical doubles; "
    "final log-loss in the same scan shape — iterative ML whose per-"
    "step cost at 100 TB is one map-side-combined scan",
)
def q_logistic_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0).alias("y"),
        "value",
    )
    st = pts.agg(
        F.avg("value").alias("mu"), F.stddev_pop("value").alias("sd")
    ).first()
    d = pts.select(
        "y", F.round((F.col("value") - st["mu"]) / st["sd"], 6).alias("x")
    ).localCheckpoint()  # 5 passes (4 steps + loss) over the z-scores
    a, b = 0.0, 0.0
    for _ in range(_IRLS_STEPS):
        p = 1 / (1 + F.exp(-(F.lit(a) + F.lit(b) * F.col("x"))))
        w = p * (1 - p)
        m = d.agg(
            F.sum(F.col("y") - p).alias("gy"),
            F.sum((F.col("y") - p) * F.col("x")).alias("gx"),
            F.sum(w).alias("w"),
            F.sum(w * F.col("x")).alias("wx"),
            F.sum(w * F.col("x") * F.col("x")).alias("wxx"),
        ).first()
        det = m["w"] * m["wxx"] - m["wx"] * m["wx"]
        a = round(a + (m["wxx"] * m["gy"] - m["wx"] * m["gx"]) / det, 9)
        b = round(b + (m["w"] * m["gx"] - m["wx"] * m["gy"]) / det, 9)
    p = 1 / (1 + F.exp(-(F.lit(a) + F.lit(b) * F.col("x"))))
    return d.agg(
        F.lit(round(a, 6)).alias("coef_a"),
        F.lit(round(b, 6)).alias("coef_b"),
        F.round(
            -F.avg(F.col("y") * F.log(p) + (1 - F.col("y")) * F.log(1 - p)), 6
        ).alias("log_loss"),
        F.count("*").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# E170: k-anonymity / l-diversity release audit
# ---------------------------------------------------------------------------
# Before a table leaves the pipeline (the E167 DP release's structural
# sibling): over quasi-identifier (c_nationkey, c_mktsegment), report
# equivalence-class statistics — class count, smallest class, rows in
# classes below k=5 (the re-identifiable mass), and the minimum
# l-diversity of the sensitive attribute (account-balance thousile) —
# plus the pass/fail booleans a release gate needs. One grouped pass;
# everything downstream is classes-sized.

_KANON_K = 5
_KANON_L = 2

_KANON_ORACLE = f"""
WITH cls AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*)::BIGINT AS n,
         COUNT(DISTINCT (c_acctbal // 1000)::BIGINT)::BIGINT AS l_div
  FROM customer
  GROUP BY c_nationkey, c_mktsegment
)
SELECT COUNT(*)::BIGINT AS n_classes,
       MIN(n) AS min_class_size,
       SUM(CASE WHEN n < {_KANON_K} THEN n ELSE 0 END)::BIGINT
         AS rows_below_k,
       ROUND(SUM(CASE WHEN n < {_KANON_K} THEN n ELSE 0 END)::DOUBLE
             / SUM(n), 6) AS frac_below_k,
       MIN(l_div) AS min_l_diversity,
       (MIN(n) >= {_KANON_K}) AS k_anonymous,
       (MIN(l_div) >= {_KANON_L}) AS l_diverse
FROM cls
"""


@register(
    "q_kanonymity_audit",
    oracle=_KANON_ORACLE,
    doc="k-anonymity / l-diversity release audit (E170): equivalence "
    "classes over the (nation, segment) quasi-identifier — smallest "
    "class, re-identifiable row mass below k=5, minimum sensitive-value "
    "diversity, pass booleans; one grouped pass, classes-sized "
    "downstream; the structural privacy gate next to the E167 DP "
    "release",
)
def q_kanonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    cls = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("n"),
        F.countDistinct(
            (F.col("c_acctbal") / 1000).cast("long")
        ).alias("l_div"),
    )
    below = F.sum(F.when(F.col("n") < _KANON_K, F.col("n")).otherwise(0))
    return cls.agg(
        F.count("*").alias("n_classes"),
        F.min("n").alias("min_class_size"),
        below.alias("rows_below_k"),
        F.round(below.cast("double") / F.sum("n"), 6).alias("frac_below_k"),
        F.min("l_div").alias("min_l_diversity"),
        (F.min("n") >= _KANON_K).alias("k_anonymous"),
        (F.min("l_div") >= _KANON_L).alias("l_diverse"),
    )


# ---------------------------------------------------------------------------
# E171: golden-record survivorship (MDM consolidation)
# ---------------------------------------------------------------------------
# The step AFTER entity resolution (the fuzzy-match + CC family): each
# linked cluster's records are consolidated into one golden record by a
# survivorship rule — per FIELD, the highest-priority (lowest prio
# number) non-null value. The record variants are derived
# deterministically from customer so the oracle can rebuild them:
#   legacy (prio 3): UPPER(name), segment NULL, balance rounded *0.9
#   crm    (prio 1): name NULL on %5 keys, balance NULL on %7 keys
#   web    (prio 2): segment NULL on even keys; record absent on %4=1
# min-of-struct per field (the E118 finish) — one grouped pass, no
# window, no self-join; clusters keyed by custkey (linkage itself is
# E78/E2's job).

_GOLDEN_ORACLE = """
WITH recs AS (
  SELECT c_custkey AS k, 3 AS prio, UPPER(c_name) AS name,
         NULL::VARCHAR AS seg, ROUND(c_acctbal * 0.9, 2) AS bal
  FROM customer
  UNION ALL
  SELECT c_custkey, 1,
         CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_name END,
         c_mktsegment,
         CASE WHEN c_custkey % 7 = 0 THEN NULL
              ELSE ROUND(c_acctbal, 2) END
  FROM customer
  UNION ALL
  SELECT c_custkey, 2, c_name,
         CASE WHEN c_custkey % 2 = 0 THEN NULL ELSE c_mktsegment END,
         ROUND(c_acctbal, 2)
  FROM customer WHERE c_custkey % 4 != 1
)
SELECT k AS c_custkey,
       COUNT(*)::BIGINT AS n_records,
       arg_min(name, prio) FILTER (name IS NOT NULL) AS golden_name,
       arg_min(seg, prio) FILTER (seg IS NOT NULL) AS golden_segment,
       arg_min(bal, prio) FILTER (bal IS NOT NULL) AS golden_balance
FROM recs
WHERE k < 300
GROUP BY k
ORDER BY k
"""


@register(
    "q_golden_record",
    oracle=_GOLDEN_ORACLE,
    doc="golden-record survivorship (E171): per-field highest-priority "
    "non-null consolidation of deterministically-derived CRM record "
    "variants (the MDM step after entity resolution) — min-of-struct "
    "per field in ONE grouped pass, no window, no self-join",
)
def q_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    legacy = cust.select(
        F.col("c_custkey").alias("k"),
        F.lit(3).alias("prio"),
        F.upper("c_name").alias("name"),
        F.lit(None).cast("string").alias("seg"),
        F.round(F.col("c_acctbal") * 0.9, 2).alias("bal"),
    )
    crm = cust.select(
        F.col("c_custkey").alias("k"),
        F.lit(1).alias("prio"),
        F.when(F.col("c_custkey") % 5 == 0, None)
        .otherwise(F.col("c_name"))
        .alias("name"),
        F.col("c_mktsegment").alias("seg"),
        F.when(F.col("c_custkey") % 7 == 0, None)
        .otherwise(F.round("c_acctbal", 2))
        .alias("bal"),
    )
    web = cust.filter(F.col("c_custkey") % 4 != 1).select(
        F.col("c_custkey").alias("k"),
        F.lit(2).alias("prio"),
        F.col("c_name").alias("name"),
        F.when(F.col("c_custkey") % 2 == 0, None)
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
        F.round("c_acctbal", 2).alias("bal"),
    )

    def surv(col: str):
        # min-of-struct on (prio) restricted to non-null field values
        return F.min(
            F.when(F.col(col).isNotNull(), F.struct("prio", col))
        )["" + col]

    return (
        legacy.unionAll(crm)
        .unionAll(web)
        .filter(F.col("k") < 300)
        .groupBy(F.col("k").alias("c_custkey"))
        .agg(
            F.count("*").alias("n_records"),
            surv("name").alias("golden_name"),
            surv("seg").alias("golden_segment"),
            surv("bal").alias("golden_balance"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# E172: schema-evolution read contract (mergeSchema)
# ---------------------------------------------------------------------------
# A lake table's schema GROWS: batch b1 lands (event_id, value), batch
# b2 adds a quality column. The reader must reconcile both footers
# (mergeSchema) and null-fill the missing column for old files — the
# contract every long-lived 100 TB dataset depends on when producers
# upgrade before consumers. The hashed surface: per-batch row counts,
# value sums and quality presence counts read back THROUGH the merged
# schema; the oracle recomputes from raw events, proving old-file rows
# surface with NULL quality and nothing else changed.

_EVOLVE_ORACLE = """
SELECT batch,
       COUNT(*)::BIGINT AS n_rows,
       ROUND(SUM(value), 2) AS sum_value,
       SUM(CASE WHEN q IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_quality
FROM (
  SELECT 'b1' AS batch, value, NULL::DOUBLE AS q
  FROM events WHERE event_id % 2 = 0
  UNION ALL
  SELECT 'b2', value, ROUND(value / 100, 4)
  FROM events WHERE event_id % 2 = 1
)
GROUP BY batch
ORDER BY batch
"""


@register(
    "q_schema_evolution",
    oracle=_EVOLVE_ORACLE,
    doc="schema-evolution read contract (E172): two parquet batches with "
    "grown schema read back through ONE mergeSchema scan — old-batch "
    "rows must surface with the new column null-filled, counts and "
    "sums byte-exact vs the oracle's from-raw rebuild; the reader "
    "contract every long-lived lake table depends on",
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "value"
    )
    scratch = warehouse_scratch(spark, "evolve")
    try:
        b1 = ev.filter(F.col("event_id") % 2 == 0).select(
            F.lit("b1").alias("batch"), "event_id", "value"
        )
        b2 = ev.filter(F.col("event_id") % 2 == 1).select(
            F.lit("b2").alias("batch"),
            "event_id",
            "value",
            F.round(F.col("value") / 100, 4).alias("quality"),
        )
        b1.write.parquet(f"{scratch}/b1")
        b2.write.parquet(f"{scratch}/b2")
        merged = spark.read.option("mergeSchema", "true").parquet(
            f"{scratch}/b1", f"{scratch}/b2"
        )
        return (
            merged.groupBy("batch")
            .agg(
                F.count("*").alias("n_rows"),
                F.round(F.sum("value"), 2).alias("sum_value"),
                F.sum(
                    F.col("quality").isNotNull().cast("int")
                ).alias("n_quality"),
            )
            .orderBy("batch")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
