"""Round-3 second batch (E68-E73): count-min frequency store audit,
CEP-style sequence pattern matching, deterministic epoch shuffle for
training-data ordering, prefix-filtered exact similarity join, Poisson
bootstrap confidence intervals, and Spearman rank correlation. Everything
is either a pure Column expression or a sketch-sized store round-trip;
all six carry exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E68: count-min sketch store — per-key frequency estimates, audited
# ---------------------------------------------------------------------------
# The oracle recomputes the EXACT per-user counts and pins the two CMS
# contract booleans (same pattern as the E37/E45 sketch audits): the
# estimate never under-counts (deterministic — counters only add), and
# it stays within the eps*N = (e/width)*N one-sided envelope (holds with
# prob 1-exp(-depth) over hash choice; hashes are fixed here, so on this
# data it is a deterministic, hash-checkable boolean).

_CMS_ORACLE = """
SELECT user_id,
       COUNT(*)::BIGINT AS true_count,
       TRUE AS no_underestimate,
       TRUE AS within_eps
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@register(
    "q_cms_freq_check",
    oracle=_CMS_ORACLE,
    doc="count-min sketch store audit (E68): per-user event frequencies "
    "estimated from TWO at-rest sketch batches merged cell-wise (bytes "
    "per batch = depth x width, never rows), checked against exact "
    "counts — est >= true always, est <= true + (e/width)*N; the "
    "mergeable frequency half of the sketch-store family (E45/E51/E58)",
)
def q_cms_freq_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math
    import shutil

    from dumpty_spark.operators import cms
    from dumpty_spark.session import warehouse_scratch

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    tmp = warehouse_scratch(spark, "cms")
    try:
        store = f"{tmp}/cms"
        # two ingest batches split by event-id parity — estimates must
        # come out of the MERGED grids, exercising linearity at rest
        cms.cms_store_append(
            ev.filter(F.col("event_id") % 2 == 0), store, "user_id", "b0"
        )
        cms.cms_store_append(
            ev.filter(F.col("event_id") % 2 == 1), store, "user_id", "b1"
        )
        keys = ev.select("user_id").distinct()
        est = cms.cms_store_estimate(spark, store, keys, "user_id")
        exact = ev.groupBy("user_id").agg(F.count("*").alias("true_count"))
        eps = math.e / cms.WIDTH
        return (
            exact.join(est, "user_id")
            .select(
                "user_id",
                "true_count",
                (F.col("est") >= F.col("true_count")).alias(
                    "no_underestimate"
                ),
                (
                    F.col("est")
                    <= F.col("true_count") + F.lit(eps) * F.col("n_total")
                ).alias("within_eps"),
            )
            .orderBy("user_id")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# E69: sequence pattern match — view -> purchase within 30 min, no error
# between (CEP / MATCH_RECOGNIZE-style funnel with a negation clause)
# ---------------------------------------------------------------------------
# The pattern engine trick: "first B after each A" and "first C after
# each A" are both MIN-over-a-forward-frame window expressions, so the
# whole pattern — including the negation — is two window columns and a
# filter: matched iff b_ts <= a_ts + 30min and (c_ts is null or
# c_ts >= b_ts). One sort shuffle per user partition, no self-join, no
# per-event explode; at 100 TB this is the same cost as any per-entity
# sessionization pass.

_SEQ_ORACLE = """
WITH nxt AS (
  SELECT user_id, ts, event_type,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS p_ts,
         MIN(CASE WHEN event_type = 'error' THEN ts END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS e_ts
  FROM events
),
v AS (
  SELECT user_id,
         (p_ts IS NOT NULL AND p_ts <= ts + INTERVAL 30 MINUTE
          AND (e_ts IS NULL OR e_ts >= p_ts)) AS matched,
         date_diff('microsecond', ts, p_ts) / 1e6 AS lat
  FROM nxt WHERE event_type = 'view'
)
SELECT user_id,
       COUNT(*)::BIGINT AS n_views,
       SUM(CASE WHEN matched THEN 1 ELSE 0 END)::BIGINT AS n_conversions,
       ROUND(AVG(CASE WHEN matched THEN lat END), 2) AS avg_latency_sec
FROM v
GROUP BY user_id
ORDER BY user_id
"""


@register(
    "q_sequence_match",
    oracle=_SEQ_ORACLE,
    doc="CEP sequence pattern (E69): per-user 'view then purchase "
    "within 30 min with NO error between' — the negation-carrying "
    "funnel MATCH_RECOGNIZE expresses, done as two forward-frame MIN "
    "windows + a filter (no self-join, no explode); per-user "
    "conversion counts and mean view->purchase latency",
)
def q_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return sequence_match(ev)


def sequence_match(
    ev: DataFrame,
    a: str = "view",
    b: str = "purchase",
    neg: str = "error",
    within: str = "INTERVAL 30 MINUTES",
) -> DataFrame:
    """Per-entity 'A then B within `within` with no NEG between' — the
    reusable pattern core behind q_sequence_match (unit-tested on
    synthetic sequences in tests/test_sequence_match.py)."""
    fwd = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, W.unboundedFollowing)
    )
    nxt = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.min(F.when(F.col("event_type") == b, F.col("ts")))
        .over(fwd)
        .alias("p_ts"),
        F.min(F.when(F.col("event_type") == neg, F.col("ts")))
        .over(fwd)
        .alias("e_ts"),
    )
    v = nxt.filter(F.col("event_type") == a).select(
        "user_id",
        (
            F.col("p_ts").isNotNull()
            & (F.col("p_ts") <= F.col("ts") + F.expr(within))
            & (F.col("e_ts").isNull() | (F.col("e_ts") >= F.col("p_ts")))
        ).alias("matched"),
        # NTZ-safe exact diff: microsecond tick count, scaled to seconds
        (F.expr("timestampdiff(MICROSECOND, ts, p_ts)") / F.lit(1e6)).alias(
            "lat"
        ),
    )
    return (
        v.groupBy("user_id")
        .agg(
            F.count("*").alias("n_views"),
            F.sum(F.col("matched").cast("int")).alias("n_conversions"),
            F.round(
                F.avg(F.when(F.col("matched"), F.col("lat"))), 2
            ).alias("avg_latency_sec"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# E70: deterministic epoch shuffle — seeded global permutation + balanced
# round-robin sharding for training-data ordering
# ---------------------------------------------------------------------------
# Training loaders need every epoch to see the corpus in a different
# but REPRODUCIBLE order, sharded into equal files. RNG-free recipe:
# sort by md5(doc_id || ':' || epoch_seed) (a pseudorandom permutation
# keyed by the epoch), number rows with the scalable E9 global
# row-number (range-sliced, no single-task window), deal positions
# round-robin into shards — shard sizes are equal by construction
# (±1), unlike hash-sharding's binomial spread. The md5 key is folded
# to a BIGINT (first 15 hex digits) so the E9 slicer can range-split
# on a numeric; doc_id breaks the (practically impossible) fold ties.

_SHUFFLE_SHARDS = 8
_SHUFFLE_SEED = "epoch7"

_SHUFFLE_ORACLE = f"""
WITH k AS (
  SELECT doc_id, n_chars,
         ('0x' || substr(md5(doc_id::VARCHAR || ':{_SHUFFLE_SEED}'), 1, 15))
           ::BIGINT AS knum
  FROM documents
),
r AS (
  SELECT doc_id, n_chars,
         ROW_NUMBER() OVER (ORDER BY knum, doc_id) AS rn
  FROM k
)
SELECT ((rn - 1) % {_SHUFFLE_SHARDS})::BIGINT AS shard,
       COUNT(*)::BIGINT AS n_docs,
       SUM(n_chars)::BIGINT AS char_mass,
       SUM(doc_id)::BIGINT AS docid_checksum
FROM r
GROUP BY 1
ORDER BY 1
"""


@register(
    "q_epoch_shuffle",
    oracle=_SHUFFLE_ORACLE,
    doc=f"deterministic epoch shuffle (E70): RNG-free global permutation "
    f"keyed by md5(doc_id:'{_SHUFFLE_SEED}'), numbered by the scalable "
    "E9 row-number (range-sliced, no global window), dealt round-robin "
    f"into {_SHUFFLE_SHARDS} exactly-balanced shards — the reproducible "
    "epoch-reshuffle a training loader reads sequentially; the "
    "docid_checksum pins the full permutation, not just the sizes",
)
def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators.rownum import global_row_number

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    keyed = docs.select(
        "doc_id",
        "n_chars",
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"),
                               F.lit(f":{_SHUFFLE_SEED}"))),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("knum"),
    )
    numbered = global_row_number(keyed, ["knum", "doc_id"], out_col="rn")
    return (
        numbered.select(
            F.pmod(F.col("rn") - 1, F.lit(_SHUFFLE_SHARDS)).alias("shard"),
            "n_chars",
            "doc_id",
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("char_mass"),
            F.sum("doc_id").alias("docid_checksum"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# E71: exact set-similarity join via prefix filtering — complete, not
# probabilistic: candidates from the rarest-first prefix self-join, then
# exact verification. Oracle = the SAME edge semantics as the naive
# shingle self-join (shared CTE chain), so the oracle proves the prefix
# filter lost nothing.
# ---------------------------------------------------------------------------
from dumpty_spark.queries.dedup import _JACCARD_EDGE_CTES  # noqa: E402

_PREFIX_TAU = 0.7

_PREFIX_ORACLE = f"""
WITH {_JACCARD_EDGE_CTES}
SELECT a_id, b_id,
       ROUND(common::DOUBLE / (ca.n_sh + cb.n_sh - common), 4) AS jac
FROM pairs
JOIN counts ca ON ca.doc_id = a_id
JOIN counts cb ON cb.doc_id = b_id
WHERE ROUND(common::DOUBLE / (ca.n_sh + cb.n_sh - common), 4) >= {_PREFIX_TAU}
ORDER BY a_id, b_id
"""


@register(
    "q_prefix_filter_pairs",
    oracle=_PREFIX_ORACLE,
    doc=f"prefix-filtered exact similarity join (E71): Jaccard >= "
    f"{_PREFIX_TAU} pairs where candidates come ONLY from each doc's "
    "rarest-first shingle prefix (n - ceil(tau*n) + 1 tokens) — the "
    "provably-complete candidate generator (SSJoin/PPJoin lemma), vs "
    "LSH's probabilistic recall; the oracle reuses the naive self-join "
    "edge CTEs, so a hash-match PROVES zero lost pairs",
)
def q_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators.dedup import prefix_filter_pairs

    docs = load_table(spark, sf_dir, "documents")
    return prefix_filter_pairs(
        docs, "doc_id", "text", k=3, threshold=_PREFIX_TAU
    ).orderBy("a_id", "b_id")


# ---------------------------------------------------------------------------
# E72: Poisson bootstrap confidence intervals — the distributed bootstrap
# (resampling without materializing resamples; Chamandy et al.,
# "Estimating uncertainty for massive data streams", Google tech report
# 2012 — public literature). Classic bootstrap draws n rows with
# replacement B times — impossible to coordinate across executors; the
# Poisson approximation gives each row an INDEPENDENT Poisson(1)
# multiplicity per replicate, which is embarrassingly parallel. Draws
# here are md5-derived (engine-parity uniform -> inverse CDF), so both
# engines materialize the IDENTICAL 32 resamples and the oracle is exact.
# ---------------------------------------------------------------------------
_BOOT_B = 32


def _pois_cum() -> list[float]:
    """Cumulative Poisson(1) CDF values P(X <= k), k = 0..7 — enough
    that a 16-bit-granularity uniform can never escape the table."""
    import math

    out, term = [], math.exp(-1.0)
    acc = 0.0
    for k in range(8):
        acc += term
        out.append(acc)
        term /= k + 1
    return out


def _bootstrap_oracle_real() -> str:
    from dumpty_spark.operators.sampling import bucket_fraction_sql

    cum = _pois_cum()
    u = bucket_fraction_sql(["event_id", "rep"])
    case = "CASE " + " ".join(
        f"WHEN {u} < {c!r} THEN {k}" for k, c in enumerate(cum)
    ) + " ELSE 8 END"
    return f"""
WITH reps AS (
  SELECT e.event_type, e.value, r.rep, {case} AS w
  FROM events e, (SELECT UNNEST(generate_series(0, {_BOOT_B - 1})) AS rep) r
),
means AS (
  SELECT event_type, rep, SUM(w * value) / SUM(w) AS m
  FROM reps GROUP BY event_type, rep
),
point AS (
  SELECT event_type, ROUND(AVG(value), 4) AS mean FROM events GROUP BY 1
),
band AS (
  SELECT event_type,
         ROUND(QUANTILE_CONT(m, 0.05), 4) AS ci_lo,
         ROUND(QUANTILE_CONT(m, 0.95), 4) AS ci_hi,
         COUNT(*)::BIGINT AS n_reps
  FROM means GROUP BY 1
)
SELECT event_type, mean, ci_lo, ci_hi, n_reps
FROM point JOIN band USING (event_type)
ORDER BY event_type
"""


@register(
    "q_bootstrap_ci",
    oracle=_bootstrap_oracle_real(),
    doc=f"Poisson bootstrap CI (E72): {_BOOT_B} deterministic md5-derived "
    "Poisson(1) resamples evaluated in ONE pass (explode x B, map-side "
    "weights, two groups-sized aggs — no resample is ever materialized); "
    "per-series mean with p05/p95 bootstrap band — the only bootstrap "
    "that distributes, and the draws are engine-parity so the oracle is "
    "exact, not statistical",
)
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators.sampling import bucket_fraction

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    cum = _pois_cum()
    reps = ev.select(
        "event_id",
        "event_type",
        "value",
        F.explode(F.array(*[F.lit(i) for i in range(_BOOT_B)])).alias("rep"),
    )
    # materialize the uniform draw ONCE per (row, rep): the md5 is the
    # dominant per-row cost and must not be re-evaluated per CASE branch
    reps = reps.withColumn("u", bucket_fraction(["event_id", "rep"]))
    w = F.lit(8)
    for k in range(len(cum) - 1, -1, -1):
        w = F.when(F.col("u") < F.lit(cum[k]), F.lit(k)).otherwise(w)
    means = (
        reps.withColumn("w", w)
        .groupBy("event_type", "rep")
        .agg((F.sum(F.col("w") * F.col("value")) / F.sum("w")).alias("m"))
    )
    point = ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 4).alias("mean")
    )
    band = means.groupBy("event_type").agg(
        F.round(F.percentile("m", F.lit(0.05)), 4).alias("ci_lo"),
        F.round(F.percentile("m", F.lit(0.95)), 4).alias("ci_hi"),
        F.countDistinct("rep").alias("n_reps"),
    )
    return (
        point.join(band, "event_type")
        .select("event_type", "mean", "ci_lo", "ci_hi", "n_reps")
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# E73: Spearman rank correlation — monotone association, outlier-proof
# ---------------------------------------------------------------------------
# Pearson (E60's r) sees only LINEAR association and is dragged by
# heavy tails; Spearman is Pearson on mid-ranks, invariant under any
# monotone transform. Mid-ranks (ties get the average of their rank
# range) via RANK() + (tie_count - 1)/2 — two ranking windows and one
# corr aggregate, identical expressions in both engines.

_SPEARMAN_ORACLE = """
WITH ranked AS (
  SELECT event_type,
         RANK() OVER (PARTITION BY event_type ORDER BY value)
           + (COUNT(*) OVER (PARTITION BY event_type, value) - 1) / 2.0 AS rx,
         RANK() OVER (PARTITION BY event_type ORDER BY ts)
           + (COUNT(*) OVER (PARTITION BY event_type, ts) - 1) / 2.0 AS ry
  FROM events
)
SELECT event_type,
       COUNT(*)::BIGINT AS n,
       ROUND(CORR(rx, ry), 4) AS spearman
FROM ranked
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q_spearman_corr",
    oracle=_SPEARMAN_ORACLE,
    doc="Spearman rank correlation (E73): per-series monotone "
    "association of value vs time via mid-ranks (RANK + (ties-1)/2, "
    "exact tie handling) fed to one corr aggregate — the outlier-proof "
    "complement of the E60 Pearson trend screen",
)
def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", "ts"
    )
    wx = W.partitionBy("event_type").orderBy("value")
    wy = W.partitionBy("event_type").orderBy("ts")
    ranked = ev.select(
        "event_type",
        (
            F.rank().over(wx)
            + (F.count("*").over(W.partitionBy("event_type", "value")) - 1)
            / 2.0
        ).alias("rx"),
        (
            F.rank().over(wy)
            + (F.count("*").over(W.partitionBy("event_type", "ts")) - 1) / 2.0
        ).alias("ry"),
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.corr("rx", "ry"), 4).alias("spearman"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# E74: Mann-Whitney U rank-sum test — nonparametric two-sample drift
# ---------------------------------------------------------------------------
# The ordinal complement of the chi-square screen (E62) and the KS-free
# answer to "did this metric's DISTRIBUTION move between two cohorts?":
# rank everything once over the pooled sample (mid-ranks for ties, same
# arithmetic as E73), U = R1 - n1(n1+1)/2, z-scored with the tie-corrected
# variance. Pure windows + one groups-sized aggregate; the cohort split
# here is first-half vs second-half of each series' time range.

_MWU_ORACLE = """
WITH mid AS (
  SELECT event_type,
         (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS cut_us
  FROM events GROUP BY event_type
),
pooled AS (
  SELECT e.event_type,
         CASE WHEN epoch_us(e.ts) < m.cut_us THEN 0 ELSE 1 END AS grp,
         RANK() OVER (PARTITION BY e.event_type ORDER BY e.value)
           + (COUNT(*) OVER (PARTITION BY e.event_type, e.value) - 1) / 2.0
           AS r,
         COUNT(*) OVER (PARTITION BY e.event_type, e.value) AS t
  FROM events e JOIN mid m USING (event_type)
),
agg AS (
  SELECT event_type,
         SUM(CASE WHEN grp = 0 THEN r END) AS r1,
         SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END)::DOUBLE AS n1,
         SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END)::DOUBLE AS n2,
         SUM(CASE WHEN t > 1 THEN t * t - 1.0 ELSE 0 END) AS tie_raw,
         COUNT(*)::DOUBLE AS n
  FROM pooled GROUP BY event_type
)
SELECT event_type,
       n1::BIGINT AS n_first, n2::BIGINT AS n_second,
       ROUND(r1 - n1 * (n1 + 1) / 2, 1) AS u_stat,
       ROUND((r1 - n1 * (n1 + 1) / 2 - n1 * n2 / 2)
             / SQRT(n1 * n2 / 12.0
                    * ((n + 1) - tie_raw / (n * (n - 1)))), 4)
         AS z
FROM agg
ORDER BY event_type
"""


@register(
    "q_mannwhitney_drift",
    oracle=_MWU_ORACLE,
    doc="Mann-Whitney U drift test (E74): first-half vs second-half of "
    "each series, pooled mid-ranks (tie-exact), U and the tie-corrected "
    "normal z — the nonparametric did-the-distribution-move screen; one "
    "rank window + one groups-sized aggregate",
)
def q_mannwhitney_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    mid = ev.groupBy("event_type").agg(
        # integer epoch-microsecond midpoint — floor-div arithmetic is
        # bit-identical in both engines, unlike interval halving
        ((F.min(us) + F.max(us)) / 2).cast("long").alias("cut_us")
    )
    wr = W.partitionBy("event_type").orderBy("value")
    wt = W.partitionBy("event_type", "value")
    pooled = ev.join(F.broadcast(mid), "event_type").select(
        "event_type",
        F.when(us < F.col("cut_us"), 0).otherwise(1).alias("grp"),
        (F.rank().over(wr) + (F.count("*").over(wt) - 1) / 2.0).alias("r"),
        F.count("*").over(wt).alias("t"),
    )
    agg = pooled.groupBy("event_type").agg(
        F.sum(F.when(F.col("grp") == 0, F.col("r"))).alias("r1"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("double")
        .alias("n1"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("double")
        .alias("n2"),
        F.sum(
            F.when(
                F.col("t") > 1,
                F.col("t") * F.col("t") - 1.0,
            ).otherwise(0.0)
        ).alias("tie_raw"),
        F.count("*").cast("double").alias("n"),
    )
    u = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2
    var = (
        F.col("n1") * F.col("n2") / 12.0
        * (
            (F.col("n") + 1)
            - F.col("tie_raw") / (F.col("n") * (F.col("n") - 1))
        )
    )
    return agg.select(
        "event_type",
        F.col("n1").cast("long").alias("n_first"),
        F.col("n2").cast("long").alias("n_second"),
        F.round(u, 1).alias("u_stat"),
        F.round((u - F.col("n1") * F.col("n2") / 2) / F.sqrt(var), 4).alias("z"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# E75: one-scan correlation matrix — all pairwise corrs in a single pass
# ---------------------------------------------------------------------------
# Feature audits want the full correlation structure, and the naive way
# runs one query per pair. corr is a partial-aggregable moment, so ALL
# pairs fit in ONE scan + one reduce: 6 corrs over lineitem's 4 numeric
# columns here, unpivoted to tidy (x, y, corr) rows. At 100 TB the cost
# is exactly one table scan regardless of how many pairs are requested.

_CORRMAT_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

_CORRMAT_ORACLE = """
WITH m AS (
  SELECT
    CORR(l_quantity, l_extendedprice) AS c01,
    CORR(l_quantity, l_discount) AS c02,
    CORR(l_quantity, l_tax) AS c03,
    CORR(l_extendedprice, l_discount) AS c12,
    CORR(l_extendedprice, l_tax) AS c13,
    CORR(l_discount, l_tax) AS c23
  FROM lineitem
)
SELECT x, y, corr FROM (
  SELECT 'l_quantity' AS x, 'l_extendedprice' AS y, ROUND(c01, 4) AS corr FROM m
  UNION ALL SELECT 'l_quantity', 'l_discount', ROUND(c02, 4) FROM m
  UNION ALL SELECT 'l_quantity', 'l_tax', ROUND(c03, 4) FROM m
  UNION ALL SELECT 'l_extendedprice', 'l_discount', ROUND(c12, 4) FROM m
  UNION ALL SELECT 'l_extendedprice', 'l_tax', ROUND(c13, 4) FROM m
  UNION ALL SELECT 'l_discount', 'l_tax', ROUND(c23, 4) FROM m
)
ORDER BY x, y
"""


@register(
    "q_corr_matrix",
    oracle=_CORRMAT_ORACLE,
    doc="one-scan correlation matrix (E75): all 6 pairwise Pearson "
    "corrs of lineitem's numeric columns as partial-aggregable moments "
    "in a SINGLE scan + reduce, unpivoted to tidy (x, y, corr) rows — "
    "the feature-audit query that stays one pass no matter how many "
    "pairs are requested",
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cols = _CORRMAT_COLS
    aggs = [
        F.round(F.corr(cols[i], cols[j]), 4).alias(f"c_{i}_{j}")
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]
    one = li.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(cols[i]).alias("x"),
                F.lit(cols[j]).alias("y"),
                F.col(f"c_{i}_{j}").alias("corr"),
            )
            for i in range(len(cols))
            for j in range(i + 1, len(cols))
        ]
    )
    return (
        one.select(F.explode(pairs).alias("p"))
        .select("p.x", "p.y", "p.corr")
        .orderBy("x", "y")
    )


# ---------------------------------------------------------------------------
# E76: Kaplan-Meier survival estimator — censoring-aware lifetimes
# ---------------------------------------------------------------------------
# Retention cohorts (E19) answer "how many came back at day k"; the
# product-limit estimator answers "what fraction SURVIVE past t" when
# some spells are still open at observation end (right-censoring) —
# dropping them would bias lifetimes down. Spell = time from each
# purchase to the user's NEXT purchase; a user's final spell has no
# next purchase and is censored at corpus end (still at risk).
# S(t) = prod_{d<=t} (1 - deaths_d / at_risk_d), computed as
# exp(cumsum(ln ·)) over the death-time table — one users-sized pass,
# then a death-times-sized window.

_KM_ORACLE = """
WITH bounds AS (SELECT MAX(ts) AS t_end FROM events),
p AS (
  SELECT user_id, ts,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events WHERE event_type = 'purchase'
),
life AS (
  SELECT user_id,
         date_diff('day', ts, COALESCE(nxt, (SELECT t_end FROM bounds)))
           AS dur,
         (nxt IS NULL) AS censored
  FROM p
),
tab AS (
  SELECT dur,
         SUM(CASE WHEN NOT censored THEN 1 ELSE 0 END) AS d,
         COUNT(*) AS x
  FROM life GROUP BY dur
),
risk AS (
  SELECT dur, d,
         SUM(x) OVER (ORDER BY dur DESC ROWS UNBOUNDED PRECEDING) AS n
  FROM tab
)
SELECT dur AS duration_days,
       n::BIGINT AS n_at_risk,
       d::BIGINT AS n_events,
       CASE WHEN MAX(CASE WHEN d = n THEN 1 ELSE 0 END) OVER (
              ORDER BY dur ROWS UNBOUNDED PRECEDING) = 1
            THEN 0.0
            ELSE ROUND(EXP(SUM(CASE WHEN d < n THEN LN(1.0 - d / n) END)
                   OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING)), 4)
       END AS survival
FROM risk
WHERE d > 0
ORDER BY dur
"""


@register(
    "q_kaplan_meier",
    oracle=_KM_ORACLE,
    doc="Kaplan-Meier survival curve (E76): time-to-next-purchase spells "
    "per user with right-censoring (each purchase starts a clock; the "
    "last spell is censored at corpus end, not dropped), product-limit "
    "survival via exp(cumsum(ln)) over "
    "the death-time table — one users-sized agg + a death-times-sized "
    "window; the censoring-aware lifetime curve E19's retention grid "
    "cannot express",
)
def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    t_end = ev.agg(F.max("ts").alias("t_end"))
    wp = W.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lead("ts").over(wp).alias("nxt")
    )
    life = p.crossJoin(F.broadcast(t_end)).select(
        F.datediff(F.coalesce("nxt", "t_end"), "ts").alias("dur"),
        F.col("nxt").isNull().alias("censored"),
    )
    tab = life.groupBy("dur").agg(
        F.sum(F.when(~F.col("censored"), 1).otherwise(0)).alias("d"),
        F.count("*").alias("x"),
    )
    w_desc = (
        W.orderBy(F.desc("dur")).rowsBetween(W.unboundedPreceding, 0)
    )
    w_asc = W.orderBy("dur").rowsBetween(W.unboundedPreceding, 0)
    # the KM table is death-times-sized (bounded by distinct durations,
    # i.e. days of corpus span) — the single-partition windows here run
    # over at most a few hundred rows by construction
    risk = tab.select("dur", "d", F.sum("x").over(w_desc).alias("n"))
    # at the time where everyone remaining exits (d == n) the survival
    # hits exactly 0 and ln(1 - d/n) is undefined — pin survival to 0
    # from that point on, identically in both engines
    term = F.when(
        F.col("d") < F.col("n"), F.log(1.0 - F.col("d") / F.col("n"))
    )
    dead = F.max((F.col("d") == F.col("n")).cast("int")).over(w_asc)
    return (
        risk.select(
            "dur",
            "d",
            "n",
            F.when(dead == 1, F.lit(0.0))
            .otherwise(F.round(F.exp(F.sum(term).over(w_asc)), 4))
            .alias("survival"),
        )
        .filter(F.col("d") > 0)
        .select(
            F.col("dur").alias("duration_days"),
            F.col("n").alias("n_at_risk"),
            F.col("d").alias("n_events"),
            "survival",
        )
        .orderBy("duration_days")
    )


# ---------------------------------------------------------------------------
# E77: lead-lag cross-correlation — does series A anticipate series B?
# ---------------------------------------------------------------------------
# The autocorrelation screen (E52) is within-series; operations teams
# ask the BETWEEN-series version: do clicks lead purchases, and by how
# many hours? Both series are resampled onto the SAME dense hourly grid
# (missing hours are real zeros, not absent rows — skipping them would
# silently delete the anti-correlated dead hours), then corr(A_t,
# B_{t+lag}) for each lag in a small window. Densification is a
# sequence-explode (grid-sized), the correlation is one partial-agg
# pass per lag over grid×lags rows — hours × 7, metadata-sized even at
# a century of data.

_XCORR_LAGS = 3
_XCORR_A, _XCORR_B = "click", "purchase"

_XCORR_ORACLE = f"""
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
  FROM events
),
grid AS (
  SELECT UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds
),
cnt AS (
  SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS c
  FROM events WHERE event_type IN ('{_XCORR_A}', '{_XCORR_B}')
  GROUP BY 1, 2
),
dense AS (
  SELECT g.h,
         COALESCE(MAX(CASE WHEN c.event_type = '{_XCORR_A}' THEN c.c END), 0)
           AS a,
         COALESCE(MAX(CASE WHEN c.event_type = '{_XCORR_B}' THEN c.c END), 0)
           AS b
  FROM grid g LEFT JOIN cnt c ON c.h = g.h
  GROUP BY g.h
),
lags AS (SELECT UNNEST(generate_series(-{_XCORR_LAGS}, {_XCORR_LAGS})) AS lag),
paired AS (
  SELECT l.lag, d1.a, d2.b
  FROM lags l
  JOIN dense d1 ON TRUE
  JOIN dense d2 ON d2.h = d1.h + l.lag * INTERVAL 1 HOUR
)
SELECT lag::BIGINT AS lag_hours,
       COUNT(*)::BIGINT AS n_hours,
       ROUND(CORR(a, b), 4) AS xcorr
FROM paired
GROUP BY lag
ORDER BY lag
"""


@register(
    "q_crosscorr_leadlag",
    oracle=_XCORR_ORACLE,
    doc=f"lead-lag cross-correlation (E77): corr({_XCORR_A}_t, "
    f"{_XCORR_B}_t+lag) for lags ±{_XCORR_LAGS}h over a DENSE hourly "
    "grid (missing hours are zeros, not dropped rows) — the "
    "between-series anticipation screen completing the E52 "
    "autocorrelation; grid-sized joins, one partial-agg pass",
)
def q_crosscorr_leadlag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = bounds.select(
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h")
    )
    cnt = (
        ev.filter(F.col("event_type").isin(_XCORR_A, _XCORR_B))
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
        )
        .agg(F.count("*").alias("c"))
    )
    dense = (
        grid.join(cnt, "h", "left")
        .groupBy("h")
        .agg(
            F.coalesce(
                F.max(F.when(F.col("event_type") == _XCORR_A, F.col("c"))),
                F.lit(0),
            ).alias("a"),
            F.coalesce(
                F.max(F.when(F.col("event_type") == _XCORR_B, F.col("c"))),
                F.lit(0),
            ).alias("b"),
        )
    )
    lags = spark.range(-_XCORR_LAGS, _XCORR_LAGS + 1).select(
        F.col("id").alias("lag")
    )
    d1 = dense.select(F.col("h").alias("h1_"), F.col("a"))
    d2 = dense.select(F.col("h").alias("h2_"), F.col("b"))
    paired = (
        lags.crossJoin(d1)
        .join(
            d2,
            F.col("h2_")
            == F.col("h1_")
            + F.col("lag") * F.expr("INTERVAL 1 HOUR"),
        )
    )
    return (
        paired.groupBy("lag")
        .agg(
            F.count("*").alias("n_hours"),
            F.round(F.corr("a", "b"), 4).alias("xcorr"),
        )
        .select(F.col("lag").alias("lag_hours"), "n_hours", "xcorr")
        .orderBy("lag_hours")
    )
