"""Round-8 engine extensions, eleventh batch (EXT E217-E219): Wilson
lower-bound ranking, empirical-Bayes mean shrinkage, and the
rendezvous-hashing shard-rebalance audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E217: Wilson lower-bound ranking
# ---------------------------------------------------------------------------
# "Sort by average rating" promotes 1-for-1 flukes; the standard fix
# (Wilson 1927 score interval; the reddit/Evan Miller ranking) sorts by
# the interval's LOWER bound, which penalizes small samples exactly as
# much as the binomial noise warrants. Here: suppliers ranked by
# not-returned rate (l_returnflag != 'R'). One partial-agg scan to
# (n, ontime) per supplier, the bound a fixed closed form of two exact
# BIGINTs (z = 1.96), top-20 via TakeOrderedAndProject — the
# leaderboard primitive for any rate-ranked entity at any scale.

_WILSON_Z = 1.96
_WILSON_TOPK = 20

_WILSON_EXPR = (
    "(phat + {z2} / (2.0 * n) - {z} * SQRT("
    "phat * (1.0 - phat) / n + {z2} / (4.0 * n * n)))"
    " / (1.0 + {z2} / n)"
).format(z=_WILSON_Z, z2=_WILSON_Z * _WILSON_Z)

_WILSON_ORACLE = f"""
WITH r AS (
  SELECT l_suppkey AS suppkey,
         COUNT(*)::BIGINT AS n,
         SUM((l_returnflag != 'R')::INT)::BIGINT AS ok
  FROM lineitem GROUP BY l_suppkey
),
sc AS (
  SELECT suppkey, n, ok,
         ok / CAST(n AS DOUBLE) AS phat
  FROM r
)
SELECT s.s_name, sc.n, sc.ok,
       ROUND(sc.phat, 6) AS naive_rate,
       ROUND({_WILSON_EXPR}, 6) AS wilson_lb
FROM sc JOIN supplier s ON s.s_suppkey = sc.suppkey
ORDER BY wilson_lb DESC, s.s_name
LIMIT {_WILSON_TOPK}
"""


@register(
    "q_wilson_ranking",
    oracle=_WILSON_ORACLE,
    doc="Wilson lower-bound ranking (E217): suppliers ranked by the "
    "95% score-interval lower bound of their not-returned rate — the "
    "small-sample-safe leaderboard (naive rate promotes flukes); one "
    "partial-agg scan, closed form of exact BIGINTs, top-20 heap",
)
def q_wilson_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    r = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.count("*").alias("n"),
        F.sum((F.col("l_returnflag") != "R").cast("int")).alias("ok"),
    )
    sc = r.withColumn("phat", F.col("ok") / F.col("n").cast("double"))
    return (
        sc.join(
            F.broadcast(sup.select("s_suppkey", "s_name")),
            sc["suppkey"] == F.col("s_suppkey"),
        )
        .select(
            "s_name", "n", "ok",
            F.round("phat", 6).alias("naive_rate"),
            F.round(F.expr(_WILSON_EXPR), 6).alias("wilson_lb"),
        )
        .orderBy(F.desc("wilson_lb"), "s_name")
        .limit(_WILSON_TOPK)
    )


# ---------------------------------------------------------------------------
# E218: empirical-Bayes shrinkage of per-group means
# ---------------------------------------------------------------------------
# The other half of the small-sample problem: E217 bounds a RATE, this
# shrinks a MEAN — per-source mean document length pulled toward the
# corpus mean by the James-Stein/normal-normal factor
# B_s = (sigma²/n_s) / (tau² + sigma²/n_s), with sigma² the pooled
# within-source variance and tau² the method-of-moments between-source
# variance (floored at 0). Every corpus-sized aggregate is an exact
# BIGINT (word counts are integers; n, sum, sum-of-squares), and the
# two groups-sized moment sums are integerized to micro-units PER
# GROUP before summing — no float sum over an unordered stream
# anywhere, so both engines derive identical doubles through one
# fixed expression tree. The curation use: ranking
# sources by shrunken quality instead of raw means stops tiny sources
# from topping (or bottoming) the mixture table on noise.

_EB_ORACLE = """
WITH d AS (
  SELECT source,
         len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x != ''))::BIGINT AS wc
  FROM documents
),
g AS (
  SELECT source, COUNT(*)::BIGINT AS n, SUM(wc)::BIGINT AS s,
         SUM(wc * wc)::BIGINT AS ss
  FROM d GROUP BY source
),
tot AS (
  SELECT SUM(n)::BIGINT AS nn, SUM(s)::BIGINT AS stot,
         COUNT(*)::BIGINT AS k,
         SUM(CAST(ROUND(1000000.0 * (ss - s * s / CAST(n AS DOUBLE)), 0)
                  AS BIGINT))::BIGINT AS within_micro,
         SUM(CAST(ROUND(1000000.0 * (s * s / CAST(n AS DOUBLE)), 0)
                  AS BIGINT))::BIGINT AS grp_sq_micro
  FROM g
),
mom AS (
  SELECT nn, stot, k,
         stot / CAST(nn AS DOUBLE) AS m,
         within_micro / 1000000.0 / (nn - k) AS sigma2,
         GREATEST(0.0,
           (grp_sq_micro / 1000000.0 - stot * stot / CAST(nn AS DOUBLE)
            - (k - 1) * within_micro / 1000000.0 / (nn - k))
           / (nn - (SELECT SUM(n * n) FROM g) / CAST(nn AS DOUBLE)))
           AS tau2
  FROM tot
)
SELECT g.source, g.n AS n_docs,
       ROUND(g.s / CAST(g.n AS DOUBLE), 6) AS raw_mean,
       ROUND((mom.sigma2 / g.n) / (mom.tau2 + mom.sigma2 / g.n), 6)
         AS b_weight,
       ROUND(mom.m + (1.0 - (mom.sigma2 / g.n)
                      / (mom.tau2 + mom.sigma2 / g.n))
             * (g.s / CAST(g.n AS DOUBLE) - mom.m), 6) AS shrunk_mean
FROM g, mom
ORDER BY g.source
"""


@register(
    "q_eb_shrinkage",
    oracle=_EB_ORACLE,
    doc="empirical-Bayes mean shrinkage (E218): per-source mean doc "
    "length pulled toward the corpus mean by the normal-normal factor "
    "B = (sigma²/n)/(tau² + sigma²/n), sigma² pooled within, tau² "
    "method-of-moments floored at 0 — all moments exact BIGINTs, one "
    "fixed expression tree; the noise-safe way to rank sources for "
    "mixture decisions",
)
def q_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.functions.text import word_count

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("source", word_count("text").cast("long").alias("wc"))
    g = d.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("wc").alias("s"),
        F.sum(F.col("wc") * F.col("wc")).alias("ss"),
    )
    tot = g.agg(
        F.sum("n").alias("nn"),
        F.sum("s").alias("stot"),
        F.count("*").alias("k"),
        F.sum(
            F.round(
                1000000.0
                * (F.col("ss")
                   - F.col("s") * F.col("s") / F.col("n").cast("double")),
                0,
            ).cast("long")
        ).alias("within_micro"),
        F.sum(
            F.round(
                1000000.0
                * (F.col("s") * F.col("s") / F.col("n").cast("double")),
                0,
            ).cast("long")
        ).alias("grp_sq_micro"),
        F.sum(F.col("n") * F.col("n")).alias("n_sq"),
    )
    mom = tot.select(
        "nn", "stot", "k",
        (F.col("stot") / F.col("nn").cast("double")).alias("m"),
        (
            F.col("within_micro") / 1000000.0 / (F.col("nn") - F.col("k"))
        ).alias("sigma2"),
        F.greatest(
            F.lit(0.0),
            (
                F.col("grp_sq_micro") / 1000000.0
                - F.col("stot") * F.col("stot") / F.col("nn").cast("double")
                - (F.col("k") - 1)
                * F.col("within_micro") / 1000000.0
                / (F.col("nn") - F.col("k"))
            )
            / (
                F.col("nn")
                - F.col("n_sq") / F.col("nn").cast("double")
            ),
        ).alias("tau2"),
    )
    b = (F.col("sigma2") / F.col("n")) / (
        F.col("tau2") + F.col("sigma2") / F.col("n")
    )
    raw = F.col("s") / F.col("n").cast("double")
    return (
        g.crossJoin(F.broadcast(mom))
        .select(
            "source",
            F.col("n").alias("n_docs"),
            F.round(raw, 6).alias("raw_mean"),
            F.round(b, 6).alias("b_weight"),
            F.round(
                F.col("m") + (F.lit(1.0) - b) * (raw - F.col("m")), 6
            ).alias("shrunk_mean"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# E219: rendezvous-hashing shard-rebalance audit
# ---------------------------------------------------------------------------
# The partitioning question behind every store in this repo: when the
# shard count changes N → N+1, how much data MOVES? Modulo hashing
# moves ~N/(N+1) of all keys (a full reshuffle); rendezvous /
# highest-random-weight hashing (Thaler-Ravishankar 1996, the
# consistent-hashing family) moves exactly the 1/(N+1) that the new
# shard wins. The audit computes BOTH assignments for every doc key at
# N=16 and N=17 from the portable md5 weight (shard = argmax over
# shards of md5(shard # key) — plan-literal arithmetic, no ties by
# construction) and reports exact moved counts. This is the measured
# justification for HRW-keyed store layouts over hash-mod at 100 TB:
# growing the cluster must not rewrite the corpus.

_RDV_ORACLE = """
WITH keys AS (SELECT doc_id FROM documents),
a AS (
  SELECT doc_id,
         list_position(l16, list_aggregate(l16, 'max')) - 1 AS s16,
         list_position(l17, list_aggregate(l17, 'max')) - 1 AS s17,
         h % 16 AS m16, h % 17 AS m17
  FROM (
    SELECT doc_id,
           list_transform(generate_series(0, 15),
             s -> md5(s::VARCHAR || '#' || doc_id::VARCHAR)) AS l16,
           list_transform(generate_series(0, 16),
             s -> md5(s::VARCHAR || '#' || doc_id::VARCHAR)) AS l17,
           ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS h
    FROM keys
  )
)
SELECT COUNT(*)::BIGINT AS n_keys,
       SUM((s16 != s17)::INT)::BIGINT AS moved_rdv,
       ROUND(SUM((s16 != s17)::INT) / CAST(COUNT(*) AS DOUBLE), 6)
         AS pct_rdv,
       SUM((m16 != m17)::INT)::BIGINT AS moved_mod,
       ROUND(SUM((m16 != m17)::INT) / CAST(COUNT(*) AS DOUBLE), 6)
         AS pct_mod
FROM a
"""


@register(
    "q_shard_rebalance",
    oracle=_RDV_ORACLE,
    doc="rendezvous-hashing shard-rebalance audit (E219): every doc key "
    "assigned at N=16 and N=17 shards under HRW (argmax of md5(shard#"
    "key) — portable, tie-free) AND under hash-mod; exact moved counts "
    "show HRW moves ~1/17 of keys where mod moves ~16/17 — the measured "
    "case for HRW-keyed store layouts (growing the cluster must not "
    "rewrite the corpus)",
)
def q_shard_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def weights(n: int) -> F.Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(n - 1)),
            lambda s: F.md5(
                F.concat(
                    s.cast("string"), F.lit("#"),
                    F.col("doc_id").cast("string"),
                )
            ),
        )

    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    a = docs.select(
        "doc_id",
        weights(16).alias("l16"),
        weights(17).alias("l17"),
        h.alias("h"),
    ).select(
        (F.array_position(F.col("l16"), F.array_max("l16")) - 1).alias("s16"),
        (F.array_position(F.col("l17"), F.array_max("l17")) - 1).alias("s17"),
        (F.col("h") % 16).alias("m16"),
        (F.col("h") % 17).alias("m17"),
    )
    return a.agg(
        F.count("*").alias("n_keys"),
        F.sum((F.col("s16") != F.col("s17")).cast("int")).alias("moved_rdv"),
        F.round(
            F.sum((F.col("s16") != F.col("s17")).cast("int"))
            / F.count("*").cast("double"),
            6,
        ).alias("pct_rdv"),
        F.sum((F.col("m16") != F.col("m17")).cast("int")).alias("moved_mod"),
        F.round(
            F.sum((F.col("m16") != F.col("m17")).cast("int"))
            / F.count("*").cast("double"),
            6,
        ).alias("pct_mod"),
    )
