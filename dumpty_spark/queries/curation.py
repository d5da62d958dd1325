"""Round-4 corpus-curation extensions: temperature-scaled source mixing
(E82), per-source dedup-rate report (E83), adaptive per-source quality
threshold (E84)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E82: temperature-scaled source mixing — the multilingual-pretraining knob
# ---------------------------------------------------------------------------
# Sampling shares w_s ∝ share_s^alpha (alpha < 1 upweights small sources;
# the exponent used by the public multilingual-LM recipes), then
# per-source acceptance rates that hit a global token budget in
# expectation: rate_s = min(1, T·w_s / tokens_s). Membership is the
# md5-fraction draw shared by the whole sampling family, so the mix is a
# pure function of (data, alpha, budget) — reproducible on any engine,
# any partitioning. Two metadata-sized aggregation passes; rates ride a
# broadcast map into one filter.

_TEMP_ALPHA = 0.5
_TEMP_BUDGET_FRAC = 0.4  # target total = 40% of corpus tokens


def _temperature_oracle() -> str:
    from dumpty_spark.operators.sampling import bucket_fraction_sql

    frac = bucket_fraction_sql(["doc_id"])
    return f"""
WITH toks AS (
  SELECT doc_id, source,
         len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x != '')) AS n_tok
  FROM documents
),
per_source AS (SELECT source, SUM(n_tok)::DOUBLE AS t FROM toks GROUP BY source),
total AS (SELECT SUM(t) AS tt FROM per_source),
weights AS (
  SELECT source, t,
         POW(t / tt, {_TEMP_ALPHA})
           / SUM(POW(t / tt, {_TEMP_ALPHA})) OVER () AS w
  FROM per_source CROSS JOIN total
),
rates AS (
  SELECT w.source,
         LEAST(1.0, ({_TEMP_BUDGET_FRAC} * tt) * w.w / w.t) AS rate
  FROM weights w CROSS JOIN total
),
kept AS (
  SELECT k.source, k.n_tok
  FROM toks k JOIN rates r USING (source)
  WHERE {frac} < r.rate
)
SELECT r.source,
       ROUND(r.rate, 6) AS rate,
       COUNT(k.n_tok)::BIGINT AS kept_docs,
       COALESCE(SUM(k.n_tok), 0)::BIGINT AS kept_tokens
FROM rates r LEFT JOIN kept k ON k.source = r.source
GROUP BY r.source, r.rate
ORDER BY r.source
"""


@register(
    "q_temperature_mix",
    oracle=_temperature_oracle(),
    doc=f"temperature-scaled source mixing (E82): sampling shares ∝ "
    f"token-share^{_TEMP_ALPHA} (the multilingual-pretraining "
    "upweight-the-tail knob), acceptance rates sized to a "
    f"{_TEMP_BUDGET_FRAC:.0%}-of-corpus token budget in expectation, "
    "membership via the family's md5-fraction draw — fully "
    "deterministic; two metadata-sized agg passes + one filtered scan",
)
def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.functions.text import words as words_col
    from dumpty_spark.operators.sampling import bucket_fraction

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.size(words_col("text")).alias("n_tok")
    ).localCheckpoint()  # reused by the stats pass AND the filter pass

    per_source = {
        r["source"]: float(r["t"])
        for r in toks.groupBy("source").agg(F.sum("n_tok").alias("t")).collect()
    }  # sources-sized: metadata, not data
    total = sum(per_source.values())
    shares = {s: t / total for s, t in per_source.items()}
    zsum = sum(sh**_TEMP_ALPHA for sh in shares.values())
    weights = {s: sh**_TEMP_ALPHA / zsum for s, sh in shares.items()}
    rates = {
        s: min(1.0, (_TEMP_BUDGET_FRAC * total) * weights[s] / per_source[s])
        for s in per_source
    }
    rate_col = F.create_map(
        *[x for s, r in sorted(rates.items()) for x in (F.lit(s), F.lit(r))]
    )[F.col("source")]
    kept = toks.filter(bucket_fraction(["doc_id"]) < rate_col)
    rates_df = spark.createDataFrame(
        sorted(rates.items()), "source string, rate double"
    )
    return (
        rates_df.join(
            kept.groupBy("source").agg(
                F.count("*").alias("kept_docs"),
                F.sum("n_tok").alias("kept_tokens"),
            ),
            "source",
            "left",
        )
        .select(
            "source",
            F.round("rate", 6).alias("rate"),
            F.coalesce("kept_docs", F.lit(0)).alias("kept_docs"),
            F.coalesce("kept_tokens", F.lit(0)).alias("kept_tokens"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# E83: per-source dedup-rate report — the curation dashboard number
# ---------------------------------------------------------------------------
# "How duplicated is each source?" drives mixing and acquisition
# decisions. Near-dup clusters (the E11 components over the E2a pair
# graph) rolled up per source: docs, docs sitting in some >1-member
# cluster, the dup rate, distinct clusters touched.


def _dedup_report_oracle() -> str:
    from dumpty_spark.queries.dedup import _JACCARD_EDGE_CTES

    return f"""
WITH RECURSIVE {_JACCARD_EDGE_CTES},
edges AS (
  SELECT a_id, b_id
  FROM pairs
  JOIN counts ca ON ca.doc_id = a_id
  JOIN counts cb ON cb.doc_id = b_id
  WHERE ROUND(common::DOUBLE / (ca.n_sh + cb.n_sh - common), 4) >= 0.8
),
sym AS (
  SELECT a_id AS src, b_id AS dst FROM edges
  UNION ALL
  SELECT b_id, a_id FROM edges
),
nodes AS (SELECT DISTINCT src AS id FROM sym),
walk(node, root) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT s.dst, w.root FROM walk w JOIN sym s ON s.src = w.node
),
comp AS (SELECT node AS doc_id, MIN(root) AS cluster_id FROM walk GROUP BY node)
SELECT d.source,
       COUNT(*)::BIGINT AS n_docs,
       COUNT(c.cluster_id)::BIGINT AS n_dup_docs,
       ROUND(COUNT(c.cluster_id)::DOUBLE / COUNT(*), 4) AS dup_rate,
       COUNT(DISTINCT c.cluster_id)::BIGINT AS n_clusters
FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
GROUP BY d.source
ORDER BY d.source
"""


@register(
    "q_dedup_report",
    oracle=_dedup_report_oracle(),
    doc="per-source dedup-rate report (E83): near-dup components "
    "(3-gram Jaccard ≥ 0.8 → connected components) rolled up per "
    "source — docs, docs in a multi-member cluster, dup rate, clusters "
    "touched; the curation dashboard that prices each source's "
    "redundancy before mixing",
)
def q_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators import dedup as D

    from dumpty_spark.queries.shared_graph import jaccard_pair_graph

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pair_graph(spark, sf_dir)
    comp = D.connected_components(pairs).select(
        F.col("id").alias("doc_id"), "cluster_id"
    )
    return (
        docs.select("doc_id", "source")
        .join(comp, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count("cluster_id").alias("n_dup_docs"),
            F.round(F.count("cluster_id") / F.count("*"), 4).alias("dup_rate"),
            F.countDistinct("cluster_id").alias("n_clusters"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# E84: adaptive per-source quality threshold — quantile-cut filtering
# ---------------------------------------------------------------------------
# A global quality cutoff over-prunes clean sources and under-prunes
# noisy ones; the standard fix is a PER-SOURCE quantile cut ("drop each
# source's worst q%"). Exact interpolated quantile per source (the
# sources-sized stats frame broadcasts back), then one filtered scan.

_QCUT = 0.2  # drop each source's bottom 20% by quality score


def _adaptive_quality_oracle() -> str:
    from dumpty_spark.queries.text import _PUNCT_SQL, _WORDS_SQL
    from dumpty_spark.functions import text as X

    score = f"""ROUND((
      LEAST(len({_WORDS_SQL})::DOUBLE / 50.0, 1.0)
      + (1.0 - LEAST({_PUNCT_SQL}::DOUBLE / NULLIF(LENGTH(text),0) * 5, 1.0))
      + LEAST(len(regexp_extract_all(lower(text),
          '{X.STOPWORDS["en"]}'))::DOUBLE
          / NULLIF(len({_WORDS_SQL}), 0) * 4, 1.0)
    ) / 3, 4)"""
    return f"""
WITH q AS (SELECT source, {score} AS score FROM documents),
cut AS (
  SELECT source, quantile_cont(score, {_QCUT}) AS thr
  FROM q GROUP BY source
)
SELECT q.source,
       ROUND(ANY_VALUE(cut.thr), 4) AS threshold,
       COUNT(*)::BIGINT AS n_docs,
       SUM(CASE WHEN q.score >= cut.thr THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       ROUND(AVG(CASE WHEN q.score >= cut.thr THEN q.score END), 4)
         AS kept_avg_quality
FROM q JOIN cut USING (source)
GROUP BY q.source
ORDER BY q.source
"""


@register(
    "q_adaptive_quality_cut",
    oracle=_adaptive_quality_oracle(),
    doc=f"adaptive per-source quality threshold (E84): exact "
    f"interpolated {_QCUT:.0%}-quantile of the composite quality score "
    "PER SOURCE (a global cutoff over-prunes clean sources), stats "
    "frame broadcast back over one filtered scan — kept counts and "
    "kept-average quality per source",
)
def q_adaptive_quality_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.functions import text as X

    docs = load_table(spark, sf_dir, "documents")
    q = docs.select("source", X.quality_score("text").alias("score"))
    cut = q.groupBy("source").agg(
        F.percentile("score", F.lit(_QCUT)).alias("thr")
    )
    return (
        q.join(F.broadcast(cut), "source")
        .groupBy("source")
        .agg(
            F.round(F.first("thr"), 4).alias("threshold"),
            F.count("*").alias("n_docs"),
            F.sum(
                F.when(F.col("score") >= F.col("thr"), 1).otherwise(0)
            ).alias("n_kept"),
            F.round(
                F.avg(F.when(F.col("score") >= F.col("thr"), F.col("score"))),
                4,
            ).alias("kept_avg_quality"),
        )
        .orderBy("source")
    )
