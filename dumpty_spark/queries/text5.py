"""Round-4 text/dedup extensions: complete edit-distance join (E78),
PMI collocations (E79), tf-weighted Jaccard verification (E80)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E78: complete edit-distance similarity join — PassJoin segment filter
# ---------------------------------------------------------------------------
# The oracle is the NAIVE length-filtered self-join with levenshtein —
# hash-matching against it proves the segment-filtered candidate
# generation is COMPLETE (missed pair => missing row => mismatch), the
# same proof shape as q_prefix_filter_pairs for Jaccard.

_EDIT_D = 2

_EDIT_ORACLE = f"""
WITH p AS (
  SELECT doc_id, substr(text, 1, 40) AS s
  FROM documents WHERE text IS NOT NULL
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       levenshtein(a.s, b.s)::INTEGER AS dist
FROM p a JOIN p b
  ON a.doc_id < b.doc_id
 AND abs(length(a.s) - length(b.s)) <= {_EDIT_D}
 AND levenshtein(a.s, b.s) <= {_EDIT_D}
ORDER BY a_id, b_id
"""


@register(
    "q_edit_distance_pairs",
    oracle=_EDIT_ORACLE,
    doc=f"complete edit-distance join (E78): all pairs with "
    f"levenshtein <= {_EDIT_D} over 40-char document prefixes via "
    "PassJoin pigeonhole segment filtering (d+1 segments, ±d "
    "displacement probes, exact verify — no all-pairs stage anywhere); "
    "oracle is the naive quadratic join, so the hash match PROVES the "
    "candidate generation misses nothing",
)
def q_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators.editdist import edit_distance_pairs

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.substring("text", 1, 40).alias("prefix"))
    )
    return edit_distance_pairs(docs, "doc_id", "prefix", d=_EDIT_D).orderBy(
        "a_id", "b_id"
    )


# ---------------------------------------------------------------------------
# E79: PMI collocations — statistically-bound word pairs
# ---------------------------------------------------------------------------
# Pointwise mutual information over ADJACENT word pairs (Church & Hanks
# 1990, public literature): pmi = log2( p(a,b) / (p(a) p(b)) ). The
# collocation extractor every tokenizer/phrase-mining pass wants; a
# min-count floor keeps the estimator out of its high-variance tail.
# All partial-aggregable: one corpus scan for bigrams, one for unigrams.

_PMI_MIN = 25

_PMI_ORACLE = f"""
WITH words AS (
  SELECT doc_id, w, idx
  FROM (
    SELECT doc_id,
           UNNEST(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                              x -> x != '')) AS w,
           UNNEST(generate_series(1, len(list_filter(
             string_split_regex(lower(text), '[^a-z0-9]+'),
             x -> x != '')))) AS idx
    FROM documents
  )
),
bigrams AS (
  SELECT a.w AS wa, b.w AS wb, COUNT(*) AS nab
  FROM words a JOIN words b
    ON a.doc_id = b.doc_id AND b.idx = a.idx + 1
  GROUP BY a.w, b.w
),
uni AS (SELECT w, COUNT(*) AS n FROM words GROUP BY w),
tot AS (
  SELECT (SELECT SUM(nab) FROM bigrams)::DOUBLE AS nb,
         (SELECT SUM(n) FROM uni)::DOUBLE AS nw
)
SELECT wa, wb, nab,
       ROUND(log2((nab / t.nb) / ((ua.n / t.nw) * (ub.n / t.nw))), 4) AS pmi
FROM bigrams
JOIN uni ua ON ua.w = wa
JOIN uni ub ON ub.w = wb
CROSS JOIN tot t
WHERE nab >= {_PMI_MIN}
ORDER BY pmi DESC, wa, wb
LIMIT 20
"""


@register(
    "q_pmi_collocations",
    oracle=_PMI_ORACLE,
    doc=f"PMI collocations (E79): top-20 adjacent word pairs by "
    "pointwise mutual information (log2 p(a,b)/(p(a)p(b)), min count "
    f"{_PMI_MIN}) — the phrase-mining signal for tokenizer/vocab "
    "curation; two partial-aggregated corpus scans (bigrams via "
    "posexplode + self-zip, unigrams), counts joined groups-sized",
)
def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.functions.text import words as words_col

    docs = load_table(spark, sf_dir, "documents")
    ws = docs.select(words_col("text").alias("ws"))
    # bigrams map-side: zip words with their own tail, then one groupBy
    bigrams = (
        ws.select(
            F.explode(
                F.arrays_zip(
                    F.expr("slice(ws, 1, size(ws) - 1)"),
                    F.expr("slice(ws, 2, size(ws) - 1)"),
                )
            ).alias("p")
        )
        .select(
            F.col("p").getItem("0").alias("wa"),
            F.col("p").getItem("1").alias("wb"),
        )
        .groupBy("wa", "wb")
        .agg(F.count("*").alias("nab"))
    )
    uni = (
        ws.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    nb = bigrams.agg(F.sum("nab").cast("double").alias("nb"))
    nw = uni.agg(F.sum("n").cast("double").alias("nw"))
    ua = uni.select(F.col("w").alias("wa"), F.col("n").alias("na"))
    ub = uni.select(F.col("w").alias("wb"), F.col("n").alias("nb_"))
    return (
        bigrams.filter(F.col("nab") >= _PMI_MIN)
        .join(ua, "wa")
        .join(ub, "wb")
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nw))
        .select(
            "wa", "wb", "nab",
            F.round(
                F.log2(
                    (F.col("nab") / F.col("nb"))
                    / ((F.col("na") / F.col("nw")) * (F.col("nb_") / F.col("nw")))
                ),
                4,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "wa", "wb")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# E80: tf-weighted Jaccard over near-dup candidates
# ---------------------------------------------------------------------------
# Set Jaccard treats a shingle seen 40 times like one seen once;
# weighted Jaccard ( sum_min(tf) / sum_max(tf) ) is the standard
# repetition-aware refinement. Computed only on the CANDIDATE pairs the
# set-Jaccard join already surfaced (>= 0.5 here), so the cost is
# candidates × their shingle multisets — never all-pairs.

_WJACCARD_ORACLE = """
WITH tf AS (
  SELECT doc_id, sh, COUNT(*) AS tf
  FROM (
    SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
    FROM (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x != '') AS w
      FROM documents
    ), UNNEST(generate_series(1, len(w) - 2)) AS t(i)
  )
  GROUP BY doc_id, sh
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM tf GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS c
  FROM tf a JOIN tf b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
cand AS (
  SELECT a_id, b_id FROM inter
  JOIN sizes sa ON sa.doc_id = a_id
  JOIN sizes sb ON sb.doc_id = b_id
  WHERE ROUND(c::DOUBLE / (sa.n + sb.n - c), 4) >= 0.5
),
pairsh AS (
  SELECT c.a_id, c.b_id, s.sh FROM cand c JOIN tf s ON s.doc_id = c.a_id
  UNION
  SELECT c.a_id, c.b_id, s.sh FROM cand c JOIN tf s ON s.doc_id = c.b_id
),
m AS (
  SELECT p.a_id, p.b_id,
         COALESCE(ta.tf, 0) AS tf_a, COALESCE(tb.tf, 0) AS tf_b
  FROM pairsh p
  LEFT JOIN tf ta ON ta.doc_id = p.a_id AND ta.sh = p.sh
  LEFT JOIN tf tb ON tb.doc_id = p.b_id AND tb.sh = p.sh
)
SELECT a_id, b_id,
       ROUND(SUM(LEAST(tf_a, tf_b))::DOUBLE
             / SUM(GREATEST(tf_a, tf_b)), 4) AS weighted_jac
FROM m GROUP BY a_id, b_id
ORDER BY a_id, b_id
"""


@register(
    "q_weighted_jaccard",
    oracle=_WJACCARD_ORACLE,
    doc="tf-weighted Jaccard (E80): sum-min/sum-max over shingle "
    "term frequencies, computed ONLY on the candidate pairs the set-"
    "Jaccard join surfaced (threshold 0.5) — the repetition-aware "
    "refinement pass of a dedup pipeline; candidates-sized joins, "
    "never all-pairs",
)
def q_weighted_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators import dedup as D

    from dumpty_spark.functions.text import words as words_col
    from dumpty_spark.operators.util import ensure_parallelism

    docs = load_table(spark, sf_dir, "documents")
    cand = D.jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5).select(
        "a_id", "b_id"
    )
    # RAW shingle multiset (shingle_sets dedups per doc — set semantics
    # is exactly what weighted Jaccard exists to refine, so re-derive
    # with multiplicities kept; the n>=3 guard avoids sequence(1,0)
    # descending on short docs)
    ws = ensure_parallelism(
        docs.select(F.col("doc_id").alias("id"), words_col("text").alias("w"))
    )
    raw = ws.select(
        "id",
        F.explode(
            F.when(
                F.size("w") >= 3,
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - 2),
                    lambda p: F.array_join(F.slice("w", p, 3), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("shingle"),
    )
    sh = raw.groupBy("id", "shingle").agg(F.count("*").alias("tf"))
    a = sh.select(
        F.col("id").alias("a_id"), "shingle", F.col("tf").alias("tf_a")
    )
    b = sh.select(
        F.col("id").alias("b_id"), "shingle", F.col("tf").alias("tf_b")
    )
    # full multiset union per pair: join each side's shingles onto the
    # candidate list, then merge on (pair, shingle) with outer semantics
    ua = cand.join(a, "a_id").select("a_id", "b_id", "shingle", "tf_a")
    ub = cand.join(b, "b_id").select("a_id", "b_id", "shingle", "tf_b")
    merged = ua.join(ub, ["a_id", "b_id", "shingle"], "full").select(
        "a_id", "b_id",
        F.coalesce("tf_a", F.lit(0)).alias("tf_a"),
        F.coalesce("tf_b", F.lit(0)).alias("tf_b"),
    )
    return (
        merged.groupBy("a_id", "b_id")
        .agg(
            F.round(
                F.sum(F.least("tf_a", "tf_b"))
                / F.sum(F.greatest("tf_a", "tf_b")),
                4,
            ).alias("weighted_jac")
        )
        .orderBy("a_id", "b_id")
    )
