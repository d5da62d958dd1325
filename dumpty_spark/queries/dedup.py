"""Deduplication t2 queries (EXT E1/E2) on documents + events."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dumpty_spark.functions import text as X
from dumpty_spark.operators import dedup as D
from dumpty_spark.queries import register
from dumpty_spark.sources import load_table

_EXACT_ORACLE = """
SELECT
  lang,
  COUNT(*) AS n_docs,
  COUNT(DISTINCT text) AS n_distinct_texts,
  COUNT(DISTINCT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))))
    AS n_distinct_fps
FROM documents
GROUP BY lang
ORDER BY lang
"""


@register(
    "q_dedup_exact",
    oracle=_EXACT_ORACLE,
    doc="exact dedup accounting: raw vs distinct-text vs normalized-fingerprint (E1)",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("text").alias("n_distinct_texts"),
            F.countDistinct(X.fingerprint("text")).alias("n_distinct_fps"),
        )
        .orderBy("lang")
    )


_KEEP_FIRST_ORACLE = """
SELECT user_id, event_type, event_id AS first_event_id,
       STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS first_ts, n
FROM (
  SELECT user_id, event_type, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn,
         COUNT(*)    OVER (PARTITION BY user_id, event_type) AS n
  FROM events
)
WHERE rn = 1 AND user_id <= 30
ORDER BY user_id, event_type
"""


@register(
    "q_dedup_keep_first",
    oracle=_KEEP_FIRST_ORACLE,
    doc="dedup-keep-first: one deterministic representative per key (E1)",
)
def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    wc = W.partitionBy("user_id", "event_type")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(wc))
        .filter((F.col("rn") == 1) & (F.col("user_id") <= 30))
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
            "n",
        )
        .orderBy("user_id", "event_type")
    )


_WORDS_SQL = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')"

_JACCARD_ORACLE = f"""
WITH words AS (
  SELECT doc_id, {_WORDS_SQL} AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[p:p+2], ' ') AS shingle
  FROM words, UNNEST(generate_series(1, GREATEST(len(w)-2, 0))) AS t(p)
  WHERE len(w) >= 3
),
counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id,
       ROUND(common::DOUBLE / (ca.n_sh + cb.n_sh - common), 4) AS jac
FROM pairs
JOIN counts ca ON ca.doc_id = a_id
JOIN counts cb ON cb.doc_id = b_id
WHERE common::DOUBLE / (ca.n_sh + cb.n_sh - common) >= 0.8
ORDER BY a_id, b_id
"""


@register(
    "q_ngram_jaccard_pairs",
    oracle=_JACCARD_ORACLE,
    doc="exact 3-gram Jaccard near-dup pairs ≥0.8 via shingle self-join (E2)",
)
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.8).orderBy(
        "a_id", "b_id"
    )


@register(
    "q_minhash_lsh_pairs",
    oracle=None,  # hash-function-specific (xxhash64 sketches) — verified in
    # tests against the exact-Jaccard oracle instead (recall ≥ threshold)
    doc="MinHash+LSH banded near-dup candidates, exact-verified ≥0.8 (E2)",
)
def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=32, bands=8, threshold=0.8
    ).orderBy("a_id", "b_id")


@register(
    "q_simhash_pairs",
    oracle=None,  # 64-bit sign-aggregate sketch, not SQL-expressible portably
    doc="SimHash hamming≤3 near-dup pairs via chunk banding (E2)",
)
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_pairs(docs, "doc_id", "text", max_hamming=3).orderBy(
        "a_id", "b_id"
    )


_EMB_NEARDUP_ORACLE = """
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                    b.embedding::DOUBLE[]), 4) AS sim
FROM embeddings a
JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.35
ORDER BY a_id, b_id
"""


@register(
    "q_dedup_embedding",
    oracle=_EMB_NEARDUP_ORACLE,
    doc="embedding-cosine near-dup pairs via metadata blocking + exact "
    "verify (E2); the SRP-LSH candidate path is exercised in tests on "
    "planted duplicates",
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return D.embedding_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.35, block_col="label"
    ).orderBy("a_id", "b_id")
