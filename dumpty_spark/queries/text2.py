"""Corpus-level text analytics (EXT E4 widening): heavy hitters and
TF-IDF term weighting over the documents table.

Both queries tokenize with the IDENTICAL regex as
dumpty_spark.functions.text.words (Java-regex ∩ RE2 common dialect) so
values match the DuckDB oracle exactly.

Scale notes (100 TB): token frequency is a map-side-combinable count —
the shuffle carries one row per distinct token per partition, not one
per occurrence. TF-IDF's document-frequency table is vocabulary-sized
(Zipf: millions of rows at corpus scale, not billions); the tf⋈df join
is left to AQE, which broadcasts it while it fits and shuffles on the
token key beyond that. Nothing in either plan materializes the full
token stream on one node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dumpty_spark.functions import text as X
from dumpty_spark.queries import register
from dumpty_spark.sources import load_table

_WORDS_SQL = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')"


_HEAVY_HITTERS_ORACLE = f"""
SELECT token, COUNT(*)::BIGINT AS n
FROM (SELECT unnest({_WORDS_SQL}) AS token FROM documents)
GROUP BY token
ORDER BY n DESC, token
LIMIT 20
"""


@register(
    "q_heavy_hitters",
    oracle=_HEAVY_HITTERS_ORACLE,
    doc="corpus-wide top-20 token frequencies — explode + partial-agg "
    "count + TakeOrdered; the shuffle is vocabulary-sized (EXT E4)",
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(X.words("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(20)
    )


# TF-IDF: document frequency comes from the FULL corpus; only the
# reported top-3-per-doc slice is doc_id-limited, so the idf weights are
# the real ones. Ranking uses the ROUNDED score (6 dp) with the token as
# tie-break — ranking on the raw double would let a 1-ULP cross-engine
# difference reorder near-equal terms.
_TFIDF_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({_WORDS_SQL}) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
),
df AS (
  SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token
),
n AS (SELECT COUNT(*)::DOUBLE AS n_docs FROM documents),
scored AS (
  SELECT doc_id, token,
         ROUND(tf * ln(n_docs / df), 6) AS tfidf
  FROM tf JOIN df USING (token), n
  WHERE doc_id < 50
)
SELECT doc_id, token, tfidf
FROM (
  SELECT doc_id, token, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, token) AS rk
  FROM scored
)
WHERE rk <= 3
ORDER BY doc_id, token
"""


@register(
    "q_tfidf_top_terms",
    oracle=_TFIDF_ORACLE,
    doc="TF-IDF top-3 terms per document: corpus-wide document "
    "frequencies (vocab-sized AQE join) + partitioned ranking window "
    "(EXT E4)",
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(X.words("text")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.filter(F.col("doc_id") < 50)
        .join(df, "token")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "token")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .drop("rk")
        .orderBy("doc_id", "token")
    )
