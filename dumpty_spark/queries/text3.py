"""BM25 ranked retrieval over the documents table (EXT E4 widening).

The full-text-search primitive a training-data pipeline uses for corpus
exploration and hard-negative mining: Okapi BM25 with the standard
k1=1.2, b=0.75 parameters, scored entirely with built-in Column
arithmetic.

Tokenization is the IDENTICAL regex as dumpty_spark.functions.text.words
so values match the DuckDB oracle exactly.

Scale notes (100 TB): the expensive inputs are corpus statistics —
per-document length (one explode + partial-agg count) and per-term
document frequency, computed ONLY for the query's terms, so the df table
has |query| rows and broadcasts. The score join touches one tf row per
(doc, query-term) hit — Zipf-bounded, far below corpus row count. At
real scale the tf table would come from an inverted index at rest
(doc-frequency and postings precomputed at ingest); the in-flight plan
here is the same shape reading that index's postings.

Ranking uses the ROUNDED score (6 dp) with doc_id as tie-break so a
1-ULP cross-engine double difference cannot reorder near-equal docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.functions import text as X
from dumpty_spark.queries import register
from dumpty_spark.sources import load_table

_WORDS_SQL = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')"

# fixed query: one rare term (df~5% of docs) + two common ones, so idf
# actually differentiates
_QUERY_TERMS = ("dup", "spark", "vector")
_K1 = 1.2
_B = 0.75
_TOP_K = 15

_TERMS_SQL = ", ".join(f"'{t}'" for t in _QUERY_TERMS)

_BM25_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({_WORDS_SQL}) AS token FROM documents
),
len AS (
  SELECT doc_id, COUNT(*)::DOUBLE AS dl FROM tok GROUP BY doc_id
),
stats AS (
  SELECT AVG(dl) AS avgdl, COUNT(*)::DOUBLE AS n_docs FROM len
),
tf AS (
  SELECT doc_id, token, COUNT(*)::DOUBLE AS tf
  FROM tok WHERE token IN ({_TERMS_SQL})
  GROUP BY doc_id, token
),
df AS (
  SELECT token, COUNT(DISTINCT doc_id)::DOUBLE AS df
  FROM tok WHERE token IN ({_TERMS_SQL})
  GROUP BY token
),
scored AS (
  SELECT tf.doc_id,
         SUM(
           ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * ({_K1} + 1)
           / (tf.tf + {_K1} * (1 - {_B} + {_B} * len.dl / stats.avgdl))
         ) AS s
  FROM tf
  JOIN df USING (token)
  JOIN len ON len.doc_id = tf.doc_id, stats
  GROUP BY tf.doc_id
)
SELECT doc_id, ROUND(s, 6) AS bm25
FROM scored
ORDER BY bm25 DESC, doc_id
LIMIT {_TOP_K}
"""


@register(
    "q_bm25_search",
    oracle=_BM25_ORACLE,
    doc="Okapi BM25 top-15 ranked retrieval (k1=1.2, b=0.75): corpus "
    "doc-length + query-term document frequencies (broadcast-sized) "
    "scored with pure Column arithmetic; rounded-score ranking (EXT E4)",
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(X.words("text")).alias("token"))
    hits = tok.filter(F.col("token").isin(*_QUERY_TERMS))

    doc_len = tok.groupBy("doc_id").agg(F.count("*").cast("double").alias("dl"))
    stats = doc_len.agg(
        F.avg("dl").alias("avgdl"), F.count("*").cast("double").alias("n_docs")
    )
    tf = hits.groupBy("doc_id", "token").agg(F.count("*").cast("double").alias("tf"))
    df = hits.groupBy("token").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )

    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    norm = F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))
    contrib = idf * F.col("tf") * (_K1 + 1) / norm

    scored = (
        tf.join(F.broadcast(df), "token")
        .join(doc_len, "doc_id")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(contrib).alias("s"))
    )
    return (
        scored.select("doc_id", F.round("s", 6).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(_TOP_K)
    )
