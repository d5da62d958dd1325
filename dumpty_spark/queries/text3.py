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


def bm25_scored(docs: DataFrame) -> DataFrame:
    """Okapi BM25 scores for the fixed query over every matching doc:
    (doc_id, bm25 rounded 6dp). Shared by the top-15 retrieval query and
    the hybrid RRF fusion."""
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
    return scored.select("doc_id", F.round("s", 6).alias("bm25"))


@register(
    "q_bm25_search",
    oracle=_BM25_ORACLE,
    doc="Okapi BM25 top-15 ranked retrieval (k1=1.2, b=0.75): corpus "
    "doc-length + query-term document frequencies (broadcast-sized) "
    "scored with pure Column arithmetic; rounded-score ranking (EXT E4)",
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return bm25_scored(docs).orderBy(F.desc("bm25"), "doc_id").limit(_TOP_K)


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of BM25 and vector rankings
# ---------------------------------------------------------------------------
# The standard hybrid-search shape for a training-data / RAG corpus:
# lexical (BM25) and semantic (cosine vs a query embedding) top-50
# lists, fused with RRF score = Σ 1/(60 + rank). Both ranks order by the
# ROUNDED score with doc_id tie-break, so the fusion is engine-stable.

_RRF_K = 60
_RRF_DEPTH = 50

_HYBRID_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({_WORDS_SQL}) AS token FROM documents
),
len AS (SELECT doc_id, COUNT(*)::DOUBLE AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT AVG(dl) AS avgdl, COUNT(*)::DOUBLE AS n_docs FROM len),
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
bm AS (
  SELECT tf.doc_id,
         ROUND(SUM(
           ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * ({_K1} + 1)
           / (tf.tf + {_K1} * (1 - {_B} + {_B} * len.dl / stats.avgdl))
         ), 6) AS bm25
  FROM tf
  JOIN df USING (token)
  JOIN len ON len.doc_id = tf.doc_id, stats
  GROUP BY tf.doc_id
),
tr AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r
  FROM bm
),
cs AS (
  SELECT b.vec_id AS doc_id,
         ROUND(list_cosine_similarity(q.embedding::DOUBLE[],
                                      b.embedding::DOUBLE[]), 4) AS sim
  FROM embeddings b, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
  WHERE b.vec_id != 0
),
vr AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id) AS r
  FROM cs
),
fused AS (
  SELECT COALESCE(t.doc_id, v.doc_id) AS doc_id,
         ROUND(COALESCE(1.0 / ({_RRF_K} + t.r), 0)
               + COALESCE(1.0 / ({_RRF_K} + v.r), 0), 6) AS rrf
  FROM (SELECT * FROM tr WHERE r <= {_RRF_DEPTH}) t
  FULL OUTER JOIN (SELECT * FROM vr WHERE r <= {_RRF_DEPTH}) v
    ON t.doc_id = v.doc_id
)
SELECT doc_id, rrf
FROM fused
ORDER BY rrf DESC, doc_id
LIMIT {_TOP_K}
"""


@register(
    "q_hybrid_search_rrf",
    oracle=_HYBRID_ORACLE,
    doc="hybrid retrieval via reciprocal-rank fusion: BM25 top-50 and "
    "cosine-vs-query-embedding top-50 fused with RRF(60); both rankings "
    "order by rounded score + doc_id so fusion is engine-stable — the "
    "lexical+semantic retrieval stack over documents ⋈ embeddings "
    "(EXT E38)",
)
def q_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from dumpty_spark.operators import similarity as S

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # TakeOrdered top-50 first (no global window over the scored corpus),
    # then rank inside the 50-row result — identical order keys, so the
    # ranks match the oracle's ROW_NUMBER.
    tw = Window.orderBy(F.desc("bm25"), "doc_id")
    tr = (
        bm25_scored(docs)
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(_RRF_DEPTH)
        .select("doc_id", F.row_number().over(tw).alias("r"))
    )
    # vector ranking: brute-force cosine vs doc 0's embedding; the
    # operator already ranks by (rounded sim desc, n_id)
    vr = (
        S.brute_force_topk(
            emb, emb.filter(F.col("vec_id") == 0), k=_RRF_DEPTH
        )
        .select(F.col("n_id").alias("doc_id"), F.col("rnk").alias("r"))
    )
    fused = tr.alias("t").join(
        vr.alias("v"), F.col("t.doc_id") == F.col("v.doc_id"), "full_outer"
    )
    rrf = F.round(
        F.coalesce(1.0 / (_RRF_K + F.col("t.r")), F.lit(0.0))
        + F.coalesce(1.0 / (_RRF_K + F.col("v.r")), F.lit(0.0)),
        6,
    )
    return (
        fused.select(
            F.coalesce(F.col("t.doc_id"), F.col("v.doc_id")).alias("doc_id"),
            rrf.alias("rrf"),
        )
        .orderBy(F.desc("rrf"), "doc_id")
        .limit(_TOP_K)
    )
