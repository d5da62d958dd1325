"""Text-analysis t2 queries (EXT E4) on the documents table.

Every oracle uses the IDENTICAL regex strings as
dumpty_spark.functions.text (Java-regex ∩ RE2 common dialect) — value
parity is exact, not approximate. DuckDB regexp_replace needs the 'g'
flag to match Spark's replace-all semantics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.functions import text as X
from dumpty_spark.queries import register
from dumpty_spark.sources import load_table

_WORDS_SQL = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')"
_PUNCT_SQL = "len(regexp_extract_all(text, '[^a-zA-Z0-9 \\t\\n]'))"


_TEXT_STATS_ORACLE = f"""
SELECT
  lang,
  COUNT(*) AS n_docs,
  ROUND(AVG(n_chars), 4)        AS avg_chars_meta,
  ROUND(AVG(LENGTH(text)), 4)   AS avg_chars,
  ROUND(AVG(len({_WORDS_SQL})), 4) AS avg_words,
  ROUND(AVG({_PUNCT_SQL}::DOUBLE / NULLIF(LENGTH(text), 0)), 4) AS avg_punct_ratio
FROM documents
GROUP BY lang
ORDER BY lang
"""


@register(
    "q_text_stats",
    oracle=_TEXT_STATS_ORACLE,
    doc="quality-stat aggregates per language: chars/words/punct (EXT E4)",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars_meta"),
            F.round(F.avg(F.length("text")), 4).alias("avg_chars"),
            F.round(F.avg(X.word_count("text")), 4).alias("avg_words"),
            F.round(F.avg(X.punct_ratio("text")), 4).alias("avg_punct_ratio"),
        )
        .orderBy("lang")
    )


def _stop_sql(pattern: str) -> str:
    return f"len(regexp_extract_all(lower(text), '{pattern}'))"


_LANGID_ORACLE = f"""
WITH scored AS (
  SELECT
    lang,
    {_stop_sql(X.STOPWORDS["en"])} AS s_en,
    {_stop_sql(X.STOPWORDS["de"])} AS s_de,
    {_stop_sql(X.STOPWORDS["fr"])} AS s_fr,
    {_stop_sql(X.STOPWORDS["es"])} AS s_es
  FROM documents
)
SELECT lang, pred_lang, COUNT(*) AS n
FROM (
  SELECT lang,
    CASE
      WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
      WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
      WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
      WHEN s_es > 0 THEN 'es'
      ELSE 'und'
    END AS pred_lang
  FROM scored
)
GROUP BY lang, pred_lang
ORDER BY lang, pred_lang
"""


@register(
    "q_langid_confusion",
    oracle=_LANGID_ORACLE,
    doc="stopword-heuristic language ID vs labeled lang, confusion counts (EXT E4)",
)
def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", X.lang_id("text").alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "pred_lang")
    )


_TOKEN_ORACLE = f"""
SELECT
  source,
  SUM(len(regexp_extract_all(lower(text), '[a-z]+'))
      + len(regexp_extract_all(text, '[0-9]'))
      + {_PUNCT_SQL})::BIGINT    AS total_tokens,
  SUM(len({_WORDS_SQL}))::BIGINT AS total_words,
  SUM(LENGTH(text))::BIGINT      AS total_chars
FROM documents
GROUP BY source
ORDER BY source
"""


@register(
    "q_token_counts",
    oracle=_TOKEN_ORACLE,
    doc="BPE-ish token counting per source (EXT E4)",
)
def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.sum(X.token_count_bpe_ish("text")).alias("total_tokens"),
            F.sum(X.word_count("text")).alias("total_words"),
            F.sum(F.length("text")).alias("total_chars"),
        )
        .orderBy("source")
    )


_FINGERPRINT_ORACLE = """
SELECT
  lang,
  COUNT(DISTINCT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))))
    AS n_fingerprints,
  MIN(md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))))
    AS min_fp
FROM documents
GROUP BY lang
ORDER BY lang
"""


@register(
    "q_fingerprints",
    oracle=_FINGERPRINT_ORACLE,
    doc="md5 document fingerprinting of normalized text (EXT E4)",
)
def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = X.fingerprint("text")
    return (
        docs.groupBy("lang")
        .agg(
            F.countDistinct(fp).alias("n_fingerprints"),
            F.min(fp).alias("min_fp"),
        )
        .orderBy("lang")
    )


_QUALITY_ORACLE = f"""
WITH q AS (
  SELECT
    lang,
    ROUND((
      LEAST(len({_WORDS_SQL})::DOUBLE / 50.0, 1.0)
      + (1.0 - LEAST({_PUNCT_SQL}::DOUBLE / NULLIF(LENGTH(text),0) * 5, 1.0))
      + LEAST(len(regexp_extract_all(lower(text),
          '{X.STOPWORDS["en"]}'))::DOUBLE
          / NULLIF(len({_WORDS_SQL}), 0) * 4, 1.0)
    ) / 3, 4) AS score
  FROM documents
)
SELECT lang, ROUND(AVG(score), 4) AS avg_quality,
       ROUND(MIN(score), 4) AS min_quality,
       ROUND(MAX(score), 4) AS max_quality
FROM q GROUP BY lang ORDER BY lang
"""


@register(
    "q_quality_scores",
    oracle=_QUALITY_ORACLE,
    doc="document quality scoring: length/punct/stopword composite (EXT E4)",
)
def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    q = docs.select("lang", X.quality_score("text").alias("score"))
    return (
        q.groupBy("lang")
        .agg(
            F.round(F.avg("score"), 4).alias("avg_quality"),
            F.round(F.min("score"), 4).alias("min_quality"),
            F.round(F.max("score"), 4).alias("max_quality"),
        )
        .orderBy("lang")
    )


_CHUNK_ORACLE = f"""
WITH w AS (
  SELECT doc_id, {_WORDS_SQL} AS wl FROM documents WHERE doc_id < 100
),
meta AS (
  SELECT doc_id, wl, len(wl) AS n,
         GREATEST(FLOOR((len(wl) - 10 - 1)::DOUBLE / 30)::BIGINT + 1, 1)
           AS n_chunks
  FROM w WHERE len(wl) > 0
)
SELECT doc_id,
       (s * 30)::INTEGER AS start,
       len(wl[s*30+1 : s*30+40]) AS n_chunk_words,
       md5(array_to_string(wl[s*30+1 : s*30+40], ' ')) AS chunk_md5
FROM meta, UNNEST(generate_series(0, n_chunks - 1)) AS t(s)
ORDER BY doc_id, start
"""


@register(
    "q_chunk_documents",
    oracle=_CHUNK_ORACLE,
    doc="long-document chunking: overlapping 40-word windows, stride 30 "
    "(overlap 10), final partial window kept — map-side transform + "
    "explode, one corpus scan, no shuffle (E4 preprocessing)",
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return (
        docs.select("doc_id", X.words("text").alias("__w"))
        .select("doc_id", F.explode(X.chunk_spans(F.col("__w"), 40, 10)).alias("c"))
        .select(
            "doc_id",
            F.col("c.start").alias("start"),
            F.size(F.split("c.chunk_text", " ")).alias("n_chunk_words"),
            F.md5("c.chunk_text").alias("chunk_md5"),
        )
        .orderBy("doc_id", "start")
    )
