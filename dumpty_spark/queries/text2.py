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


# ---------------------------------------------------------------------------
# Unigram-LM surprisal: fit the cheapest possible language model (corpus
# unigram frequencies) in one aggregation pass, then score every document
# by mean -ln p(token) — the classic "perplexity filter" stage of an LLM
# data pipeline, minus the neural net. Two passes over the token stream:
# the model is a vocabulary-sized table (AQE-broadcast while it fits),
# the scoring join shuffles on the token key beyond that.
# ---------------------------------------------------------------------------

_SURPRISAL_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang, unnest({_WORDS_SQL}) AS token FROM documents
),
model AS (
  SELECT token, COUNT(*)::DOUBLE AS n_t FROM tok GROUP BY token
),
total AS (SELECT SUM(n_t) AS n_total FROM model),
per_doc AS (
  SELECT doc_id, ANY_VALUE(lang) AS lang,
         AVG(-ln(n_t / n_total)) AS surprisal
  FROM tok JOIN model USING (token), total
  GROUP BY doc_id
)
SELECT lang,
       COUNT(*)                 AS n_docs,
       ROUND(AVG(surprisal), 4) AS avg_surprisal,
       ROUND(MIN(surprisal), 4) AS min_surprisal,
       ROUND(MAX(surprisal), 4) AS max_surprisal
FROM per_doc
GROUP BY lang
ORDER BY lang
"""


@register(
    "q_unigram_surprisal",
    oracle=_SURPRISAL_ORACLE,
    doc="unigram-LM perplexity filter: corpus token probabilities fit in "
    "one pass, every doc scored by mean -ln p(token), per-lang rollup "
    "(EXT E4)",
)
def q_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", "lang", F.explode(X.words("text")).alias("token"))
    model = tok.groupBy("token").agg(F.count("*").cast("double").alias("n_t"))
    total = model.agg(F.sum("n_t").alias("n_total"))
    probs = model.join(F.broadcast(total)).select(
        "token", (-F.log(F.col("n_t") / F.col("n_total"))).alias("nll")
    )
    per_doc = (
        tok.join(probs, "token")
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            F.avg("nll").alias("surprisal"),
        )
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("surprisal"), 4).alias("avg_surprisal"),
            F.round(F.min("surprisal"), 4).alias("min_surprisal"),
            F.round(F.max("surprisal"), 4).alias("max_surprisal"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition signal: the duplicate-bigram fraction per doc,
# computed entirely map-side with array functions (no shuffle until the
# per-source rollup) — at 100 TB this is a free column on the corpus
# scan, exactly how repetition filters run in production pipelines.
# ---------------------------------------------------------------------------

_REPETITION_ORACLE = f"""
WITH w AS (
  SELECT source, {_WORDS_SQL} AS w FROM documents
),
bg AS (
  SELECT source,
         CASE WHEN len(w) >= 2 THEN
           list_transform(generate_series(1, len(w) - 1),
                          p -> array_to_string(w[p:p+1], ' '))
         ELSE [] END AS bigrams
  FROM w
),
r AS (
  SELECT source,
         CASE WHEN len(bigrams) > 0 THEN
           1.0 - len(list_distinct(bigrams))::DOUBLE / len(bigrams)
         END AS rep_ratio
  FROM bg
)
SELECT source,
       COUNT(rep_ratio)          AS n_docs,
       ROUND(AVG(rep_ratio), 4)  AS avg_rep_ratio,
       SUM(CASE WHEN rep_ratio > 0.2 THEN 1 ELSE 0 END)::BIGINT
                                 AS n_repetitive
FROM r
GROUP BY source
ORDER BY source
"""


@register(
    "q_repetition_ratio",
    oracle=_REPETITION_ORACLE,
    doc="duplicate-bigram repetition ratio per doc (Gopher-style quality "
    "rule) — map-side array arithmetic, one rollup shuffle (EXT E4)",
)
def q_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = X.words("text")
    rows = docs.select("source", w.alias("w"))
    n = F.size("w")
    pos = F.sequence(F.lit(1), n - 1)
    bigrams = F.when(
        n >= 2,
        F.transform(pos, lambda p: F.array_join(F.slice("w", p, 2), " ")),
    ).otherwise(F.array().cast("array<string>"))
    rep = F.when(
        F.size("bigrams") > 0,
        1.0 - F.size(F.array_distinct("bigrams")) / F.size("bigrams"),
    )
    return (
        rows.select("source", bigrams.alias("bigrams"))
        .select("source", rep.alias("rep_ratio"))
        .groupBy("source")
        .agg(
            F.count("rep_ratio").alias("n_docs"),
            F.round(F.avg("rep_ratio"), 4).alias("avg_rep_ratio"),
            F.sum(
                F.when(F.col("rep_ratio") > 0.2, 1).otherwise(0)
            ).alias("n_repetitive"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Train/test contamination: which held-out docs share an 8-gram with the
# training split — the decontamination sweep every eval set needs. The
# join key is the distinct 8-gram shingle; random text makes most
# 8-grams unique, so the shingle⋈shingle join only fans out on genuinely
# shared passages (the near-dup planted pairs). At corpus scale the
# train side's shingle set is written once and reused across eval sets.
# ---------------------------------------------------------------------------

_TRAIN_SOURCES = ("src0", "src1", "src2", "src3", "src4")

_CONTAMINATION_ORACLE = f"""
WITH w AS (
  SELECT doc_id, source, {_WORDS_SQL} AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, source, array_to_string(w[p:p+7], ' ') AS shingle
  FROM w, UNNEST(generate_series(1, GREATEST(len(w) - 7, 0))) AS t(p)
),
pairs AS (
  SELECT DISTINCT te.source AS test_source, te.doc_id AS test_doc,
                  tr.doc_id AS train_doc
  FROM sh te JOIN sh tr ON te.shingle = tr.shingle
  WHERE te.source NOT IN {_TRAIN_SOURCES!r}
    AND tr.source IN {_TRAIN_SOURCES!r}
)
SELECT test_source,
       COUNT(DISTINCT test_doc) AS n_contaminated_docs,
       COUNT(*)                 AS n_doc_pairs
FROM pairs
GROUP BY test_source
ORDER BY test_source
"""


@register(
    "q_contamination",
    oracle=_CONTAMINATION_ORACLE,
    doc="train/test contamination sweep: held-out docs sharing an 8-gram "
    "with the training split, shingle-keyed join (EXT E2/E4)",
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", "source", X.words("text").alias("__w")).select(
        "doc_id",
        "source",
        F.explode(X.shingles_from_words(F.col("__w"), 8)).alias("shingle"),
    )
    is_train = F.col("source").isin(*_TRAIN_SOURCES)
    test_sh = sh.filter(~is_train).select(
        F.col("source").alias("test_source"),
        F.col("doc_id").alias("test_doc"),
        "shingle",
    )
    train_sh = sh.filter(is_train).select(
        F.col("doc_id").alias("train_doc"), "shingle"
    )
    pairs = (
        test_sh.join(train_sh, "shingle")
        .select("test_source", "test_doc", "train_doc")
        .distinct()
    )
    return (
        pairs.groupBy("test_source")
        .agg(
            F.countDistinct("test_doc").alias("n_contaminated_docs"),
            F.count("*").alias("n_doc_pairs"),
        )
        .orderBy("test_source")
    )


# ---------------------------------------------------------------------------
# PII scrub (EXT E4): the fixtures are synthetic words with no PII, so the
# query plants deterministic emails/phones per doc_id and then proves the
# scrub removes exactly those — counts and the redacted text both
# oracle-checked (md5 so the hash compare stays compact).

_PII_ORACLE = f"""
WITH planted AS (
  SELECT doc_id, lang,
         text
         || CASE WHEN doc_id % 3 != 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 2 = 0
                 THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END AS t
  FROM documents
)
SELECT doc_id, lang,
       LENGTH(regexp_extract_all(t, '{X.PII_EMAIL_RE}')) AS n_emails,
       LENGTH(regexp_extract_all(t, '{X.PII_PHONE_RE}')) AS n_phones,
       md5(regexp_replace(regexp_replace(t, '{X.PII_EMAIL_RE}', '[EMAIL]', 'g'),
                          '{X.PII_PHONE_RE}', '[PHONE]', 'g')) AS redacted_md5
FROM planted
ORDER BY doc_id
"""


@register(
    "q_pii_redact",
    oracle=_PII_ORACLE,
    doc="PII scrub pass: email/phone redaction with typed placeholders + "
    "per-doc audit counts — pure Column regexps (Java ∩ RE2 dialect), "
    "map-side, no UDF (EXT E4)",
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.withColumn(
        "t",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 != 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(
                    F.lit(" call +1-555-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ),
    )
    n_emails, n_phones = X.pii_counts("t")
    return planted.select(
        "doc_id",
        "lang",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        F.md5(X.redact_pii("t")).alias("redacted_md5"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# ExactSubstr-style duplicated spans (operators/dedup.py:duplicated_spans).

_DUP_SPANS_ORACLE = f"""
WITH w AS (
  SELECT doc_id, {_WORDS_SQL} AS wa FROM documents
),
grams AS (
  SELECT doc_id, i AS pos,
         substr(md5(array_to_string(list_slice(wa, i, i + 7), ' ')), 1, 16) AS h
  FROM w, UNNEST(generate_series(1, len(wa) - 7)) AS t(i)
  WHERE len(wa) >= 8
),
dup AS (SELECT h FROM grams GROUP BY h HAVING COUNT(*) > 1),
flagged AS (SELECT doc_id, pos FROM grams WHERE h IN (SELECT h FROM dup)),
lagged AS (
  SELECT doc_id, pos,
         LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM flagged
),
isl AS (
  SELECT doc_id, pos,
         SUM(CASE WHEN prev IS NULL OR pos - prev > 8 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM lagged
),
spans AS (
  SELECT doc_id, island, MAX(pos) - MIN(pos) + 8 AS covered
  FROM isl GROUP BY 1, 2
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_dup_spans, SUM(covered) AS dup_tokens
  FROM spans GROUP BY 1
)
SELECT w.doc_id,
       COALESCE(p.n_dup_spans, 0) AS n_dup_spans,
       COALESCE(p.dup_tokens, 0)::BIGINT AS dup_tokens,
       len(w.wa) AS n_tokens,
       ROUND(COALESCE(p.dup_tokens, 0) * 1.0 / NULLIF(len(w.wa), 0), 6)
         AS dup_fraction
FROM w LEFT JOIN per_doc p USING (doc_id)
ORDER BY w.doc_id
"""


@register(
    "q_dup_spans",
    oracle=_DUP_SPANS_ORACLE,
    doc="ExactSubstr-style duplicated-span scoring (Lee et al. "
    "relationally): corpus-wide repeated word 8-grams -> per-doc merged "
    "token spans -> dup_fraction; gram shuffle on a 64-bit fingerprint, "
    "gaps-and-islands windows bounded by doc length (EXT E1')",
)
def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators.dedup import duplicated_spans

    docs = load_table(spark, sf_dir, "documents")
    return (
        duplicated_spans(docs, "doc_id", "text", k=8)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Hashing-trick vectorizer: tokens -> fixed 256-dim bucket space via the
# md5 bucket hash (engine-portable), emitted SPARSE (doc, bucket, tf) —
# the representation that scales (dense arrays at dim 10^5 waste 99%
# zeros; downstream cosine is a bucket equi-join, see q_tfidf_top_terms).

_FEATURE_HASH_DIM = 256

_FEAT_HASH_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, UNNEST({_WORDS_SQL}) AS tok FROM documents
)
SELECT doc_id,
       ('0x' || substr(md5(tok), 1, 4))::INTEGER % {_FEATURE_HASH_DIM} AS bucket,
       COUNT(*) AS tf
FROM toks
GROUP BY 1, 2
ORDER BY doc_id, bucket
"""


@register(
    "q_feature_hashing",
    oracle=_FEAT_HASH_ORACLE,
    doc="hashing-trick term-frequency vectorizer: tokens folded into a "
    "fixed 256-bucket space via portable md5 buckets, sparse "
    "(doc, bucket, tf) output — one explode + partial-agg shuffle, the "
    "unbounded-vocab-safe featurizer (EXT E4)",
)
def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(X.words("text")).alias("tok")
    )
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("int")
        % _FEATURE_HASH_DIM
    )
    return (
        toks.groupBy("doc_id", bucket.alias("bucket"))
        .agg(F.count("*").alias("tf"))
        .orderBy("doc_id", "bucket")
    )
