"""Round-8 engine extensions, sixth batch (EXT E204-E205): corpus
boilerplate n-gram census and the raw text-lines ingestion source —
the analysis pass and the entry format an LLM training-data pipeline
runs before anything else in this repo touches the corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.functions.text import positional_ngrams, words
from dumpty_spark.queries import register
from dumpty_spark.session import scratch_cleanup, warehouse_scratch
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E204: corpus boilerplate n-gram census
# ---------------------------------------------------------------------------
# Pairwise dup detection (E2/E2'/q_dup_spans) answers "which DOCS
# repeat each other"; the census answers the corpus-level question a
# curation pass asks first: "which PHRASES repeat across documents"
# (navigation chrome, license banners, template fragments — the
# boilerplate that C4/Gopher-style pipelines scrub line-by-line).
# Plan shape: one projection materializes the word split (the
# transform-lambda re-evaluation trap, see shingles_from_words), a
# positional 4-gram explode, then TWO stacked partial-agg groupBys —
# (gram, doc) occurrence counts, then per-gram doc_freq + total
# occurrences. Deliberately NOT count(DISTINCT doc_id) in one agg:
# mixing a distinct and a plain count makes Catalyst plan an Expand
# (every input row duplicated per aggregate group), while the stacked
# form is two map-side-combined shuffles whose first output is already
# near-distinct size. TakeOrderedAndProject caps the result at the
# top-20 by (doc_freq desc, ngram) — a driver-merged heap, never a
# global sort, at any corpus size.

_NGRAM_N = 4
_BOILERPLATE_TOPK = 20

_BOILERPLATE_ORACLE = f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x != '') AS w
  FROM documents
),
g AS (
  SELECT doc_id, array_to_string(w[p:p+{_NGRAM_N - 1}], ' ') AS g
  FROM w, UNNEST(generate_series(1, GREATEST(len(w) - {_NGRAM_N - 1}, 0))) t(p)
),
per_doc AS (
  SELECT g, doc_id, COUNT(*) AS c FROM g GROUP BY g, doc_id
),
census AS (
  SELECT g, COUNT(*) AS doc_freq, SUM(c) AS n_occurrences
  FROM per_doc GROUP BY g
)
SELECT g AS ngram, doc_freq::BIGINT AS doc_freq,
       n_occurrences::BIGINT AS n_occurrences
FROM census
WHERE doc_freq >= 2
ORDER BY doc_freq DESC, ngram
LIMIT {_BOILERPLATE_TOPK}
"""


@register(
    "q_boilerplate_ngrams",
    oracle=_BOILERPLATE_ORACLE,
    doc="corpus boilerplate census (E204): top-20 word 4-grams by "
    "cross-document frequency — positional n-gram explode, stacked "
    "(gram,doc)->gram partial-agg groupBys (no count-distinct Expand), "
    "TakeOrderedAndProject top-k; the phrase-level repetition report "
    "C4-style boilerplate scrubbing is driven by",
)
def q_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", words("text").alias("w"))
    grams = w.select(
        "doc_id", F.explode(positional_ngrams(F.col("w"), _NGRAM_N)).alias("g")
    )
    per_doc = grams.groupBy("g", "doc_id").agg(F.count("*").alias("c"))
    census = per_doc.groupBy("g").agg(
        F.count("*").alias("doc_freq"), F.sum("c").alias("n_occurrences")
    )
    return (
        census.filter(F.col("doc_freq") >= 2)
        .orderBy(F.desc("doc_freq"), "g")
        .limit(_BOILERPLATE_TOPK)
        .select(F.col("g").alias("ngram"), "doc_freq", "n_occurrences")
    )


# ---------------------------------------------------------------------------
# E205: raw text-lines ingestion source, round-trip proven
# ---------------------------------------------------------------------------
# The entry format of a 100 TB text corpus is not parquet — it is
# directories of compressed line-delimited text (Common-Crawl-style
# WET shards). The source contract this query proves at rest:
#   write  — one record per line, tab-separated (id, source, text),
#            hive-partitioned by source, gzip per file (the write path
#            sizes files; at prod scale zstd/bgzip would be chosen
#            BECAUSE plain gzip is non-splittable — one scan task per
#            file, so file sizing at write time IS the read
#            parallelism knob, exactly the reference's
#            target-size feedback loop in reverse),
#   read   — spark.read.text recovers the hive partition column,
#            per-line parse is a bounded 3-way split (pure Column),
#            provenance = partition dir + input_file_name(),
#   proof  — per source, the XOR of a 60-bit md5 fingerprint over
#            (doc_id | text) of the READ-BACK lines equals the same
#            XOR over the source-of-truth table (order-independent,
#            collision-negligible), every parsed inline source tag
#            equals its hive partition value, and >= 1 file exists.
# The hashed surface states the contract as constants; the booleans
# are computed, not assumed. Fixture text is [a-z0-9 ] only, so the
# tab framing needs no escaping; a production writer would escape \\t
# and \\n (documented, not needed to prove the source mechanics).

_TEXTLINES_ORACLE = """
SELECT source,
       COUNT(*)::BIGINT AS n_docs,
       SUM(len(text))::BIGINT AS sum_chars,
       TRUE AS roundtrip_ok
FROM documents
GROUP BY source
ORDER BY source
"""

@register(
    "q_textlines_ingest",
    oracle=_TEXTLINES_ORACLE,
    doc="raw text-lines source round trip (E205): documents written as "
    "gzip tab-delimited lines hive-partitioned by source, read back "
    "via spark.read.text with partition recovery, parsed with one "
    "bounded split — per-source XOR-of-md5 content fingerprint equals "
    "the source table's, inline source tag equals the hive partition, "
    ">=1 file per source; the LLM-corpus entry format as a proven "
    "source contract",
)
def q_textlines_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scratch = warehouse_scratch(spark, "textlines")
    out_dir = os.path.join(scratch, "lines")
    try:
        (
            docs.select(
                "source",
                F.concat_ws(
                    "\t", F.col("doc_id").cast("string"), "source", "text"
                ).alias("value"),
            )
            .repartition("source")
            .write.partitionBy("source")
            .option("compression", "gzip")
            .mode("overwrite")
            .text(out_dir)
        )

        back = spark.read.text(out_dir)  # recovers hive column `source`
        parts = F.split("value", "\t", 3)
        parsed = back.select(
            F.col("source").alias("part_source"),
            parts.getItem(0).alias("doc_id"),
            parts.getItem(1).alias("inline_source"),
            parts.getItem(2).alias("text"),
            F.input_file_name().alias("file"),
        )

        def fp(id_col: F.Column, text_col: F.Column) -> F.Column:
            return F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", id_col.cast("string"), text_col)),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")

        got = (
            parsed.withColumn("fp", fp(F.col("doc_id"), F.col("text")))
            .groupBy("part_source")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum(F.length("text")).alias("sum_chars"),
                F.expr("bit_xor(fp)").alias("content_fp"),
                F.sum(
                    F.when(F.col("inline_source") == F.col("part_source"), 0)
                    .otherwise(1)
                ).alias("tag_mismatch"),
                F.countDistinct("file").alias("n_files"),
            )
            .withColumnRenamed("part_source", "source")
        )
        want = (
            docs.withColumn("fp", fp(F.col("doc_id"), F.col("text")))
            .groupBy("source")
            .agg(F.expr("bit_xor(fp)").alias("want_fp"))
        )
        rows = (
            got.join(want, "source")
            .select(
                "source",
                "n_docs",
                "sum_chars",
                (
                    (F.col("content_fp") == F.col("want_fp"))
                    & (F.col("tag_mismatch") == 0)
                    & (F.col("n_files") >= 1)
                ).alias("roundtrip_ok"),
            )
            .collect()
        )
    finally:
        scratch_cleanup(spark, scratch)
    return spark.createDataFrame(
        [(r["source"], r["n_docs"], r["sum_chars"], bool(r["roundtrip_ok"]))
         for r in rows],
        "source string, n_docs long, sum_chars long, roundtrip_ok boolean",
    ).orderBy("source")
