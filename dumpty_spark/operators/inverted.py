"""Inverted index at rest (EXT E66) with incremental append (E66').

Completes the retrieval story the in-flight BM25 query documents
(queries/text3.py: "at real scale the tf table would come from an
inverted index at rest"): postings materialized once at ingest so a
query touches only its own terms' data, exactly like the IVF/LSH
at-rest layouts do for vectors.

Layout:
- ``postings/`` parquet partitioned by ``b = pmod(xxhash64(term),
  n_buckets)`` with rows (term, doc_id, tf). A query's terms map to a
  handful of buckets → partition pruning skips the rest of the index on
  disk; the residual term filter is pushed into the pruned scan.
- ``doclen/`` parquet (doc_id, dl) + ``stats.json`` (n_docs, avgdl).

Per-term document frequency is deliberately NOT denormalized at build
time: df is computed at search time from the (hits-sized) pruned
postings, which keeps the layout append-only — an ingest batch with
fresh doc ids just writes additional files into the same bucket
partitions (``inverted_index_append``), and df stays exact because
postings for a term are disjoint across batches. Corpus stats update in
closed form (weighted avgdl), so appends never rescan history — the
E14 incremental-store contract applied to text retrieval.

Scoring is Okapi BM25 with the same constants and the same
rounded-score ranking as the in-flight path — the registry query proves
index-based search ≡ direct computation against the DuckDB oracle.

Scale shape: build is two partial-aggregated passes over the exploded
token stream (tf per (term, doc), dl per doc); search reads query-term
postings only (hits-sized), joins doc lengths (AQE broadcasts the hits
side when small), and ranks with a bounded TakeOrdered top-k.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75
N_BUCKETS = 64


def _bucket(term_col):
    return F.pmod(F.xxhash64(term_col), F.lit(N_BUCKETS))


def _tokenize(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    from dumpty_spark.functions.text import words
    from dumpty_spark.operators.util import ensure_parallelism

    return ensure_parallelism(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("t"))
    ).select("doc_id", F.explode(words("t")).alias("term"))


def _write_batch(tok: DataFrame, index_dir: str, mode: str):
    """One tokenize pass feeds everything: tf is the only aggregate over
    the exploded token stream (cached postings-sized, spill-safe);
    doclen derives from tf (dl = Σ tf per doc) and the batch stats from
    doclen, so the corpus is scanned/exploded exactly once per batch.
    Returns the batch's (n_docs, avgdl) stats row, computed while tf is
    still cached."""
    tf = tok.groupBy("term", "doc_id").agg(
        F.count("*").cast("double").alias("tf")
    ).cache()

    # the postings write and the doclen write+stats consume the SAME
    # cached tf into disjoint directories — overlap them on driver
    # threads (r11 optimization, guide §2.6); n_postings comes from the
    # cached frame instead of a full re-read of the just-written
    # postings parquet (guide §2.4)
    from dumpty_spark.operators.util import run_overlapped

    def _postings():
        (
            tf.withColumn("b", _bucket(F.col("term")))
            .repartition("b")
            .write.mode(mode)
            .partitionBy("b")
            .parquet(os.path.join(index_dir, "postings"))
        )
        return tf.count()

    def _doclen():
        doclen = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
        doclen.write.mode(mode if mode == "append" else "overwrite").parquet(
            os.path.join(index_dir, "doclen")
        )
        return doclen.agg(
            F.count("*").cast("double").alias("n"), F.avg("dl").alias("avgdl")
        ).first()

    n_postings, row = run_overlapped(
        tf.sparkSession, [_postings, _doclen]
    )
    tf.unpersist()
    return row, n_postings


def inverted_index_build(
    docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Materialize postings + doc lengths + corpus stats. Returns
    {"n_docs", "n_postings"}."""
    tok = _tokenize(docs, id_col, text_col)
    row, n_postings = _write_batch(tok, index_dir, "overwrite")
    with open(os.path.join(index_dir, "stats.json"), "w") as fh:
        json.dump({"n_docs": row["n"], "avgdl": row["avgdl"]}, fh)
    return {"n_docs": int(row["n"]), "n_postings": n_postings}


def inverted_index_append(
    docs_delta: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Fold a new ingest batch (FRESH doc ids — the E14 contract) into
    the index: postings/doclen files append into the existing layout,
    stats update in closed form. History is never re-read."""
    tok = _tokenize(docs_delta, id_col, text_col)
    row, _ = _write_batch(tok, index_dir, "append")
    with open(os.path.join(index_dir, "stats.json")) as fh:
        stats = json.load(fh)
    n0, a0 = stats["n_docs"], stats["avgdl"]
    n1 = float(row["n"] or 0.0)
    a1 = float(row["avgdl"] or 0.0)
    merged = {
        "n_docs": n0 + n1,
        "avgdl": (n0 * a0 + n1 * a1) / (n0 + n1) if (n0 + n1) else 0.0,
    }
    with open(os.path.join(index_dir, "stats.json"), "w") as fh:
        json.dump(merged, fh)
    return {"n_new_docs": int(n1)}


def spark_read_postings(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(index_dir, "postings"))


def inverted_search(
    spark: SparkSession,
    index_dir: str,
    terms: list[str],
    topk: int = 15,
) -> DataFrame:
    """BM25 top-k over the at-rest index: bucket partition pruning +
    term-pushed filter → postings hits only; df aggregated from the
    hits (exact across appended batches); returns (doc_id, bm25) with
    the rounded-score, doc_id-tie-break ranking of the in-flight path."""
    with open(os.path.join(index_dir, "stats.json")) as fh:
        stats = json.load(fh)
    n_docs, avgdl = float(stats["n_docs"]), float(stats["avgdl"])

    # bucket ids computed Spark-side to guarantee the same xxhash64
    bucket_rows = (
        spark.createDataFrame([(t,) for t in terms], ["term"])
        .select(_bucket(F.col("term")).alias("b"))
        .distinct()
        .collect()
    )
    bucket_ids = [int(r["b"]) for r in bucket_rows]

    hits = (
        spark_read_postings(spark, index_dir)
        .filter(F.col("b").isin(bucket_ids))
        .filter(F.col("term").isin(terms))
    )
    df_tbl = hits.groupBy("term").agg(
        F.count("*").cast("double").alias("df")  # postings are per-doc rows
    )
    doclen = spark.read.parquet(os.path.join(index_dir, "doclen"))

    idf = F.log(1 + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    norm = F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.lit(avgdl))
    contrib = idf * F.col("tf") * (K1 + 1) / norm
    scored = (
        hits.join(F.broadcast(df_tbl), "term")
        .join(doclen, "doc_id")
        .groupBy("doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("bm25"))
    )
    return scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(topk)
