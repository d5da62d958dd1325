"""Round-8 engine extensions, ninth batch (EXT E211-E213): the
binaryFile opaque-asset source, Good-Turing frequency smoothing, and
the dedup threshold-sensitivity curve.
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
# E211: binaryFile opaque-asset source, round-trip proven
# ---------------------------------------------------------------------------
# The multimodal family (E5) processes blobs already IN a table; this
# proves the other half — how opaque assets on disk BECOME a table:
# Spark's `binaryFile` source reads whole files as (path,
# modificationTime, length, content) rows with hive partition
# recovery, which is the ingestion shape for image/audio shards at
# 100 TB (one row per asset, bytes untouched, provenance = path +
# partition). The audit writes each source's documents as ONE
# uncompressed line-delimited file (repartition("source") +
# partitionBy("source") → exactly one file per leaf), reads the
# directory back through binaryFile, and proves three exact
# contracts per source: (a) the decoded content XOR-fingerprints to
# the source table (order-independent md5 over doc_id|text), (b) the
# byte LENGTH Spark reports equals sum(len(text)) + n_docs inline
# tabs + n_docs newlines accounted exactly, and (c) one file per
# partition leaf. modificationTime is the one nondeterministic column
# — observed but excluded from the hashed surface by design.

_BINARYFILE_ORACLE = """
SELECT source,
       COUNT(*)::BIGINT AS n_docs,
       1::BIGINT AS n_files,
       (SUM(len(text)) + 2 * COUNT(*)
        + SUM(len(CAST(doc_id AS VARCHAR))))::BIGINT AS total_bytes,
       TRUE AS roundtrip_ok
FROM documents
GROUP BY source
ORDER BY source
"""


@register(
    "q_binaryfile_ingest",
    oracle=_BINARYFILE_ORACLE,
    doc="binaryFile opaque-asset source (E211): one line-delimited file "
    "per source partition, read back as whole-file (path, length, "
    "content) rows with hive recovery — per-source content "
    "XOR-fingerprint == source table, reported byte length == exact "
    "char accounting, one file per leaf; the asset-shard ingestion "
    "shape for multimodal corpora",
)
def q_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scratch = warehouse_scratch(spark, "binaryfile")
    out_dir = os.path.join(scratch, "assets")

    def fp(id_col: F.Column, text_col: F.Column) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat_ws("|", id_col.cast("string"), text_col)), 1, 15
            ),
            16,
            10,
        ).cast("long")

    try:
        (
            docs.select(
                "source",
                F.concat_ws(
                    "\t", F.col("doc_id").cast("string"), "text"
                ).alias("value"),
            )
            .repartition("source")
            .write.partitionBy("source")
            .mode("overwrite")
            .text(out_dir)
        )

        blobs = spark.read.format("binaryFile").load(out_dir)
        per_file = blobs.select(
            "source",
            "path",
            "length",
            F.decode("content", "UTF-8").alias("txt"),
        )
        lines = per_file.select(
            "source",
            "path",
            "length",
            F.explode(
                F.array_remove(F.split("txt", "\n"), "")
            ).alias("line"),
        ).select(
            "source",
            "path",
            "length",
            F.split("line", "\t", 2).getItem(0).alias("doc_id"),
            F.split("line", "\t", 2).getItem(1).alias("text"),
        )
        got = (
            lines.withColumn("fp", fp(F.col("doc_id"), F.col("text")))
            .groupBy("source")
            .agg(
                F.count("*").alias("n_docs"),
                F.countDistinct("path").alias("n_files"),
                F.first("length").alias("file_bytes"),
                F.expr("bit_xor(fp)").alias("content_fp"),
                F.sum(
                    F.length("text") + F.length("doc_id") + F.lit(2)
                ).alias("acc_bytes"),
            )
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
                "n_files",
                F.col("acc_bytes").alias("total_bytes"),
                (
                    (F.col("content_fp") == F.col("want_fp"))
                    & (F.col("file_bytes") == F.col("acc_bytes"))
                ).alias("roundtrip_ok"),
            )
            .collect()
        )
    finally:
        scratch_cleanup(spark, scratch)
    return spark.createDataFrame(
        [
            (r["source"], r["n_docs"], r["n_files"], r["total_bytes"],
             bool(r["roundtrip_ok"]))
            for r in rows
        ],
        "source string, n_docs long, n_files long, total_bytes long, "
        "roundtrip_ok boolean",
    ).orderBy("source")


# ---------------------------------------------------------------------------
# E212: Good-Turing frequency smoothing over corpus 4-grams
# ---------------------------------------------------------------------------
# The count-of-counts statistic behind every smoothed LM and behind
# the curation question "how much of this corpus's phrase space is
# still unseen": unseen mass ≈ N1/N (the Good-Turing leave-one-out
# estimate), adjusted counts r* = (r+1)·N_{r+1}/N_r. Kneser-Ney
# (E140) consumed smoothing; this EXPOSES the frequency-of-frequency
# surface itself, per language. Two stacked partial-agg groupBys
# (gram → count r, r → N_r) — the same no-Expand shape as E204 — and
# every emitted statistic is a single division of exact BIGINTs.

_GT_ORACLE = """
WITH w AS (
  SELECT lang, doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x != '') AS w
  FROM documents
),
g AS (
  SELECT lang, array_to_string(w[p:p+3], ' ') AS g
  FROM w, UNNEST(generate_series(1, GREATEST(len(w) - 3, 0))) t(p)
),
gram_counts AS (
  SELECT lang, g, COUNT(*)::BIGINT AS r FROM g GROUP BY lang, g
),
freq_of_freq AS (
  SELECT lang, r, COUNT(*)::BIGINT AS nr FROM gram_counts GROUP BY lang, r
),
tot AS (
  SELECT lang, SUM(r * nr)::BIGINT AS n_tokens, SUM(nr)::BIGINT AS vocab
  FROM freq_of_freq GROUP BY lang
),
wide AS (
  SELECT t.lang, t.n_tokens, t.vocab,
         COALESCE(MAX(CASE WHEN r = 1 THEN nr END), 0)::BIGINT AS n1,
         COALESCE(MAX(CASE WHEN r = 2 THEN nr END), 0)::BIGINT AS n2,
         COALESCE(MAX(CASE WHEN r = 3 THEN nr END), 0)::BIGINT AS n3,
         COALESCE(MAX(CASE WHEN r = 4 THEN nr END), 0)::BIGINT AS n4
  FROM tot t LEFT JOIN freq_of_freq f ON f.lang = t.lang AND f.r <= 4
  GROUP BY t.lang, t.n_tokens, t.vocab
)
SELECT lang, n_tokens, vocab, n1, n2, n3, n4,
       ROUND(n1 / CAST(n_tokens AS DOUBLE), 6) AS unseen_mass,
       ROUND(2.0 * n2 / NULLIF(n1, 0), 6) AS rstar_1,
       ROUND(3.0 * n3 / NULLIF(n2, 0), 6) AS rstar_2,
       ROUND(4.0 * n4 / NULLIF(n3, 0), 6) AS rstar_3
FROM wide
ORDER BY lang
"""


@register(
    "q_good_turing",
    oracle=_GT_ORACLE,
    doc="Good-Turing count-of-counts smoothing over corpus 4-grams "
    "(E212): per language, the frequency-of-frequency spectrum N_r, "
    "unseen mass N1/N (the leave-one-out estimate of how unsaturated "
    "the phrase space is) and adjusted counts r* = (r+1)N_{r+1}/N_r — "
    "two stacked partial-agg groupBys (no Expand), every statistic a "
    "single exact-BIGINT division",
)
def q_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("lang", words("text").alias("w"))
    grams = w.select(
        "lang", F.explode(positional_ngrams(F.col("w"), 4)).alias("g")
    )
    gram_counts = grams.groupBy("lang", "g").agg(F.count("*").alias("r"))
    fof = gram_counts.groupBy("lang", "r").agg(F.count("*").alias("nr"))
    nr_at = lambda k: F.coalesce(  # noqa: E731
        F.max(F.when(F.col("r") == k, F.col("nr"))), F.lit(0)
    ).cast("long")
    wide = fof.groupBy("lang").agg(
        F.sum(F.col("r") * F.col("nr")).alias("n_tokens"),
        F.sum("nr").alias("vocab"),
        nr_at(1).alias("n1"),
        nr_at(2).alias("n2"),
        nr_at(3).alias("n3"),
        nr_at(4).alias("n4"),
    )
    return wide.select(
        "lang", "n_tokens", "vocab", "n1", "n2", "n3", "n4",
        F.round(F.col("n1") / F.col("n_tokens").cast("double"), 6).alias(
            "unseen_mass"
        ),
        F.round(2.0 * F.col("n2") / F.nullif("n1", F.lit(0)), 6).alias(
            "rstar_1"
        ),
        F.round(3.0 * F.col("n3") / F.nullif("n2", F.lit(0)), 6).alias(
            "rstar_2"
        ),
        F.round(4.0 * F.col("n4") / F.nullif("n3", F.lit(0)), 6).alias(
            "rstar_3"
        ),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# E213: dedup threshold-sensitivity curve
# ---------------------------------------------------------------------------
# The knob report a curator reads BEFORE committing a dedup run: how
# many documents does each Jaccard threshold actually remove, and how
# big do the transitive clusters get (aggressive thresholds chain
# borderline pairs into giant components — the classic over-merge
# failure)? One exact 3-gram pair frame built at the loosest
# threshold (0.5) feeds all three operating points — candidate
# generation is paid ONCE; per threshold the work is a filter + CC on
# an edges-sized frame. The oracle replays each point with the shared
# edge CTEs + the recursive min-root walk.

_CURVE_TAUS = (0.5, 0.7, 0.9)


def _curve_oracle() -> str:
    from dumpty_spark.queries.dedup import _JACCARD_EDGE_CTES

    ctes = [f"WITH RECURSIVE {_JACCARD_EDGE_CTES}"]
    selects = []
    for i, tau in enumerate(_CURVE_TAUS):
        ctes.append(
            f"""e{i} AS (
  SELECT a_id, b_id FROM pairs
  JOIN counts ca ON ca.doc_id = a_id
  JOIN counts cb ON cb.doc_id = b_id
  WHERE ROUND(common::DOUBLE / (ca.n_sh + cb.n_sh - common), 4) >= {tau}
),
s{i} AS (
  SELECT a_id AS src, b_id AS dst FROM e{i}
  UNION ALL SELECT b_id, a_id FROM e{i}
),
n{i} AS (SELECT DISTINCT src AS id FROM s{i}),
w{i}(node, root) AS (
  SELECT id, id FROM n{i}
  UNION
  SELECT s.dst, w.root FROM w{i} w JOIN s{i} s ON s.src = w.node
),
c{i} AS (
  SELECT node, MIN(root) AS cluster_id FROM w{i} GROUP BY node
),
k{i} AS (
  SELECT cluster_id, COUNT(*)::BIGINT AS sz FROM c{i} GROUP BY cluster_id
)"""
        )
        selects.append(
            f"""SELECT {tau} AS tau,
       (SELECT COUNT(*) FROM e{i})::BIGINT AS n_edges,
       (SELECT COUNT(*) FROM k{i})::BIGINT AS n_clusters,
       (SELECT COALESCE(SUM(sz), 0) FROM k{i})::BIGINT AS n_docs_clustered,
       (SELECT COALESCE(MAX(sz), 0) FROM k{i})::BIGINT AS max_cluster,
       (SELECT COALESCE(SUM(sz - 1), 0) FROM k{i})::BIGINT AS n_dropped"""
        )
    return ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects) + "\nORDER BY tau"


@register(
    "q_dedup_threshold_curve",
    oracle=_curve_oracle(),
    doc="dedup threshold-sensitivity curve (E213): one exact 3-gram "
    "Jaccard pair frame at the loosest point feeds all three operating "
    "thresholds (0.5/0.7/0.9) — per point a filter + connected "
    "components gives edges, clusters, max transitive cluster size and "
    "docs a keep-one policy would drop; the over-merge audit a curator "
    "runs before committing a threshold",
)
def q_dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators import dedup as D
    from dumpty_spark.queries.shared_graph import jaccard_pair_graph

    pairs = jaccard_pair_graph(spark, sf_dir, threshold=min(_CURVE_TAUS))

    # the curve points are independent readouts of the one checkpointed
    # pair graph — overlap them on driver threads (the
    # q_ann_recall_check discipline); each point's computation and
    # result are unchanged
    def _point(tau: float) -> tuple:
        e = pairs.filter(F.col("jac") >= tau).select("a_id", "b_id")
        n_edges = e.count()
        if n_edges == 0:
            return (tau, 0, 0, 0, 0, 0)
        comp = D.connected_components(e)
        sizes = comp.groupBy("cluster_id").agg(F.count("*").alias("sz"))
        row = sizes.agg(
            F.count("*").alias("n_clusters"),
            F.sum("sz").alias("n_docs_clustered"),
            F.max("sz").alias("max_cluster"),
            F.sum(F.col("sz") - 1).alias("n_dropped"),
        ).first()
        return (
            tau, n_edges, row["n_clusters"], row["n_docs_clustered"],
            row["max_cluster"], row["n_dropped"],
        )

    from dumpty_spark.operators.util import run_overlapped

    out = run_overlapped(
        spark, [(lambda t=t: _point(t)) for t in _CURVE_TAUS]
    )
    return spark.createDataFrame(
        out,
        "tau double, n_edges long, n_clusters long, n_docs_clustered long, "
        "max_cluster long, n_dropped long",
    ).orderBy("tau")
