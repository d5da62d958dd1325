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

# shared edge-definition CTE chain: the 3-gram shingle sets, per-doc
# counts, and common-shingle pair counts. Interpolated into BOTH the
# pair oracle and the clusters oracle so the edge semantics cannot drift
# between them.
_JACCARD_EDGE_CTES = f"""words AS (
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
)"""

_JACCARD_ORACLE = f"""
WITH {_JACCARD_EDGE_CTES}
SELECT a_id, b_id,
       ROUND(common::DOUBLE / (ca.n_sh + cb.n_sh - common), 4) AS jac
FROM pairs
JOIN counts ca ON ca.doc_id = a_id
JOIN counts cb ON cb.doc_id = b_id
WHERE ROUND(common::DOUBLE / (ca.n_sh + cb.n_sh - common), 4) >= 0.8
ORDER BY a_id, b_id
"""


@register(
    "q_ngram_jaccard_pairs",
    oracle=_JACCARD_ORACLE,
    doc="exact 3-gram Jaccard near-dup pairs ≥0.8 via shingle self-join (E2)",
)
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.queries.shared_graph import jaccard_pair_graph

    return jaccard_pair_graph(spark, sf_dir).orderBy("a_id", "b_id")


def _minhash_oracle(num_hashes: int = 32, bands: int = 8, threshold: float = 0.8) -> str:
    """DuckDB replica of the md5-based MinHash+LSH pipeline, embedding the
    SAME universal-hash constants as operators/dedup.minhash_params."""
    from dumpty_spark.operators.dedup import MINHASH_P, minhash_params

    rpb = num_hashes // bands
    params = minhash_params(num_hashes)
    mins = ",\n         ".join(
        f"MIN(({a} * hb + {b}) % {MINHASH_P}) AS h{i}"
        for i, (a, b) in enumerate(params)
    )
    band_rows = "\n  UNION ALL\n  ".join(
        f"SELECT id, {b} AS band_idx, md5("
        + " || '|' || ".join(f"h{b * rpb + r}::VARCHAR" for r in range(rpb))
        + ") AS band_hash FROM sig"
        for b in range(bands)
    )
    return f"""
WITH words AS (
  SELECT doc_id AS id, {_WORDS_SQL} AS w FROM documents
),
sh AS (
  SELECT DISTINCT id, array_to_string(w[p:p+2], ' ') AS shingle
  FROM words, UNNEST(generate_series(1, GREATEST(len(w)-2, 0))) AS t(p)
  WHERE len(w) >= 3
),
hx AS (
  SELECT id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {MINHASH_P} AS hb
  FROM sh
),
sig AS (
  SELECT id, {mins}
  FROM hx GROUP BY id
),
bands AS (
  {band_rows}
),
cand AS (
  SELECT DISTINCT x.id AS a_id, y.id AS b_id
  FROM bands x JOIN bands y
    ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash AND x.id < y.id
),
counts AS (SELECT id, COUNT(*) AS n_sh FROM sh GROUP BY id),
common AS (
  SELECT c.a_id, c.b_id, COUNT(*) AS common
  FROM cand c
  JOIN sh a ON a.id = c.a_id
  JOIN sh b ON b.id = c.b_id AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT a_id, b_id,
       ROUND(common::DOUBLE / (ca.n_sh + cb.n_sh - common), 4) AS jac
FROM common
JOIN counts ca ON ca.id = a_id
JOIN counts cb ON cb.id = b_id
WHERE common::DOUBLE / (ca.n_sh + cb.n_sh - common) >= {threshold}
ORDER BY a_id, b_id
"""


@register(
    "q_minhash_lsh_pairs",
    oracle=_minhash_oracle(),
    doc="MinHash+LSH banded near-dup candidates, exact-verified ≥0.8 (E2) — "
    "full DuckDB oracle via portable md5/universal-hash sketches",
)
def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=32, bands=8, threshold=0.8
    ).orderBy("a_id", "b_id")


def _simhash_oracle(max_hamming: int = 3) -> str:
    """DuckDB replica of the md5-derived chunked SimHash pipeline."""
    sums = ",\n         ".join(
        f"SUM(CASE WHEN (h{1 if i < 60 else 2} >> {i if i < 60 else i - 60}) & 1 = 1 "
        f"THEN 1 ELSE -1 END) AS b{i}"
        for i in range(64)
    )
    chunks = ",\n         ".join(
        " + ".join(f"(CASE WHEN b{16 * c + j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(16))
        + f" AS c{c}"
        for c in range(4)
    )
    band_rows = "\n  UNION ALL\n  ".join(
        f"SELECT id, {c} AS chunk_idx, c{c} AS chunk_val, c0, c1, c2, c3 FROM chunks"
        for c in range(4)
    )
    ham = " + ".join(f"bit_count(xor(a.c{c}::BIGINT, b.c{c}::BIGINT))" for c in range(4))
    return f"""
WITH words AS (
  SELECT doc_id AS id, {_WORDS_SQL} AS w FROM documents
),
tok AS (SELECT id, unnest(w) AS t FROM words),
hx AS (
  SELECT id,
         ('0x' || substr(md5(t), 1, 15))::BIGINT AS h1,
         ('0x' || substr(md5('#' || t), 1, 15))::BIGINT AS h2
  FROM tok
),
sums AS (
  SELECT id, {sums}
  FROM hx GROUP BY id
),
chunks AS (
  SELECT id, {chunks}
  FROM sums
),
bands AS (
  {band_rows}
),
cand AS (
  SELECT DISTINCT x.id AS a_id, y.id AS b_id
  FROM bands x JOIN bands y
    ON x.chunk_idx = y.chunk_idx AND x.chunk_val = y.chunk_val AND x.id < y.id
)
SELECT c.a_id, c.b_id, ({ham})::BIGINT AS hamming
FROM cand c
JOIN chunks a ON a.id = c.a_id
JOIN chunks b ON b.id = c.b_id
WHERE {ham} <= {max_hamming}
ORDER BY c.a_id, c.b_id
"""


@register(
    "q_simhash_pairs",
    oracle=_simhash_oracle(),
    doc="SimHash hamming≤3 near-dup pairs via chunk banding (E2) — full "
    "DuckDB oracle via portable md5-derived bit sums",
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


_CLUSTERS_ORACLE = f"""
WITH RECURSIVE {_JACCARD_EDGE_CTES},
edges AS (
  SELECT a_id, b_id
  FROM pairs
  JOIN counts ca ON ca.doc_id = a_id
  JOIN counts cb ON cb.doc_id = b_id
  WHERE ROUND(common::DOUBLE / (ca.n_sh + cb.n_sh - common), 4) >= 0.8
),
sym AS (
  SELECT a_id AS src, b_id AS dst FROM edges
  UNION ALL
  SELECT b_id, a_id FROM edges
),
nodes AS (SELECT DISTINCT src AS id FROM sym),
walk(node, root) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT s.dst, w.root FROM walk w JOIN sym s ON s.src = w.node
),
comp AS (SELECT node AS doc_id, MIN(root) AS cluster_id FROM walk GROUP BY node)
SELECT doc_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS n_members
FROM comp
ORDER BY doc_id
"""


@register(
    "q_dedup_clusters",
    oracle=_CLUSTERS_ORACLE,
    doc="transitive near-dup clusters: connected components (iterative "
    "min-label propagation) over the 3-gram Jaccard pair graph; oracle "
    "is a DuckDB recursive CTE over the same edges (E2 cluster step)",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.queries.shared_graph import jaccard_pair_graph

    pairs = jaccard_pair_graph(spark, sf_dir)
    comp = D.connected_components(pairs)
    wc = W.partitionBy("cluster_id")
    return (
        comp.select(F.col("id").alias("doc_id"), "cluster_id")
        .withColumn("n_members", F.count("*").over(wc))
        .orderBy("doc_id")
    )


_CANONICAL_ORACLE = f"""
WITH RECURSIVE {_JACCARD_EDGE_CTES},
edges AS (
  SELECT a_id, b_id
  FROM pairs
  JOIN counts ca ON ca.doc_id = a_id
  JOIN counts cb ON cb.doc_id = b_id
  WHERE ROUND(common::DOUBLE / (ca.n_sh + cb.n_sh - common), 4) >= 0.8
),
sym AS (
  SELECT a_id AS src, b_id AS dst FROM edges
  UNION ALL
  SELECT b_id, a_id FROM edges
),
nodes AS (SELECT DISTINCT src AS id FROM sym),
walk(node, root) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT s.dst, w.root FROM walk w JOIN sym s ON s.src = w.node
),
comp AS (SELECT node AS doc_id, MIN(root) AS cluster_id FROM walk GROUP BY node),
full_assign AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id, d.n_chars
  FROM documents d LEFT JOIN comp c USING (doc_id)
)
SELECT doc_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS n_members,
       CASE WHEN ROW_NUMBER() OVER (
         PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id
       ) = 1 THEN 1 ELSE 0 END AS keep
FROM full_assign
ORDER BY doc_id
"""


@register(
    "q_canonical_docs",
    oracle=_CANONICAL_ORACLE,
    doc="canonical-survivor selection: near-dup clusters (CC over the "
    "Jaccard pair graph) + singletons, keep ONE doc per cluster (longest, "
    "id tie-break) — the end-to-end near-dup dedup decision a corpus "
    "build actually ships (E2/E11 completion)",
)
def q_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.queries.shared_graph import jaccard_pair_graph

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pair_graph(spark, sf_dir)
    comp = D.connected_components(pairs)
    full = docs.join(
        comp.withColumnRenamed("id", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        "n_chars",
    )
    wc = W.partitionBy("cluster_id")
    wr = W.partitionBy("cluster_id").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        full.withColumn("n_members", F.count("*").over(wc))
        .withColumn(
            "keep", (F.row_number().over(wr) == 1).cast("int")
        )
        .select("doc_id", "cluster_id", "n_members", "keep")
        .orderBy("doc_id")
    )


_COMPONENT_STORE_ORACLE = f"""
WITH RECURSIVE {_JACCARD_EDGE_CTES},
edges AS (
  SELECT a_id, b_id
  FROM pairs
  JOIN counts ca ON ca.doc_id = a_id
  JOIN counts cb ON cb.doc_id = b_id
  WHERE ROUND(common::DOUBLE / (ca.n_sh + cb.n_sh - common), 4) >= 0.8
),
sym AS (
  SELECT a_id AS src, b_id AS dst FROM edges
  UNION ALL
  SELECT b_id, a_id FROM edges
),
nodes AS (SELECT DISTINCT src AS id FROM sym),
walk(node, root) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT s.dst, w.root FROM walk w JOIN sym s ON s.src = w.node
),
comp AS (SELECT node AS doc_id, MIN(root) AS cluster_id FROM walk GROUP BY node)
SELECT doc_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS n_members
FROM comp
ORDER BY doc_id
"""


@register(
    "q_component_store_batches",
    oracle=_COMPONENT_STORE_ORACLE,
    doc="incremental CC store (E46): near-dup Jaccard pair edges split "
    "into two ingest batches and folded into the manifest-versioned "
    "component store one batch at a time (contracted-graph CC + keyed "
    "upsert of touched clusters only); the final assignment is proven "
    "equal to one-shot CC over ALL pairs by the recursive-CTE oracle",
)
def q_component_store_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from dumpty_spark.operators.components import (
        component_store_read,
        component_store_update,
    )
    from dumpty_spark.session import warehouse_scratch

    from dumpty_spark.queries.shared_graph import jaccard_pair_graph

    pairs = jaccard_pair_graph(spark, sf_dir).select("a_id", "b_id")
    tmp = warehouse_scratch(spark, "components")
    try:
        root = f"{tmp}/components"
        for parity in (0, 1):
            component_store_update(
                spark,
                root,
                pairs.filter((F.col("a_id") + F.col("b_id")) % 2 == parity),
            )
        comp = component_store_read(spark, root)
        wc = W.partitionBy("cluster_id")
        return (
            comp.select(F.col("id").alias("doc_id"), "cluster_id")
            .withColumn("n_members", F.count("*").over(wc))
            .orderBy("doc_id")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# E53: shingle containment — the asymmetric near-dup relation
# ---------------------------------------------------------------------------
_CONTAINMENT_ORACLE = f"""
WITH {_JACCARD_EDGE_CTES},
sized AS (
  SELECT a_id, b_id, common, ca.n_sh AS na, cb.n_sh AS nb
  FROM pairs
  JOIN counts ca ON ca.doc_id = a_id
  JOIN counts cb ON cb.doc_id = b_id
),
directed AS (
  SELECT a_id AS inner_id, b_id AS outer_id,
         ROUND(common::DOUBLE / na, 4) AS containment
  FROM sized
  UNION ALL
  SELECT b_id, a_id, ROUND(common::DOUBLE / nb, 4)
  FROM sized
)
SELECT inner_id, outer_id, containment
FROM directed
WHERE containment >= 0.85
ORDER BY inner_id, outer_id
"""


@register(
    "q_containment_pairs",
    oracle=_CONTAINMENT_ORACLE,
    doc="exact 3-gram shingle CONTAINMENT pairs ≥0.85 (E53): the "
    "asymmetric excerpt/sub-document relation Jaccard misses — "
    "C(inner→outer) = |∩| / |sh(inner)|, directed, both directions when "
    "mutual; the drop-the-excerpt-keep-the-superset dedup decision",
)
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.containment_pairs(
        docs, "doc_id", "text", k=3, threshold=0.85
    ).orderBy("inner_id", "outer_id")


# ---------------------------------------------------------------------------
# E107: windowed event dedup — the batch face of streaming dedup
# ---------------------------------------------------------------------------
# The batch-equivalent contract of dropDuplicatesWithinWatermark
# (streaming/windows.py:106): keep the FIRST event per
# (user, event_type) inside each 1-hour tumbling window, report the
# dedup pressure per series. E1 dedups exact content; this dedups
# REPEATED SIGNALS in time — the at-most-once-per-window semantics an
# event pipeline wants when a flaky client re-fires. One window pass,
# keys carry the window start so state never outlives the hour.

_WINDOW_DEDUP_ORACLE = """
WITH w AS (
  SELECT event_type,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, event_type, floor(epoch(ts))::BIGINT // 3600
           ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT event_type,
       COUNT(*)::BIGINT AS n_events,
       COUNT(*) FILTER (WHERE rn = 1)::BIGINT AS n_kept,
       COUNT(*) FILTER (WHERE rn > 1)::BIGINT AS n_dropped,
       ROUND(COUNT(*) FILTER (WHERE rn > 1)::DOUBLE / COUNT(*), 4)
         AS drop_rate
FROM w
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q_window_dedup",
    oracle=_WINDOW_DEDUP_ORACLE,
    doc="windowed event dedup (E107): keep the first event per (user, "
    "series) inside each 1-hour tumbling window — the batch-equivalent "
    "contract of streaming dropDuplicatesWithinWatermark, reported as "
    "per-series dedup pressure; one window pass keyed on (user, "
    "series, hour) so ordering state never spans windows",
)
def q_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hour = F.floor(F.unix_timestamp("ts") / F.lit(3600)).cast("long")
    wk = W.partitionBy("user_id", "event_type", hour).orderBy(
        "ts", "event_id"
    )
    w = ev.select(
        "event_type", F.row_number().over(wk).alias("rn")
    )
    return (
        w.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("rn") == 1, 1)).alias("n_kept"),
            F.count(F.when(F.col("rn") > 1, 1)).alias("n_dropped"),
            F.round(
                F.count(F.when(F.col("rn") > 1, 1)) / F.count(F.lit(1)), 4
            ).alias("drop_rate"),
        )
        .orderBy("event_type")
    )
