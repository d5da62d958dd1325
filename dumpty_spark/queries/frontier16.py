"""Round-7 engine extensions, fourth batch (EXT E173-E175): peak
interval concurrency, chunk-level dedup composition, and the
Misra-Gries mergeable heavy-hitter store.

Design rules: one sort shuffle per partition key for the sweep-line,
map-side chunking feeding a single dedup shuffle, store state counters-
sized with exact (not bound-only) oracles — the MG batch construction
is a deterministic function of the data, so DuckDB rebuilds the whole
store state.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dumpty_spark.queries import register
from dumpty_spark.queries.dedup import _WORDS_SQL
from dumpty_spark.session import warehouse_scratch
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E173: peak interval concurrency (sweep-line max-overlap)
# ---------------------------------------------------------------------------
# Each event becomes an interval [ts, ts + (floor(value)+1) seconds);
# per event type, the maximum number of simultaneously-open intervals
# and when it is first reached — the capacity-planning number (peak
# concurrent sessions / connections) that no frame-based window can
# express. Sweep-line: +1 at start, -1 at end, one cumulative window
# per type ordered by (instant, delta) — ends close before starts at
# the same microsecond (half-open intervals), so the count never
# double-peaks on a touch. Epoch MICROSECOND integers on both engines
# (the E100 discipline); one sort shuffle per type, state two rows per
# event.

_PEAK_ORACLE = """
WITH iv AS (
  SELECT event_type, epoch_us(ts) AS s,
         epoch_us(ts) + (FLOOR(value)::BIGINT + 1) * 1000000 AS e
  FROM events
),
pts AS (
  SELECT event_type, s AS t, 1 AS d FROM iv
  UNION ALL
  SELECT event_type, e AS t, -1 AS d FROM iv
),
sweep AS (
  SELECT event_type, t, d,
         SUM(d) OVER (PARTITION BY event_type ORDER BY t, d
                      ROWS UNBOUNDED PRECEDING) AS conc
  FROM pts
),
mx AS (
  SELECT event_type, MAX(conc)::BIGINT AS peak FROM sweep GROUP BY 1
)
SELECT s.event_type, m.peak,
       MIN(s.t)::BIGINT AS peak_first_us
FROM sweep s JOIN mx m ON m.event_type = s.event_type AND s.conc = m.peak
GROUP BY s.event_type, m.peak
ORDER BY s.event_type
"""


@register(
    "q_peak_concurrency",
    oracle=_PEAK_ORACLE,
    doc="peak interval concurrency (E173): sweep-line max-overlap per "
    "event type — +1/-1 deltas, one cumulative window ordered by "
    "(epoch-us instant, delta) with ends closing before starts, peak "
    "and first-peak time; the capacity-planning query no frame-based "
    "window expresses, one sort shuffle per type",
)
def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    iv = ev.select(
        "event_type",
        us.alias("s"),
        (us + (F.floor("value").cast("long") + 1) * 1000000).alias("e"),
    )
    pts = iv.select(
        "event_type", F.col("s").alias("t"), F.lit(1).alias("d")
    ).unionAll(
        iv.select("event_type", F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sweep = pts.withColumn("conc", F.sum("d").over(w)).localCheckpoint()
    mx = sweep.groupBy("event_type").agg(F.max("conc").alias("peak"))
    return (
        sweep.join(F.broadcast(mx), "event_type")
        .filter(F.col("conc") == F.col("peak"))
        .groupBy("event_type", "peak")
        .agg(F.min("t").alias("peak_first_us"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# E174: chunk-level dedup (RAG-ingestion composition)
# ---------------------------------------------------------------------------
# Retrieval corpora dedup at CHUNK granularity — a boilerplate header
# shared by every doc survives document-level dedup but pollutes a
# vector index. Composition of two existing operators in ONE lazy plan:
# E4 chunking (40-word windows, stride 30, map-side explode) feeding an
# E1 exact keep-first dedup on the chunk hash (global keep-first on
# (doc_id, start), expressed as ONE hash-partitioned ranking window —
# no separate keeper aggregate + join-back, so the chunk frame shuffles
# on the hash exactly once); rolled up per source: chunks, distinct
# chunks, and chunks KEPT — the cross-source boilerplate profile.

_CHUNKDEDUP_ORACLE = f"""
WITH w AS (
  SELECT doc_id, source, {_WORDS_SQL} AS wl FROM documents
),
meta AS (
  SELECT doc_id, source, wl,
         GREATEST(FLOOR((len(wl) - 10 - 1)::DOUBLE / 30)::BIGINT + 1, 1)
           AS n_chunks
  FROM w WHERE len(wl) > 0
),
ch AS (
  SELECT doc_id, source, (s * 30)::INTEGER AS start,
         md5(array_to_string(wl[s*30+1 : s*30+40], ' ')) AS h
  FROM meta, UNNEST(generate_series(0, n_chunks - 1)) AS t(s)
),
keep AS (
  SELECT h, MIN(ROW(doc_id, start)) AS first_at FROM ch GROUP BY h
)
SELECT c.source,
       COUNT(*)::BIGINT AS n_chunks,
       COUNT(DISTINCT c.h)::BIGINT AS n_distinct,
       SUM(CASE WHEN ROW(c.doc_id, c.start) = k.first_at
                THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       ROUND(1 - SUM(CASE WHEN ROW(c.doc_id, c.start) = k.first_at
                          THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 6)
         AS drop_frac
FROM ch c JOIN keep k ON k.h = c.h
GROUP BY c.source
ORDER BY c.source
"""


@register(
    "q_chunk_dedup",
    oracle=_CHUNKDEDUP_ORACLE,
    doc="chunk-level dedup composition (E174): E4 chunking (map-side "
    "40/30 windows) feeding E1 exact keep-first on the chunk hash in "
    "one lazy plan, rolled up per source (chunks / distinct / kept / "
    "drop fraction) — the RAG-ingestion pass that catches cross-doc "
    "boilerplate document-level dedup misses; one chunk-hash shuffle",
)
def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.functions import text as X

    docs = load_table(spark, sf_dir, "documents")
    ch = (
        docs.select("doc_id", "source", X.words("text").alias("__w"))
        .filter(F.size("__w") > 0)
        .select(
            "doc_id",
            "source",
            F.explode(X.chunk_spans(F.col("__w"), 40, 10)).alias("c"),
        )
        .select(
            "doc_id",
            "source",
            F.col("c.start").alias("start"),
            F.md5("c.chunk_text").alias("h"),
        )
    )
    w = Window.partitionBy("h").orderBy("doc_id", "start")
    flagged = ch.withColumn(
        "kept", (F.row_number().over(w) == 1).cast("int")
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").alias("n_chunks"),
            F.countDistinct("h").alias("n_distinct"),
            F.sum("kept").alias("n_kept"),
            F.round(
                1 - F.sum("kept").cast("double") / F.count("*"), 6
            ).alias("drop_frac"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# E175: Misra-Gries mergeable heavy-hitter store
# ---------------------------------------------------------------------------
# See operators/mg.py. Two ingest batches (event-id parity) with k=20
# counters over user ids; the merged estimates are ranked and checked
# against exact counts WITH the deterministic MG guarantees: never an
# overestimate, never more than N/(k+1) under. The oracle rebuilds both
# batch summaries (row-ranked (k+1)-th-largest offset, key tie-break)
# and their merge exactly — the whole store state is a deterministic
# function of the data, unlike the hash-seeded CMS whose oracle can
# only audit bounds.

_MG_K = 20

_MG_ORACLE = f"""
WITH c0 AS (
  SELECT user_id AS key, COUNT(*)::BIGINT AS n FROM events
  WHERE event_id % 2 = 0 GROUP BY 1
),
c1 AS (
  SELECT user_id AS key, COUNT(*)::BIGINT AS n FROM events
  WHERE event_id % 2 = 1 GROUP BY 1
),
o0 AS (
  SELECT CASE WHEN COUNT(*) = {_MG_K + 1} THEN MIN(n) ELSE 0 END AS off
  FROM (SELECT n FROM c0 ORDER BY n DESC, key LIMIT {_MG_K + 1})
),
o1 AS (
  SELECT CASE WHEN COUNT(*) = {_MG_K + 1} THEN MIN(n) ELSE 0 END AS off
  FROM (SELECT n FROM c1 ORDER BY n DESC, key LIMIT {_MG_K + 1})
),
s0 AS (SELECT key, n - o0.off AS est FROM c0, o0 WHERE n - o0.off > 0),
s1 AS (SELECT key, n - o1.off AS est FROM c1, o1 WHERE n - o1.off > 0),
merged AS (
  SELECT key, SUM(est)::BIGINT AS est
  FROM (SELECT * FROM s0 UNION ALL SELECT * FROM s1)
  GROUP BY key
),
tot AS (SELECT COUNT(*)::DOUBLE AS n FROM events),
exact AS (SELECT user_id AS key, COUNT(*)::BIGINT AS tc FROM events GROUP BY 1),
ranked AS (
  SELECT m.key, m.est, e.tc,
         (m.est <= e.tc) AS no_overestimate,
         (m.est >= e.tc - tot.n / {_MG_K + 1}) AS within_bound,
         ROW_NUMBER() OVER (ORDER BY m.est DESC, m.key) AS rnk
  FROM merged m JOIN exact e ON e.key = m.key, tot
)
SELECT key, est, tc AS true_count, no_overestimate, within_bound,
       rnk::BIGINT AS rnk
FROM ranked WHERE rnk <= 10 ORDER BY rnk
"""


@register(
    "q_mg_topk_store",
    oracle=_MG_ORACLE,
    doc="Misra-Gries mergeable heavy-hitter store (E175): two ingest "
    "batches reduced to k=20 deterministic counter summaries at rest, "
    "merged by counter addition — never overestimates, within N/(k+1) "
    "under (Agarwal et al. 2012); the oracle rebuilds the ENTIRE store "
    "state exactly (batch offsets are row-ranked (k+1)-th largest "
    "counts), completing the mergeable-sketch family (E45/E51/E68) "
    "with its deterministic member",
)
def q_mg_topk_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators import mg

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    scratch = warehouse_scratch(spark, "mgstore")
    store = f"{scratch}/mg"
    try:
        for bid, parity in (("b0", 0), ("b1", 1)):
            mg.mg_store_append(
                ev.filter(F.col("event_id") % 2 == parity),
                store,
                "user_id",
                _MG_K,
                bid,
            )
        est = mg.mg_store_estimate(spark, store)
        exact = ev.groupBy(F.col("user_id").alias("key")).agg(
            F.count("*").alias("tc")
        )
        w = Window.orderBy(F.desc("est"), "key")
        return (
            est.join(exact, "key")
            .select(
                "key",
                "est",
                F.col("tc").alias("true_count"),
                (F.col("est") <= F.col("tc")).alias("no_overestimate"),
                (
                    F.col("est")
                    >= F.col("tc") - F.col("n_total") / (_MG_K + 1)
                ).alias("within_bound"),
            )
            .orderBy(F.desc("est"), "key")
            .limit(10)
            .withColumn("rnk", F.row_number().over(w).cast("long"))
            .orderBy("rnk")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
