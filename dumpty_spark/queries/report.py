"""Corpus and schema report queries (EXT widening, batch 6): the
summary tables a training-data pipeline prints before shipping a corpus
— vocabulary coverage, document length profile, and a whole-schema
referential-integrity sweep.

Scale notes (100 TB):
- q_vocab_coverage is one explode + vocabulary-sized partial agg; the
  coverage arithmetic runs on a 1-row totals frame (broadcast), never on
  the token stream.
- q_doclen_profile aggregates per-doc lengths (docs-sized frame), then
  takes exact interpolated percentiles over it; at 100x swap
  percentile -> approx_percentile (same query shape, sketch-mergeable).
- q_referential_integrity stacks four FK checks into four broadcast/
  shuffle anti-join counts unioned into one fact-pairs-sized report —
  no check rescans another's fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.functions import text as X
from dumpty_spark.queries import register
from dumpty_spark.sources import load_table

_WORDS_SQL = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')"

# ---------------------------------------------------------------------------
# E41: vocabulary coverage at a min-count threshold
# ---------------------------------------------------------------------------

_MIN_COUNT = 5

_VOCAB_ORACLE = f"""
WITH tok AS (SELECT unnest({_WORDS_SQL}) AS token FROM documents),
c AS (SELECT token, COUNT(*)::BIGINT AS n FROM tok GROUP BY token),
tot AS (
  SELECT COUNT(*)::BIGINT AS n_types, SUM(n)::BIGINT AS n_tokens,
         SUM(CASE WHEN n >= {_MIN_COUNT} THEN 1 ELSE 0 END)::BIGINT
           AS vocab_size,
         SUM(CASE WHEN n >= {_MIN_COUNT} THEN n ELSE 0 END)::BIGINT
           AS covered
  FROM c
)
SELECT n_types, n_tokens, vocab_size,
       ROUND(covered::DOUBLE / n_tokens, 6) AS coverage,
       ROUND(1 - covered::DOUBLE / n_tokens, 6) AS oov_rate
FROM tot
"""


@register(
    "q_vocab_coverage",
    oracle=_VOCAB_ORACLE,
    doc=f"vocabulary report at min-count {_MIN_COUNT}: type/token counts, "
    "pruned vocab size, corpus coverage and OOV rate — one explode + "
    "vocabulary-sized partial agg, arithmetic on the 1-row totals "
    "(EXT E41)",
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = (
        docs.select(F.explode(X.words("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    keep = F.col("n") >= _MIN_COUNT
    return c.agg(
        F.count("*").alias("n_types"),
        F.sum("n").alias("n_tokens"),
        F.sum(keep.cast("long")).alias("vocab_size"),
        F.round(
            F.sum(F.when(keep, F.col("n")).otherwise(0)) / F.sum("n"), 6
        ).alias("coverage"),
        F.round(
            1 - F.sum(F.when(keep, F.col("n")).otherwise(0)) / F.sum("n"), 6
        ).alias("oov_rate"),
    )


# ---------------------------------------------------------------------------
# E42: document length profile
# ---------------------------------------------------------------------------

_DOCLEN_ORACLE = f"""
WITH lens AS (
  SELECT len({_WORDS_SQL})::BIGINT AS n_tokens FROM documents
)
SELECT COUNT(*)::BIGINT AS n_docs,
       MIN(n_tokens)::BIGINT AS min_tokens,
       ROUND(quantile_cont(n_tokens, 0.5), 4) AS p50,
       ROUND(quantile_cont(n_tokens, 0.9), 4) AS p90,
       ROUND(quantile_cont(n_tokens, 0.99), 4) AS p99,
       MAX(n_tokens)::BIGINT AS max_tokens,
       ROUND(AVG(n_tokens), 4) AS mean_tokens
FROM lens
"""


@register(
    "q_doclen_profile",
    oracle=_DOCLEN_ORACLE,
    doc="document length profile: token-count percentiles "
    "(p50/p90/p99), min/max/mean — docs-sized aggregate after a "
    "map-side tokenize+count; at 100x swap percentile for "
    "approx_percentile, same shape (EXT E42)",
)
def q_doclen_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    lens = docs.select(F.size(X.words("text")).cast("bigint").alias("n_tokens"))
    return lens.agg(
        F.count("*").alias("n_docs"),
        F.min("n_tokens").alias("min_tokens"),
        F.round(F.percentile("n_tokens", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("n_tokens", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("n_tokens", F.lit(0.99)), 4).alias("p99"),
        F.max("n_tokens").alias("max_tokens"),
        F.round(F.avg("n_tokens"), 4).alias("mean_tokens"),
    )


# ---------------------------------------------------------------------------
# E43: whole-schema referential-integrity sweep
# ---------------------------------------------------------------------------
# Every FK edge of the star schema audited in one report: orphan count
# per relationship (rows on the child side whose key has no parent).

_RI_ORACLE = """
SELECT relationship, n_child, n_orphans, n_orphans = 0 AS intact
FROM (
  SELECT 'lineitem.l_orderkey->orders' AS relationship,
         (SELECT COUNT(*) FROM lineitem)::BIGINT AS n_child,
         (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o
            ON l.l_orderkey = o.o_orderkey
          WHERE o.o_orderkey IS NULL)::BIGINT AS n_orphans
  UNION ALL
  SELECT 'lineitem.l_partkey->part',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem l LEFT JOIN part p
            ON l.l_partkey = p.p_partkey
          WHERE p.p_partkey IS NULL)
  UNION ALL
  SELECT 'orders.o_custkey->customer',
         (SELECT COUNT(*) FROM orders),
         (SELECT COUNT(*) FROM orders o LEFT JOIN customer c
            ON o.o_custkey = c.c_custkey
          WHERE c.c_custkey IS NULL)
  UNION ALL
  SELECT 'customer.c_nationkey->nation',
         (SELECT COUNT(*) FROM customer),
         (SELECT COUNT(*) FROM customer c LEFT JOIN nation n
            ON c.c_nationkey = n.n_nationkey
          WHERE n.n_nationkey IS NULL)
)
ORDER BY relationship
"""


@register(
    "q_referential_integrity",
    oracle=_RI_ORACLE,
    doc="whole-schema FK audit: orphan counts for every star-schema "
    "relationship via broadcast anti-joins (dims broadcast; the "
    "orders-side parent of lineitem shuffles once), unioned into one "
    "relationships-sized report — q_expectations' FK check generalized "
    "to the full schema (EXT E43)",
)
def q_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    def audit(name, child, key, parent, pkey, bcast=True):
        par = parent.select(pkey)
        par = F.broadcast(par) if bcast else par
        orphans = child.select(key).join(
            par, F.col(key) == F.col(pkey), "left_anti"
        )
        return (
            child.agg(F.count("*").alias("n_child"))
            .crossJoin(orphans.agg(F.count("*").alias("n_orphans")))
            .select(
                F.lit(name).alias("relationship"),
                "n_child",
                "n_orphans",
                (F.col("n_orphans") == 0).alias("intact"),
            )
        )

    report = (
        audit("lineitem.l_orderkey->orders", li, "l_orderkey", orders, "o_orderkey", bcast=False)
        .unionAll(audit("lineitem.l_partkey->part", li, "l_partkey", part, "p_partkey"))
        .unionAll(audit("orders.o_custkey->customer", orders, "o_custkey", customer, "c_custkey"))
        .unionAll(audit("customer.c_nationkey->nation", customer, "c_nationkey", nation, "n_nationkey"))
    )
    return report.orderBy("relationship")


_SKETCH_DISTINCT_ORACLE = """
SELECT event_type,
       COUNT(*)::BIGINT AS n_rows,
       TRUE AS union_in_envelope
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q_sketch_distinct",
    oracle=_SKETCH_DISTINCT_ORACLE,
    doc="mergeable-sketch store (E45): per-batch HLL sketches at rest, "
    "cross-batch distinct-user estimates per event type from sketch "
    "unions only — history never re-read. The union estimate itself is "
    "engine-specific, so the hashed surface is the store's CONTRACT: the "
    "exact per-group row counts it tracks plus a boolean asserting the "
    "sketch-union estimate landed within 4 sigma (6.5%, lgK=12 HLL has "
    "~1.6% relative standard error — a standard deviation, not a bound) "
    "of the exact cross-batch distinct count",
)
def q_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from dumpty_spark.operators import sketches as SK
    from dumpty_spark.session import warehouse_scratch

    ev = load_table(spark, sf_dir, "events")
    tmp = warehouse_scratch(spark, "hll")
    try:
        store = f"{tmp}/sk"
        # two ingest batches by event-id parity, then a union-only readout
        for bid, cond in (("b0", 0), ("b1", 1)):
            SK.sketch_store_append(
                ev.filter(F.col("event_id") % 2 == cond),
                store,
                ["event_type"],
                "user_id",
                bid,
            )
        est = SK.sketch_store_estimate(spark, store, ["event_type"]).select(
            "event_type", "approx_distinct", "n_rows"
        )
        exact = ev.groupBy("event_type").agg(
            F.countDistinct("user_id").alias("__exact")
        )
        return (
            est.join(F.broadcast(exact), "event_type")
            .select(
                "event_type",
                "n_rows",
                (
                    F.abs(F.col("approx_distinct") - F.col("__exact"))
                    / F.col("__exact")
                    <= 0.065
                ).alias("union_in_envelope"),
            )
            .orderBy("event_type")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# E49: dataset card — the one-row corpus summary a dataset release ships
# ---------------------------------------------------------------------------

_CARD_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, source, n_chars,
         len({_WORDS_SQL}) AS n_tok,
         md5(text) AS h
  FROM documents
),
dup AS (
  SELECT COUNT(*)::BIGINT AS n_docs,
         COUNT(DISTINCT h)::BIGINT AS n_unique_texts
  FROM toks
),
q AS (
  SELECT quantile_cont(n_tok, 0.5) AS med_tok,
         quantile_cont(n_tok, 0.9) AS p90_tok
  FROM toks
)
SELECT d.n_docs,
       (SELECT COUNT(DISTINCT lang) FROM toks)::BIGINT   AS n_langs,
       (SELECT COUNT(DISTINCT source) FROM toks)::BIGINT AS n_sources,
       (SELECT SUM(n_tok) FROM toks)::BIGINT             AS total_tokens,
       (SELECT SUM(n_chars) FROM toks)::BIGINT           AS total_chars,
       ROUND((d.n_docs - d.n_unique_texts)::DOUBLE / d.n_docs, 6)
         AS exact_dup_rate,
       ROUND(q.med_tok, 2) AS median_tokens,
       ROUND(q.p90_tok, 2) AS p90_tokens
FROM dup d, q
"""


@register(
    "q_dataset_card",
    oracle=_CARD_ORACLE,
    doc="dataset card (E49): the one-row release summary — doc/lang/"
    "source counts, token+char mass, exact-duplicate rate (md5 text "
    "hash), median/p90 token length — one scan + one tiny agg, the "
    "composition of the engine's profiling primitives a corpus release "
    "actually publishes",
)
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        "source",
        "n_chars",
        F.size(X.words("text")).alias("n_tok"),
        F.md5("text").alias("h"),
    )
    # exact interpolated quantiles to mirror DuckDB's quantile_cont —
    # the doc-count frame is corpus-sized but the percentile agg is a
    # single partial-aggregated pass (documented exact-parity twin of
    # the approxQuantile scale path, like q_julienne_boundaries)
    return toks.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_tok").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.round(
            (F.count("*") - F.countDistinct("h")) / F.count("*"), 6
        ).alias("exact_dup_rate"),
        F.round(F.expr("percentile(n_tok, 0.5)"), 2).alias("median_tokens"),
        F.round(F.expr("percentile(n_tok, 0.9)"), 2).alias("p90_tokens"),
    )
