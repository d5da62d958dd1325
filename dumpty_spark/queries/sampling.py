"""Deterministic-sampling t2 queries (training-data pipeline surface).

The hash bucket is substr(md5(key),1,4) compared lexicographically —
bit-identical in Spark and DuckDB, so every query here is fully
oracle-checked (unlike seed-based df.sample, which no oracle can see).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.operators import sampling as SM
from dumpty_spark.queries import register
from dumpty_spark.sources import load_table

_KEYS = ["l_orderkey", "l_linenumber"]

_SAMPLE_ORACLE = f"""
SELECT l_returnflag,
       COUNT(*) AS n_sampled,
       ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem
WHERE {SM.bucket_sql(_KEYS)} < '{SM._hex_threshold(0.1)}'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register(
    "q_sample_hash",
    oracle=_SAMPLE_ORACLE,
    doc="deterministic 10% sample of lineitem keyed on the row's own PK "
    "hash — stable across runs/partitionings, map-side only",
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        SM.sample_hash(li, _KEYS, 0.1)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_sampled"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}

_SPLIT_ORACLE = f"""
SELECT {SM.split_sql(['doc_id'], _WEIGHTS)} AS split,
       COUNT(*) AS n_docs,
       ROUND(AVG(n_chars), 2) AS avg_chars
FROM documents
GROUP BY split
ORDER BY split
"""


@register(
    "q_train_test_split",
    oracle=_SPLIT_ORACLE,
    doc="deterministic 80/10/10 train/val/test split by doc_id hash range "
    "— disjoint, exhaustive, engine-independent",
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("split", SM.split_column(["doc_id"], _WEIGHTS))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
        .orderBy("split")
    )


_STRATA = {"click": 0.02, "view": 0.1}

_STRAT_ORACLE = f"""
SELECT event_type, COUNT(*) AS n_sampled
FROM events
WHERE {SM.bucket_sql(['event_id'])} <
  CASE event_type
    WHEN 'click' THEN '{SM._hex_threshold(0.02)}'
    WHEN 'view'  THEN '{SM._hex_threshold(0.1)}'
    ELSE '{SM._hex_threshold(0.5)}'
  END
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q_sample_stratified",
    oracle=_STRAT_ORACLE,
    doc="per-stratum deterministic sampling (corpus mixing: downweight "
    "clicks to 2%, views to 10%, rest 50%)",
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        SM.stratified_sample_hash(ev, ["event_id"], "event_type", _STRATA, default=0.5)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_sampled"))
        .orderBy("event_type")
    )


_MIX_ORACLE = f"""
SELECT doc_id, source,
       md5('mix|' || CAST(doc_id AS VARCHAR)) AS mix_pos
FROM documents
WHERE {SM.bucket_sql(['doc_id'])} <
  CASE source
    WHEN 'src0' THEN '{SM._hex_threshold(0.25)}'
    WHEN 'src1' THEN '{SM._hex_threshold(0.75)}'
    ELSE '{SM._hex_threshold(1.0)}'
  END
ORDER BY mix_pos
LIMIT 50
"""


@register(
    "q_interleave_mix",
    oracle=_MIX_ORACLE,
    doc="deterministic corpus interleave: per-source downsampling to a "
    "target mix + salted reproducible shuffle order (first 50 rows of "
    "the mixed stream)",
)
def q_interleave_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    mixed = SM.interleave_mix(
        docs, ["doc_id"], "source", {"src0": 0.25, "src1": 0.75}, default=1.0
    )
    return (
        mixed.select("doc_id", "source", "mix_pos")
        .orderBy("mix_pos")
        .limit(50)
    )


_WORDS_SQL_P = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')"
)

_PACK_ORACLE = f"""
WITH RECURSIVE docs2 AS (
  SELECT doc_id,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
         len({_WORDS_SQL_P})::BIGINT AS weight,
         ROW_NUMBER() OVER (
           PARTITION BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
           ORDER BY doc_id) AS rn
  FROM documents
),
walk(shard, rn, bin_idx, fill) AS (
  SELECT shard, rn, 0::BIGINT, weight FROM docs2 WHERE rn = 1
  UNION ALL
  SELECT d.shard, d.rn,
         CASE WHEN w.fill + d.weight <= 200
              THEN w.bin_idx ELSE w.bin_idx + 1 END,
         CASE WHEN w.fill + d.weight <= 200
              THEN w.fill + d.weight ELSE d.weight END
  FROM walk w JOIN docs2 d ON d.shard = w.shard AND d.rn = w.rn + 1
)
SELECT d.doc_id, d.shard, w.bin_idx, d.weight
FROM walk w JOIN docs2 d ON d.shard = w.shard AND d.rn = w.rn
ORDER BY d.doc_id
"""


@register(
    "q_pack_documents",
    oracle=_PACK_ORACLE,
    doc="sequence packing: greedy next-fit of docs into 200-token bins, "
    "16 deterministic md5 shards packed independently in parallel "
    "(applyInPandas); oracle = recursive CTE running the identical rule",
)
def q_pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.functions.text import word_count
    from dumpty_spark.operators.packing import pack_greedy

    docs = load_table(spark, sf_dir, "documents")
    return (
        pack_greedy(docs, "doc_id", word_count("text"), budget=200)
        .select(F.col("id").alias("doc_id"), "shard", "bin_idx", "weight")
        .orderBy("doc_id")
    )


# the stopword regex is interpolated from functions/text.py STOPWORDS so
# the oracle mirrors the implementation exactly — a hand-copied list here
# would silently drift (the length/punct terms saturate on the fixture,
# which would hide the divergence)
from dumpty_spark.functions.text import STOPWORDS as _SW  # noqa: E402

_QSCORE_SQL = f"""(
  LEAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
            x -> x != ''))::DOUBLE / 50.0, 1.0)
  + (1.0 - LEAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 \\t\\n]'))::DOUBLE
           / NULLIF(LENGTH(text), 0) * 5, 1.0))
  + LEAST(len(regexp_extract_all(lower(text),
      '{_SW["en"]}'))::DOUBLE
      / NULLIF(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
               x -> x != '')), 0) * 4, 1.0)
) / 3"""

_WEIGHTED_ORACLE = f"""
SELECT lang,
       COUNT(*) AS n_kept,
       ROUND(AVG(ROUND({_QSCORE_SQL}, 4)), 4) AS avg_kept_quality
FROM documents
WHERE {SM.bucket_fraction_sql(["doc_id"])} < ROUND({_QSCORE_SQL}, 4)
GROUP BY lang
ORDER BY lang
"""


@register(
    "q_sample_weighted",
    oracle=_WEIGHTED_ORACLE,
    doc="quality-weighted Bernoulli sampling: per-row acceptance "
    "probability = quality score, decided by the row's own hash "
    "fraction — deterministic across runs/partitionings/engines",
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.functions.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    kept = SM.weighted_sample_hash(docs, ["doc_id"], quality_score("text"))
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.round(F.avg(quality_score("text")), 4).alias("avg_kept_quality"),
        )
        .orderBy("lang")
    )


_PIPELINE_ORACLE = f"""
WITH scored AS (
  SELECT *,
         ROUND({_QSCORE_SQL}, 4) AS q,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
  FROM documents
),
kept AS (
  SELECT * FROM scored
  WHERE lang = 'en' AND q >= 0.5
),
dedup AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM kept
  ) WHERE rn = 1
)
SELECT {SM.split_sql(["doc_id"], {"train": 0.8, "val": 0.1, "test": 0.1})}
         AS split,
       COUNT(*) AS n_docs,
       ROUND(AVG(q), 4) AS avg_quality
FROM dedup
GROUP BY split
ORDER BY split
"""


@register(
    "q_pipeline_compose",
    oracle=_PIPELINE_ORACLE,
    doc="the end-to-end training-data pipeline as ONE composed lazy plan: "
    "language+quality filter -> exact content dedup (keep-first) -> "
    "deterministic train/val/test split — every stage an operator from "
    "this repo, one oracle checks the composition",
)
def q_pipeline_compose(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.functions.text import fingerprint, quality_score
    from dumpty_spark.operators.dedup import dedup_keep_first

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.withColumn("q", quality_score("text")).withColumn(
        "fp", fingerprint("text")
    )
    kept = scored.filter((F.col("lang") == "en") & (F.col("q") >= 0.5))
    unique = dedup_keep_first(kept, ["fp"], ["doc_id"])
    split = SM.split_column(["doc_id"], {"train": 0.8, "val": 0.1, "test": 0.1})
    return (
        unique.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("q"), 4).alias("avg_quality"),
        )
        .orderBy("split")
    )


_EXACT_K_ORACLE = f"""
SELECT doc_id, lang, source
FROM documents
ORDER BY {SM.bucket_sql(["doc_id"])}, doc_id
LIMIT 40
"""


@register(
    "q_sample_exact_k",
    oracle=_EXACT_K_ORACLE,
    doc="deterministic EXACT-k sample: order by the row's own key hash + "
    "TakeOrderedAndProject (per-partition heaps, no global sort) — the "
    "fixed-size eval-set draw (E7)",
)
def q_sample_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return SM.sample_exact_k(docs, ["doc_id"], 40).select(
        "doc_id", "lang", "source"
    )


_WK_SQL = SM.weighted_key_sql(["doc_id"], "n_chars")

_WEIGHTED_K_ORACLE = f"""
SELECT doc_id, lang, n_chars
FROM (
  SELECT doc_id, lang, n_chars
  FROM documents
  WHERE n_chars > 0
  ORDER BY {_WK_SQL} DESC, doc_id
  LIMIT 50
)
ORDER BY doc_id
"""


@register(
    "q_sample_weighted_k",
    oracle=_WEIGHTED_K_ORACLE,
    doc="Efraimidis-Spirakis weighted EXACT-k draw without replacement "
    "(selection probability proportional to n_chars): u^(1/w) keys from the "
    "row's own hash, top-k via per-partition heaps — the quality-weighted "
    "fixed-size corpus draw (E7)",
)
def q_sample_weighted_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        SM.sample_weighted_k(docs, ["doc_id"], F.col("n_chars"), 50)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# E47: token-budget mixture (the pretraining data recipe)
# ---------------------------------------------------------------------------
_MIX_BUDGETS = {**{f"src{i}": 800.0 for i in range(10)},
                **{f"src{i}": 10_000.0 for i in range(10, 15)}}
# src15..src19 absent -> rate 0 (excluded from the mix)

_MIX_CASE = "CASE source " + " ".join(
    f"WHEN '{s}' THEN {b}" for s, b in sorted(_MIX_BUDGETS.items())
) + " ELSE 0.0 END"

_MIX_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source,
         len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x != '')) AS n_tok
  FROM documents
),
rates AS (
  -- zero-token guard matches token_budget_rates: a funded source with
  -- no tokens accepts everything, an unfunded one is excluded (the bare
  -- division would be inf/NaN here but 0.0 in the engine)
  SELECT source,
         CASE WHEN SUM(n_tok) = 0
              THEN CASE WHEN {_MIX_CASE} > 0 THEN 1.0 ELSE 0.0 END
              ELSE LEAST(1.0, {_MIX_CASE} / SUM(n_tok)) END AS rate
  FROM toks GROUP BY source
)
SELECT t.source,
       COUNT(*) AS n_docs,
       SUM(t.n_tok)::BIGINT AS sampled_tokens,
       ROUND(r.rate, 6) AS rate
FROM toks t JOIN rates r USING (source)
WHERE {SM.bucket_fraction_sql(['doc_id'])} < r.rate
GROUP BY t.source, r.rate
ORDER BY t.source
"""


@register(
    "q_token_budget_mix",
    oracle=_MIX_ORACLE,
    doc="token-budget mixture sampling (E47): per-source acceptance "
    "rates min(1, budget/total_tokens) from one metadata-sized stats "
    "pass, membership by deterministic md5 hash fraction — the "
    "reproducible 'data recipe' draw of a pretraining corpus build; "
    "capped, uncapped, and excluded sources all exercised",
)
def q_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.functions import text as X

    # checkpoint the tokenized frame: the regex tokenizer is the cost,
    # and rates + mix + final agg all consume the same rows
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(X.words("text")).alias("n_tok")
    ).localCheckpoint()
    rates = SM.token_budget_rates(docs, "source", F.col("n_tok"), _MIX_BUDGETS)
    mixed = SM.token_budget_mix(
        docs, ["doc_id"], "source", F.col("n_tok"), _MIX_BUDGETS, rates=rates
    )
    rate_col = F.create_map(
        *[x for s, r in rates.items() for x in (F.lit(s), F.lit(r))]
    )[F.col("source")]
    return (
        mixed.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("sampled_tokens"),
        )
        .withColumn("rate", F.round(rate_col, 6))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# E59: dedup-aware (leakage-safe) train/val/test split
# ---------------------------------------------------------------------------
# The eval-contamination guard every corpus release needs: near-dup
# documents must NEVER straddle a split boundary, or the val/test sets
# leak training data. Split assignment is therefore keyed on the
# near-dup CLUSTER id (connected components over the Jaccard pair
# graph, singletons = own doc), through the same md5-fraction draw as
# the rest of the sampling family — deterministic and bit-identical in
# both engines, so the whole contract (per-split masses AND the
# zero-leakage invariant) is exactly oracle-checked.


def _split_oracle() -> str:
    from dumpty_spark.queries.dedup import _JACCARD_EDGE_CTES

    frac = SM.bucket_fraction_sql(["cluster_id"])
    return f"""
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
  UNION ALL SELECT b_id, a_id FROM edges
),
nodes AS (SELECT DISTINCT src AS id FROM sym),
walk(node, root) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT s.dst, w.root FROM walk w JOIN sym s ON s.src = w.node
),
comp AS (SELECT node AS doc_id, MIN(root) AS c FROM walk GROUP BY node),
assigned AS (
  SELECT d.doc_id,
         COALESCE(comp.c, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp ON comp.doc_id = d.doc_id
),
split AS (
  SELECT doc_id, cluster_id,
         CASE WHEN {frac} < 0.8 THEN 'train'
              WHEN {frac} < 0.9 THEN 'val'
              ELSE 'test' END AS split
  FROM assigned
),
leaky AS (
  SELECT COUNT(*) AS n FROM (
    SELECT cluster_id FROM split GROUP BY cluster_id
    HAVING COUNT(DISTINCT split) > 1
  )
)
SELECT split,
       COUNT(*)::BIGINT AS n_docs,
       COUNT(DISTINCT cluster_id)::BIGINT AS n_clusters,
       (SELECT n FROM leaky)::BIGINT AS n_leaky_clusters
FROM split
GROUP BY split
ORDER BY split
"""


@register(
    "q_leakage_safe_split",
    oracle=_split_oracle(),  # queries.dedup registers before us (import order)
    doc="dedup-aware train/val/test split (E59): split membership keyed "
    "on the near-dup CLUSTER id (CC over the Jaccard pair graph, "
    "singletons = own doc) via the family's md5-fraction draw, so near "
    "duplicates can never straddle a boundary — per-split doc/cluster "
    "masses AND the zero-leakage invariant are exactly oracle-checked",
)
def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators import dedup as D

    from dumpty_spark.queries.shared_graph import jaccard_pair_graph

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pair_graph(spark, sf_dir)
    comp = D.connected_components(pairs)
    assigned = docs.join(
        comp.withColumnRenamed("id", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
    )
    frac = SM.bucket_fraction(["cluster_id"])
    split = assigned.withColumn(
        "split",
        F.when(frac < 0.8, "train").when(frac < 0.9, "val").otherwise("test"),
    )
    leaky = split.groupBy("cluster_id").agg(
        F.countDistinct("split").alias("ns")
    ).filter(F.col("ns") > 1).agg(F.count("*").alias("n_leaky_clusters"))
    return (
        split.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("cluster_id").alias("n_clusters"),
        )
        .crossJoin(F.broadcast(leaky))
        .orderBy("split")
    )
