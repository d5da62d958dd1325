"""Round-7 engine extensions, ninth batch (EXT E181-E182): TextTiling
topic segmentation and an embedding-batch drift monitor.

Design rules: block/term rollups only (never token-pair explosion),
adjacent-block joins keyed on (doc, block+1), moments-based drift with
6dp pre-rounding, exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dumpty_spark.queries import register
from dumpty_spark.queries.dedup import _WORDS_SQL
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E181: TextTiling topic segmentation (Hearst 1997, depth-score form)
# ---------------------------------------------------------------------------
# The chunk-boundary detector RAG ingestion wants instead of fixed
# 40-word windows (E4): cosine similarity between ADJACENT 10-token
# blocks (stride 10 — disjoint blocks keep the oracle's vectors exact),
# then a depth score at each gap, depth = max(0, prev_sim - sim) +
# max(0, next_sim - sim), and a boundary wherever depth exceeds TWICE the
# doc's mean gap depth — compared in INTEGER micro-units (deps live on
# the 1e-6 grid, so averaging then 6dp-rounding lands exactly on
# rounding midpoints where engine ulps split; integerizing makes the
# whole surface exact — found by a real hash mismatch). Everything is
# (doc, block, term) rollups: the adjacent-block dot is ONE equi-join on
# (doc, term, block+1), norms ride the block rollup, no token-pair
# explosion. 6dp-pre-rounded sims so lag/lead depth arithmetic is
# engine-stable. Per-doc boundary counts + depth stats for docs >= 3
# blocks.

_TT_BLOCK = 10

_TT_ORACLE = f"""
WITH words AS (
  SELECT doc_id, {_WORDS_SQL} AS w FROM documents
),
tok AS (
  SELECT doc_id, ((p - 1) // {_TT_BLOCK})::BIGINT AS blk, w[p] AS term
  FROM words, UNNEST(generate_series(1, len(w))) AS t(p)
  WHERE len(w) >= {_TT_BLOCK} * 3
),
bt AS (
  SELECT doc_id, blk, term, COUNT(*)::DOUBLE AS c
  FROM tok GROUP BY 1, 2, 3
),
nrm AS (
  SELECT doc_id, blk, SQRT(SUM(c * c)) AS n FROM bt GROUP BY 1, 2
),
dots AS (
  SELECT x.doc_id, x.blk,
         SUM(x.c * y.c) AS dot
  FROM bt x JOIN bt y
    ON y.doc_id = x.doc_id AND y.blk = x.blk + 1 AND y.term = x.term
  GROUP BY 1, 2
),
sims AS (
  SELECT n1.doc_id, n1.blk,
         ROUND(COALESCE(d.dot, 0) / (n1.n * n2.n), 6) AS sim
  FROM nrm n1
  JOIN nrm n2 ON n2.doc_id = n1.doc_id AND n2.blk = n1.blk + 1
  LEFT JOIN dots d ON d.doc_id = n1.doc_id AND d.blk = n1.blk
),
depth AS (
  SELECT doc_id, blk, sim,
         GREATEST(COALESCE(LAG(sim) OVER w - sim, 0), 0)
         + GREATEST(COALESCE(LEAD(sim) OVER w - sim, 0), 0) AS dep
  FROM sims
  WINDOW w AS (PARTITION BY doc_id ORDER BY blk)
),
ints AS (
  SELECT doc_id, blk, ROUND(dep * 1000000)::BIGINT AS dep_u FROM depth
),
st AS (
  SELECT doc_id,
         COUNT(*)::BIGINT AS n_gaps,
         SUM(dep_u)::BIGINT AS sum_u
  FROM ints GROUP BY doc_id
)
SELECT i.doc_id,
       st.n_gaps,
       SUM(CASE WHEN i.dep_u * st.n_gaps > 2 * st.sum_u AND i.dep_u > 0
                THEN 1 ELSE 0 END)::BIGINT AS n_boundaries,
       st.sum_u AS depth_sum_u6,
       MAX(i.dep_u)::BIGINT AS max_depth_u6
FROM ints i JOIN st ON st.doc_id = i.doc_id
GROUP BY i.doc_id, st.n_gaps, st.sum_u
ORDER BY i.doc_id
"""


@register(
    "q_text_tiling",
    oracle=_TT_ORACLE,
    doc="TextTiling topic segmentation (E181, Hearst 1997): adjacent "
    "10-token-block cosine valleys scored by depth (max(0, prev-sim) + "
    "max(0, next-sim)), boundaries above 2x the mean gap depth, all "
    "depth arithmetic in exact integer micro-units — the "
    "topic-aware chunk-boundary detector next to E4's fixed windows; "
    "all work on (doc, block, term) rollups, the adjacent-block dot is "
    "one equi-join on (doc, term, block+1), 6dp-pre-rounded sims",
)
def q_text_tiling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.functions import text as X

    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select("doc_id", X.words("text").alias("w"))
        .filter(F.size("w") >= _TT_BLOCK * 3)
        .select(
            "doc_id",
            F.posexplode("w").alias("p0", "term"),
        )
        .select(
            "doc_id",
            (F.col("p0") / _TT_BLOCK).cast("long").alias("blk"),
            "term",
        )
    )
    bt = tok.groupBy("doc_id", "blk", "term").agg(
        F.count("*").cast("double").alias("c")
    ).localCheckpoint()  # one rollup feeds norms AND the adjacent dot
    nrm = bt.groupBy("doc_id", "blk").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("n")
    )
    dots = (
        bt.alias("x")
        .join(
            bt.select(
                "doc_id",
                (F.col("blk") - 1).alias("blk"),
                "term",
                F.col("c").alias("c2"),
            ).alias("y"),
            ["doc_id", "blk", "term"],
        )
        .groupBy("doc_id", "blk")
        .agg(F.sum(F.col("c") * F.col("c2")).alias("dot"))
    )
    n2 = nrm.select(
        "doc_id", (F.col("blk") - 1).alias("blk"), F.col("n").alias("n_next")
    )
    sims = (
        nrm.join(n2, ["doc_id", "blk"])
        .join(dots, ["doc_id", "blk"], "left")
        .select(
            "doc_id",
            "blk",
            F.round(
                F.coalesce(F.col("dot"), F.lit(0.0))
                / (F.col("n") * F.col("n_next")),
                6,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("blk")
    dep = (
        F.greatest(
            F.coalesce(F.lag("sim").over(w) - F.col("sim"), F.lit(0.0)),
            F.lit(0.0),
        )
        + F.greatest(
            F.coalesce(F.lead("sim").over(w) - F.col("sim"), F.lit(0.0)),
            F.lit(0.0),
        )
    )
    ints = sims.select(
        "doc_id",
        "blk",
        F.round(dep * 1000000).cast("long").alias("dep_u"),
    )
    st = ints.groupBy("doc_id").agg(
        F.count("*").alias("n_gaps"), F.sum("dep_u").alias("sum_u")
    )
    return (
        ints.join(F.broadcast(st), "doc_id")
        .groupBy("doc_id", "n_gaps", "sum_u")
        .agg(
            F.sum(
                (
                    (F.col("dep_u") * F.col("n_gaps") > 2 * F.col("sum_u"))
                    & (F.col("dep_u") > 0)
                ).cast("int")
            ).alias("n_boundaries"),
            F.max("dep_u").alias("max_depth_u6"),
        )
        .select(
            "doc_id",
            "n_gaps",
            "n_boundaries",
            F.col("sum_u").alias("depth_sum_u6"),
            "max_depth_u6",
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# E182: embedding-batch drift monitor
# ---------------------------------------------------------------------------
# The observability check before mixing two embedding batches (a model
# re-deploy, a re-crawled shard): per dimension-free summary — centroid
# L2 shift, centroid cosine, total-variance (trace) ratio, and the
# per-dim variance-ratio extremes — computed from ONE grouped moments
# pass per batch over the posexplode'd (batch, dim) frame (the E3d
# centroid shape), dims-sized downstream. 6dp-pre-rounded per-dim means
# and variances so the shift/trace arithmetic is engine-stable. Batches
# are the vec-id parity split (the E178 convention).

_EDRIFT_ORACLE = """
WITH x AS (
  SELECT vec_id % 2 AS b, i - 1 AS i, e::DOUBLE AS v
  FROM (SELECT vec_id, unnest(embedding) AS e,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings)
),
m AS (
  SELECT b, i, ROUND(AVG(v), 6) AS mu, ROUND(VAR_POP(v), 6) AS s2
  FROM x GROUP BY b, i
),
j AS (
  SELECT a.i, a.mu AS mu0, bb.mu AS mu1, a.s2 AS s20, bb.s2 AS s21
  FROM m a JOIN m bb ON bb.i = a.i AND a.b = 0 AND bb.b = 1
)
SELECT ROUND(SQRT(SUM((mu1 - mu0) * (mu1 - mu0))), 6) AS centroid_shift,
       ROUND(SUM(mu0 * mu1) /
             (SQRT(SUM(mu0 * mu0)) * SQRT(SUM(mu1 * mu1))), 6)
         AS centroid_cosine,
       ROUND(SUM(s21) / SUM(s20), 6) AS trace_ratio,
       ROUND(MAX(s21 / s20), 6) AS max_dim_var_ratio,
       ROUND(MIN(s21 / s20), 6) AS min_dim_var_ratio
FROM j
"""


@register(
    "q_embedding_drift",
    oracle=_EDRIFT_ORACLE,
    doc="embedding-batch drift monitor (E182): centroid L2 shift, "
    "centroid cosine, trace ratio and per-dim variance-ratio extremes "
    "between the two vec-id-parity batches — one grouped moments pass "
    "per batch (the E3d posexplode shape), dims-sized downstream, "
    "6dp-pre-rounded moments; the observability gate before mixing "
    "re-embedded shards",
)
def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        (F.col("vec_id") % 2).alias("b"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "v"),
    )
    m = x.groupBy("b", "i").agg(
        F.round(F.avg("v"), 6).alias("mu"),
        F.round(F.var_pop("v"), 6).alias("s2"),
    )
    j = (
        m.filter(F.col("b") == 0)
        .select("i", F.col("mu").alias("mu0"), F.col("s2").alias("s20"))
        .join(
            m.filter(F.col("b") == 1).select(
                "i", F.col("mu").alias("mu1"), F.col("s2").alias("s21")
            ),
            "i",
        )
    )
    shift = F.sqrt(F.sum((F.col("mu1") - F.col("mu0")) ** 2))
    cos = F.sum(F.col("mu0") * F.col("mu1")) / (
        F.sqrt(F.sum(F.col("mu0") ** 2)) * F.sqrt(F.sum(F.col("mu1") ** 2))
    )
    return j.agg(
        F.round(shift, 6).alias("centroid_shift"),
        F.round(cos, 6).alias("centroid_cosine"),
        F.round(F.sum("s21") / F.sum("s20"), 6).alias("trace_ratio"),
        F.round(F.max(F.col("s21") / F.col("s20")), 6).alias(
            "max_dim_var_ratio"
        ),
        F.round(F.min(F.col("s21") / F.col("s20")), 6).alias(
            "min_dim_var_ratio"
        ),
    )
