"""Round-7 engine extensions, sixth batch (EXT E178): mutual
nearest-neighbor mining with ratio margin — the parallel-corpus /
alignment-mining primitive (Artetxe & Schwenk 2019's margin criterion on
top of reciprocal top-1 pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E178: mutual nearest neighbors + ratio margin (alignment mining)
# ---------------------------------------------------------------------------
# Bitext/alignment mining keeps a candidate pair only when each side is
# the other's top-1 neighbor (reciprocity kills hub vectors that are
# "near everything") and ranks survivors by the ratio margin
# sim(a,b) / mean(top-4 sims of a, top-4 sims of b) — the margin
# criterion that separates true translations/alignments from dense-
# region noise. Here both "sides" are the embeddings table split by
# vec-id parity (a deterministic stand-in for two corpora). Everything
# rides ONE pairwise-sim frame: per-side top-4 windows give the margin
# denominators and the top-1 rows give reciprocity. At corpus scale the
# identical composition runs over the ANN indexes (ivf/lsh_search accept
# any corpus DataFrame) instead of the brute-force frame — the plan
# shape downstream of candidate generation is unchanged. 4dp-rounded
# sims + id tie-breaks keep every ranking engine-stable; margins
# pre-round their numerator/denominator the same way on both engines.

_MNN_TOPK = 4  # margin denominator depth
# bounded demo slice: the brute-force pair frame is quadratic BY NATURE
# (the documented scale path swaps in the ANN indexes for candidate
# generation); 500 ids keep the hashed surface stable while the full
# sf0.1 corpus made this the suite's most expensive query (10.2s) for
# no extra evidence — the E129 slicing rationale
_MNN_MAX_ID = 1000

_MNN_ORACLE = f"""
WITH a AS (SELECT vec_id, embedding FROM embeddings
           WHERE vec_id % 2 = 0 AND vec_id < {_MNN_MAX_ID}),
b AS (SELECT vec_id, embedding FROM embeddings
      WHERE vec_id % 2 = 1 AND vec_id < {_MNN_MAX_ID}),
sims AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                      b.embedding::DOUBLE[]), 4) AS sim
  FROM a, b
),
ra AS (
  SELECT a_id, b_id, sim,
         ROW_NUMBER() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id) AS rk
  FROM sims
),
rb AS (
  SELECT a_id, b_id, sim,
         ROW_NUMBER() OVER (PARTITION BY b_id ORDER BY sim DESC, a_id) AS rk
  FROM sims
),
da AS (
  SELECT a_id, AVG(sim) AS den_a FROM ra WHERE rk <= {_MNN_TOPK} GROUP BY 1
),
db AS (
  SELECT b_id, AVG(sim) AS den_b FROM rb WHERE rk <= {_MNN_TOPK} GROUP BY 1
),
mutual AS (
  SELECT ra.a_id, ra.b_id, ra.sim
  FROM ra JOIN rb ON rb.a_id = ra.a_id AND rb.b_id = ra.b_id
  WHERE ra.rk = 1 AND rb.rk = 1
)
SELECT m.a_id, m.b_id, m.sim,
       ROUND(m.sim / ((da.den_a + db.den_b) / 2), 4) AS margin
FROM mutual m
JOIN da ON da.a_id = m.a_id
JOIN db ON db.b_id = m.b_id
ORDER BY ROUND(m.sim / ((da.den_a + db.den_b) / 2), 4) DESC, m.a_id
"""


@register(
    "q_mutual_nn_margin",
    oracle=_MNN_ORACLE,
    doc="mutual-NN alignment mining with ratio margin (E178): keep "
    "(a, b) only when each is the other's top-1 across the parity split "
    "(reciprocity kills hub vectors), ranked by sim over the mean "
    "top-4 neighborhood density (Artetxe & Schwenk margin) — ONE "
    "pairwise-sim frame feeds both top-1 reciprocity and the margin "
    "denominators; at corpus scale the same composition runs over the "
    "ANN indexes instead of the brute-force frame",
)
def q_mutual_nn_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.functions.vectors import as_double, dot, normalize
    from dumpty_spark.operators.util import ensure_parallelism

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _MNN_MAX_ID
    )
    # parallelism floor on the STREAM side: a 1000-row slice is one
    # input split, and the quadratic dot work downstream of the
    # broadcast crossJoin would otherwise run on a single core (the
    # brute_force_topk discipline)
    a = ensure_parallelism(
        emb.filter(F.col("vec_id") % 2 == 0).select(
            F.col("vec_id").alias("a_id"),
            normalize(as_double("embedding")).alias("va"),
        )
    )
    b = emb.filter(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("b_id"),
        normalize(as_double("embedding")).alias("vb"),
    )
    sims = (
        a.crossJoin(F.broadcast(b))
        .select(
            "a_id",
            "b_id",
            F.round(dot(F.col("va"), F.col("vb")), 4).alias("sim"),
        )
        .localCheckpoint()  # one sim frame feeds 2 rankings + 2 denominators
    )
    wa = Window.partitionBy("a_id").orderBy(F.desc("sim"), "b_id")
    wb = Window.partitionBy("b_id").orderBy(F.desc("sim"), "a_id")
    ranked = sims.withColumn("rka", F.row_number().over(wa)).withColumn(
        "rkb", F.row_number().over(wb)
    )
    ab = ranked.filter(F.col("rka") <= _MNN_TOPK).select(
        F.col("a_id").alias("q_id"), F.col("b_id").alias("n_id"),
        "sim", F.col("rka").alias("rnk"),
    )
    ba = ranked.filter(F.col("rkb") <= _MNN_TOPK).select(
        F.col("b_id").alias("q_id"), F.col("a_id").alias("n_id"),
        "sim", F.col("rkb").alias("rnk"),
    )
    return mutual_nn_margin_from_topk(ab, ba)


def mutual_nn_margin_from_topk(ab: DataFrame, ba: DataFrame) -> DataFrame:
    """The mutual-NN + margin COMPOSITION over two per-side top-k
    candidate frames in (q_id, n_id, sim, rnk) shape — exactly what the
    ANN searches return (ann_lsh_topk / ivf_search / lsh_search accept
    any corpus DataFrame). This is the corpus-scale path the brute-
    force q_mutual_nn_margin docstring promises: candidate generation
    swaps from the quadratic sims frame to the ANN indexes, and this
    identical downstream plan (two top-1 slices joined for reciprocity,
    two avg-denominator rollups broadcast for the Artetxe-Schwenk
    margin) is UNCHANGED. Proven against the brute-force slice by
    q_ann_composed_retrieval + tests/test_frontier26.py."""
    da = (
        ab.groupBy(F.col("q_id").alias("a_id"))
        .agg(F.avg("sim").alias("den_a"))
    )
    db = (
        ba.groupBy(F.col("q_id").alias("b_id"))
        .agg(F.avg("sim").alias("den_b"))
    )
    t1a = ab.filter(F.col("rnk") == 1).select(
        F.col("q_id").alias("a_id"), F.col("n_id").alias("b_id"), "sim"
    )
    t1b = ba.filter(F.col("rnk") == 1).select(
        F.col("n_id").alias("a_id"), F.col("q_id").alias("b_id")
    )
    margin = F.round(
        F.col("sim") / ((F.col("den_a") + F.col("den_b")) / 2), 4
    )
    return (
        t1a.join(t1b, ["a_id", "b_id"])  # reciprocity: top-1 both ways
        .join(F.broadcast(da), "a_id")
        .join(F.broadcast(db), "b_id")
        .select("a_id", "b_id", "sim", margin.alias("margin"))
        .orderBy(F.desc("margin"), "a_id")
    )
