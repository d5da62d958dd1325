"""Round-7 engine extensions, seventh batch (EXT E179): maximal marginal
relevance (MMR) diversified re-ranking — the diversified top-k member of
the retrieval family (cf. the EDBT'20 diversified top-k line in
PAPERS.md), run greedily over a top-k-bounded candidate frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E179: MMR diversified re-ranking
# ---------------------------------------------------------------------------
# A plain cosine top-k returns near-duplicates of the same hit; MMR
# (Carbonell & Goldstein 1998) greedily picks
#   argmax  λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)
# trading relevance against redundancy. The candidate pool is the
# cosine top-20 vs the query embedding — top-k-BOUNDED by construction
# at any corpus scale (the pool comes from a top-k search; swap the
# brute-force frame for an ANN search at 100 TB, the re-rank is
# unchanged) — so the greedy rounds run over a 20-row frame with 20×20
# pairwise sims: metadata work after one corpus scan, the E56 1-row
# argmax discipline. 4dp-rounded rel and pair sims + id tie-breaks keep
# the greedy trajectory engine-stable; the oracle unrolls the identical
# 5 rounds.

_MMR_POOL = 20
_MMR_K = 5
_MMR_LAMBDA = 0.7


def _mmr_oracle() -> str:
    head = f"""
WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
rel AS (
  SELECT b.vec_id AS id,
         ROUND(list_cosine_similarity(b.embedding::DOUBLE[],
                                      q.embedding::DOUBLE[]), 4) AS rel
  FROM embeddings b, q WHERE b.vec_id != 0
  ORDER BY rel DESC, id LIMIT {_MMR_POOL}
),
pw AS (
  SELECT x.vec_id AS i, y.vec_id AS j,
         ROUND(list_cosine_similarity(x.embedding::DOUBLE[],
                                      y.embedding::DOUBLE[]), 4) AS s
  FROM embeddings x
  JOIN embeddings y ON x.vec_id != y.vec_id
  WHERE x.vec_id IN (SELECT id FROM rel)
    AND y.vec_id IN (SELECT id FROM rel)
)"""
    ctes = [head.strip()]
    picked: list[str] = []
    lam, mu = _MMR_LAMBDA, 1 - _MMR_LAMBDA
    for r in range(1, _MMR_K + 1):
        not_picked = (
            "WHERE id NOT IN ("
            + ", ".join(f"(SELECT id FROM {p})" for p in picked)
            + ")"
            if picked
            else ""
        )
        if picked:
            pick_set = " UNION ALL ".join(
                f"SELECT id FROM {p}" for p in picked
            )
            pen = (
                f"COALESCE((SELECT MAX(pw.s) FROM pw "
                f"WHERE pw.i = c.id AND pw.j IN ({pick_set})), 0)"
            )
        else:
            pen = "0"
        ctes.append(
            f"""s{r} AS MATERIALIZED (
  SELECT c.id, c.rel, ROUND({pen}, 4) AS penalty,
         ROUND({lam} * c.rel - {mu} * ROUND({pen}, 4), 4) AS mmr
  FROM (SELECT id, rel FROM rel {not_picked}) c
  ORDER BY ROUND({lam} * c.rel - {mu} * ROUND({pen}, 4), 4) DESC, c.id
  LIMIT 1
)"""
        )
        picked.append(f"s{r}")
    rounds = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, id, rel, penalty, mmr FROM s{r}"
        for r in range(1, _MMR_K + 1)
    )
    return (
        ",\n".join(ctes)
        + f""",
rounds AS ({rounds})
SELECT round::BIGINT AS round, id AS doc_id, rel, penalty, mmr
FROM rounds ORDER BY round"""
    )


@register(
    "q_mmr_rerank",
    oracle=_mmr_oracle(),
    doc="MMR diversified re-ranking (E179): greedy top-5 from the "
    "cosine top-20 pool by lambda*rel - (1-lambda)*max-sim-to-selected "
    "(Carbonell & Goldstein) — the anti-redundancy re-rank every "
    "retrieval stack needs next to plain top-k; pool is top-k-bounded "
    "by construction so the greedy rounds are metadata work after one "
    "corpus scan; oracle unrolls the identical 5 rounds",
)
def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.functions.vectors import as_double, dot, normalize

    emb = load_table(spark, sf_dir, "embeddings")
    nv = emb.select(
        F.col("vec_id").alias("id"),
        normalize(as_double("embedding")).alias("v"),
    )
    qv = nv.filter(F.col("id") == 0).select(F.col("v").alias("qv"))
    rel = (
        nv.filter(F.col("id") != 0)
        .crossJoin(F.broadcast(qv))
        .select("id", "v", F.round(dot(F.col("v"), F.col("qv")), 4).alias("rel"))
        .orderBy(F.desc("rel"), "id")
        .limit(_MMR_POOL)
        .localCheckpoint()  # the 20-row candidate pool
    )
    return mmr_rerank_pool(spark, rel)


def mmr_rerank_pool(spark: SparkSession, rel: DataFrame) -> DataFrame:
    """The MMR greedy re-rank over ANY top-k-bounded candidate pool in
    (id, v, rel) shape — the pool is whatever search produced it (the
    brute-force top-20 in q_mmr_rerank, an IVF-index pool at corpus
    scale: q_ann_composed_retrieval feeds this identical tail from
    ann_ivf_topk and proves the picks match the brute-force pool's).
    Pairwise sims are one pool x pool broadcast pass; the greedy rounds
    run driver-side over the pool-sized dicts (E56 metadata-work
    discipline — the pool is k-bounded by construction)."""
    from dumpty_spark.functions.vectors import dot

    pw = (
        rel.select(F.col("id").alias("i"), F.col("v").alias("vi"))
        .crossJoin(
            F.broadcast(rel.select(F.col("id").alias("j"), F.col("v").alias("vj")))
        )
        .filter(F.col("i") != F.col("j"))
        .select("i", "j", F.round(dot(F.col("vi"), F.col("vj")), 4).alias("s"))
        .localCheckpoint()  # 20x20 pairwise sims, computed once
    )
    cand = {r["id"]: r["rel"] for r in rel.select("id", "rel").collect()}
    sims = {(r["i"], r["j"]): r["s"] for r in pw.collect()}
    lam, mu = _MMR_LAMBDA, 1 - _MMR_LAMBDA
    picked: list[int] = []
    out = []
    for r in range(1, _MMR_K + 1):
        best = None
        for cid, crel in sorted(cand.items()):
            if cid in picked:
                continue
            pen = round(
                max((sims.get((cid, p), 0.0) for p in picked), default=0.0), 4
            )
            mmr = round(lam * crel - mu * pen, 4)
            if best is None or (mmr, -cid) > (best[4], -best[1]):
                best = (r, cid, crel, pen, mmr)
        picked.append(best[1])
        out.append(best)
    return spark.createDataFrame(
        out, "round long, doc_id long, rel double, penalty double, mmr double"
    )
