"""Product quantization for the vector index family (EXT E3h).

Why it exists: the at-rest IVF/LSH indexes (operators/similarity.py)
store FULL float vectors — at 100 TB of embeddings the index IS the
corpus, and scan cost is dominated by vector bytes. Product quantization
(Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011 — public literature) splits each vector into ``m``
subvectors and replaces each with the id of its nearest per-subspace
codeword: dim×4 bytes become m×1 bytes (16–32× compression), and
queries score candidates with an m-lookup table sum instead of a
dim-length dot product (asymmetric distance computation, ADC).

Spark-first execution shape:

- **train**: codebook seeds are the k vectors of smallest
  ``xxhash64(id)`` (the same deterministic pseudo-random draw the IVF
  coarse quantizer uses), refined by one distributed Lloyd step per
  subspace — the refinement aggregation moves only (sub, code, pos)
  means, ≤ k×dim rows, metadata-sized.
- **encode**: one Arrow-batched numpy pass (reshape → per-subspace
  distance matrix → argmin); map-side, no shuffle.
- **search**: coarse cells partition-prune the scan exactly like
  ivf_search; the per-query LUTs (nq × m × k floats) are closure-
  broadcast into one scoring pandas UDF over the candidates. No full
  vector is ever read at search time — the index stores codes only.

Everything is deterministic (hash-seeded draws, fixed Lloyd step count),
so rebuilds and the tests' recall audits are reproducible.
"""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dumpty_spark.functions.vectors import as_double, dot, normalize
from dumpty_spark.operators.similarity import (
    _best_cell,
    _ivf_centroids,
    _normalized_corpus,
    _probe_cells,
    _rerank_topk,
)


def pq_train(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 16,
    k: int = 32,
    iters: int = 5,
    normalized: DataFrame | None = None,
) -> list[list[list[float]]]:
    """Train per-subspace codebooks: deterministic seed draw + ``iters``
    distributed Lloyd steps. Returns codebooks[m][k][dim/m].

    Each Lloyd step is one corpus pass (map-side encode) feeding one
    partial-aggregated mean per (sub, code, pos) — the aggregate result
    is ≤ k·dim rows, metadata-sized, so the step count is a constant
    factor on a scan, never a driver-memory risk."""
    import numpy as np

    # accept a pre-normalized/cached frame so ivf_pq_build's corpus pass
    # isn't duplicated (normalization is a full scan at corpus scale)
    cn = (
        normalized
        if normalized is not None
        else _normalized_corpus(corpus, id_col, vec_col).localCheckpoint()
    )
    dim = len(cn.select("nv").first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    seeds = (
        cn.withColumn("h", F.xxhash64("n_id")).orderBy("h").limit(k).collect()
    )
    if len(seeds) < k:
        raise ValueError(f"pq_train: corpus has {len(seeds)} rows < k={k}")
    cb = np.array([list(r["nv"]) for r in seeds]).reshape(k, m, dsub)
    cb = np.transpose(cb, (1, 0, 2)).copy()  # m × k × dsub

    for _ in range(iters):
        codes_col = pq_encode_col("nv", cb.tolist())
        mean_rows = (
            cn.select(F.posexplode(codes_col).alias("sub", "code"), "nv")
            .select(
                "sub",
                "code",
                F.posexplode(
                    F.slice("nv", F.col("sub") * dsub + 1, dsub)
                ).alias("pos", "x"),
            )
            .groupBy("sub", "code", "pos")
            .agg(F.avg("x").alias("mval"))
            .collect()
        )
        for r in mean_rows:
            cb[int(r["sub"]), int(r["code"]), int(r["pos"])] = r["mval"]
    return cb.tolist()


def pq_encode_col(vec_name: str, codebooks: list[list[list[float]]]):
    """array<int> codes Column: per-subspace L2-argmin against the
    broadcast codebooks — one numpy pass per Arrow batch, map-side."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    cb = np.array(codebooks)  # m × k × dsub
    m, k, dsub = cb.shape
    cb_sq = (cb**2).sum(axis=2)  # m × k

    @pandas_udf("array<int>")
    def enc(col: pd.Series) -> pd.Series:
        import numpy as np

        vs = np.vstack(col.to_numpy()).reshape(-1, m, dsub)  # B × m × dsub
        # ||v - c||² = ||c||² - 2 v·c + const(v): argmin over k per sub
        dots = np.einsum("bmd,mkd->bmk", vs, cb)
        codes = np.argmin(cb_sq[None, :, :] - 2.0 * dots, axis=2)
        return pd.Series(list(codes.astype("int32")))

    return enc(vec_name)


def ivf_pq_build(
    corpus: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    m: int = 16,
    k: int = 32,
    iters: int = 5,
    normalized: DataFrame | None = None,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> dict:
    """Materialize the IVF-PQ index at rest: coarse cells partition the
    layout (identical pruning story to ivf_build), but rows store ONLY
    (n_id, codes) — m bytes of payload per vector instead of dim×8.
    Sidecars pin coarse centroids + codebooks. Returns size stats so the
    compression claim is measurable, not aspirational."""
    own_cache = normalized is None
    cn = (
        normalized
        if normalized is not None
        else _normalized_corpus(corpus, id_col, vec_col).cache()
    )
    cents = (
        centroids
        if centroids is not None
        else _ivf_centroids(cn, nlist, _best_cell)
    )
    codebooks = pq_train(
        corpus, id_col, vec_col, m=m, k=k, iters=iters, normalized=cn
    )
    assigned = cn.select(
        "n_id",
        pq_encode_col("nv", codebooks).alias("codes"),
        _best_cell("nv", cents).alias("c_id"),
    )
    cells_dir = os.path.join(index_dir, "cells")
    # repartition on the partition column first: without it every shuffle
    # task writes its own sliver into every cell directory (tasks x nlist
    # tiny files); with it, one file per cell
    assigned.repartition("c_id").write.mode("overwrite").partitionBy(
        "c_id"
    ).parquet(cells_dir)
    with open(os.path.join(index_dir, "centroids.json"), "w") as fh:
        json.dump([{"c_id": c, "v": v} for c, v in cents], fh)
    with open(os.path.join(index_dir, "codebooks.json"), "w") as fh:
        json.dump({"m": m, "k": k, "codebooks": codebooks}, fh)
    if own_cache:
        cn.unpersist()
    import glob as g

    code_bytes = sum(
        os.path.getsize(p)
        for p in g.glob(os.path.join(cells_dir, "**", "part-*"), recursive=True)
        if os.path.isfile(p)
    )
    return {"nlist": nlist, "m": m, "k": k, "index_bytes": code_bytes}


def ivf_pq_search(
    spark,
    index_dir: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    topk: int = 5,
    nprobe: int = 4,
    refine_with: DataFrame | None = None,
    shortlist: int | None = None,
) -> DataFrame:
    """ADC search over a built IVF-PQ index: probe cells prune the scan;
    per-query LUTs (LUT[s][j] = q_s · codebook[s][j]) turn each
    candidate's score into an m-gather sum. sim ≈ dot(q, decode(codes)),
    rounded 4dp like every other similarity surface here.

    ``refine_with``: FAISS-IndexRefineFlat-style exact re-rank — the ADC
    shortlist (top ``shortlist`` per query, default 4·topk) joins back to
    the source-of-truth vector table for an exact dot, and the final
    top-k is computed on exact sims. The join moves only
    queries×shortlist rows, so refinement is batch-sized at any corpus
    scale; it converts PQ's quantization noise into a shortlist-recall
    problem, which nprobe and shortlist control."""
    import numpy as np

    with open(os.path.join(index_dir, "centroids.json")) as fh:
        cents = [(int(e["c_id"]), list(e["v"])) for e in json.load(fh)]
    with open(os.path.join(index_dir, "codebooks.json")) as fh:
        meta = json.load(fh)
    cb = np.array(meta["codebooks"])  # m × k × dsub
    codes_df = spark.read.parquet(os.path.join(index_dir, "cells"))
    return _adc_search(
        spark, codes_df, cents, cb, queries, id_col, vec_col,
        topk=topk, nprobe=nprobe, refine_with=refine_with,
        shortlist=shortlist,
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    topk: int = 5,
    nlist: int = 16,
    m: int = 16,
    k: int = 32,
    iters: int = 2,
    nprobe: int = 4,
    refine_with: DataFrame | None = None,
    shortlist: int | None = None,
    normalized: DataFrame | None = None,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """In-flight IVF-PQ top-k: the identical codebook training, cell
    assignment, ADC scoring and exact-refine math as the at-rest
    ivf_pq_build/ivf_pq_search pair, minus the disk round trip — for
    one-shot audits and ad-hoc searches where materializing the index
    buys nothing. The at-rest pair remains the 100 TB production layout
    (codes-only cells, partition-pruned probes); equivalence of the two
    paths is asserted in tests."""
    import numpy as np

    spark = queries.sparkSession
    # localCheckpoint, NOT cache: the returned DataFrame's plan keeps
    # referencing this frame, so there is no safe place to unpersist a
    # cache here — it would pin a corpus copy in executor storage for
    # the session lifetime (ivf_pq_build can unpersist because it
    # finishes its writes before returning). Checkpoint blocks are
    # reclaimed by the ContextCleaner once the RDD is unreferenced.
    cn = (
        normalized
        if normalized is not None
        else _normalized_corpus(corpus, id_col, vec_col).localCheckpoint()
    )
    cents = (
        centroids
        if centroids is not None
        else _ivf_centroids(cn, nlist, _best_cell)
    )
    cb_list = pq_train(
        corpus, id_col, vec_col, m=m, k=k, iters=iters, normalized=cn
    )
    codes_df = cn.select(
        "n_id",
        pq_encode_col("nv", cb_list).alias("codes"),
        _best_cell("nv", cents).alias("c_id"),
    )
    return _adc_search(
        spark, codes_df, cents, np.array(cb_list), queries, id_col,
        vec_col, topk=topk, nprobe=nprobe, refine_with=refine_with,
        shortlist=shortlist,
    )


def _adc_search(
    spark,
    codes_df: DataFrame,
    cents: list[tuple[int, list[float]]],
    cb,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    topk: int,
    nprobe: int,
    refine_with: DataFrame | None,
    shortlist: int | None,
) -> DataFrame:
    """Shared ADC tail for the at-rest and in-flight IVF-PQ paths:
    driver-side probe selection (queries are batch-sized by contract),
    cell-pruned candidate join, LUT-gather scoring, optional exact
    refine. ``codes_df`` is any (n_id, codes, c_id) frame — a
    partition-pruned parquet scan at rest, the live encode in-flight —
    so the two paths cannot diverge in search semantics."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    m, k, dsub = cb.shape

    q = queries.select(
        F.col(id_col).alias("q_id"), normalize(as_double(vec_col)).alias("qv")
    )
    qrows = q.collect()  # queries are batch-sized by contract
    q_ids = [r["q_id"] for r in qrows]
    qmat = np.array([list(r["qv"]) for r in qrows]).reshape(len(qrows), m, dsub)
    luts = np.einsum("qmd,mkd->qmk", qmat, cb)  # nq × m × k
    qidx = {qid: i for i, qid in enumerate(q_ids)}

    # probe selection runs driver-side in numpy: the queries are ALREADY
    # collected (batch-sized by contract) and the centroids are metadata,
    # so shipping the top-nprobe argsort through a Spark stage would buy
    # two extra jobs (probe UDF + distinct-collect) for zero distribution
    # — same matmul + stable argsort as _probe_cells, so the probed cell
    # sets are identical to the in-flight IVF path's
    cmat = np.array([v for _, v in cents]).T  # dim × nlist
    cids = np.array([cid for cid, _ in cents])
    order = np.argsort(
        -(qmat.reshape(len(qrows), m * dsub) @ cmat), axis=1, kind="stable"
    )[:, :nprobe]
    probe_rows = [
        (q_ids[i], int(cids[j]), i)
        for i in range(len(q_ids))
        for j in order[i]
    ]
    from pyspark.sql.types import IntegerType, StructField, StructType

    probes = spark.createDataFrame(
        probe_rows,
        StructType(
            [
                StructField("q_id", q.schema["q_id"].dataType),
                StructField("c_id", IntegerType()),
                StructField("q_ix", IntegerType()),
            ]
        ),
    )
    cells = sorted({c for _, c, _ in probe_rows})
    cand = (
        codes_df.filter(F.col("c_id").isin(cells))
        .join(F.broadcast(probes), "c_id")
        .filter(F.col("q_id") != F.col("n_id"))
    )

    @pandas_udf("double")
    def adc(codes: pd.Series, q_ix: pd.Series) -> pd.Series:
        import numpy as np

        C = np.vstack(codes.to_numpy())  # B × m
        qi = q_ix.to_numpy()
        sims = luts[qi[:, None], np.arange(m)[None, :], C].sum(axis=1)
        return pd.Series(sims)

    scored = cand.select(
        "q_id", "n_id", F.round(adc("codes", "q_ix"), 4).alias("sim")
    )
    if refine_with is None:
        return _rerank_topk(scored, topk)
    short = _rerank_topk(scored, shortlist or 4 * topk).select("q_id", "n_id")
    vecs = refine_with.select(
        F.col(id_col).alias("n_id"), normalize(as_double(vec_col)).alias("nv")
    )
    qv = q  # (q_id, qv) from above
    exact = (
        short.join(vecs, "n_id")
        .join(F.broadcast(qv), "q_id")
        .select(
            "q_id",
            "n_id",
            F.round(dot(F.col("qv"), F.col("nv")), 4).alias("sim"),
        )
    )
    return _rerank_topk(exact, topk)
