"""Similarity search over embedding columns (EXT E3).

Two paths:

- **brute-force top-k** — broadcast the (small) query set against the
  corpus scan; cosine via built-in higher-order functions; per-query
  top-k with a partitioned window. At 100 TB this is one corpus scan per
  query batch — the right baseline, and exactly what the oracle checks.
- **ANN via MLlib LSH** — BucketedRandomProjectionLSH over unit-normalized
  vectors (Euclidean on the unit sphere ≡ cosine ordering:
  ||u-v||² = 2-2cos). Sub-linear candidate generation for corpus-scale
  query sets; recall vs the brute-force baseline is asserted in tests.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dumpty_spark.functions.vectors import as_double, cosine, dot, normalize

# Parallelism floor for the vector frames (r11 optimization, guide §2.2/
# §4.1): per-row work here is a dim-sized dot/matmul — microscopic next
# to the fixed cost of a task and of the Arrow python-worker it may
# occupy. Flooring tiny corpora to the full core count (the old
# default) made every pandas-UDF stage a 32-worker fan-out; concurrent
# ANN stages then demanded ~3x the warm worker pool and every fresh
# fork re-imported pandas (measured: a 63-worker fork storm inside one
# audit query). 8 partitions keep the matmuls overlapped while bounding
# worker demand; on real corpora the scan is already wider than any
# floor and ensure_parallelism never coalesces down, so this is
# local-small-input behavior only.
_VEC_MIN_PARTS = 8


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    normalized: DataFrame | None = None,
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × scan corpus.

    Returns (q_id, n_id, sim) — sim rounded 4dp, deterministic tie-break
    on neighbor id.

    ``normalized``: a precomputed ``_normalized_corpus`` frame
    (n_id, nv) — callers running several methods over the same corpus
    (the recall audit) pass one cached frame so the scan+normalize pass
    isn't repeated per method."""
    from dumpty_spark.operators.util import ensure_parallelism

    # normalize each side once so the per-pair cost is a single dot pass
    q = queries.select(
        F.col(id_col).alias("q_id"), normalize(as_double(vec_col)).alias("q_vec")
    )
    c = (
        normalized.select("n_id", F.col("nv").alias("n_vec"))
        if normalized is not None
        else ensure_parallelism(
            corpus.select(
                F.col(id_col).alias("n_id"),
                normalize(as_double(vec_col)).alias("n_vec"),
            ),
            min_partitions=_VEC_MIN_PARTS,
        )
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            F.round(dot(F.col("q_vec"), F.col("n_vec")), 4).alias("sim"),
        )
    )
    return _rerank_topk(scored, k)


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bits: int = 16,
    num_hash_tables: int = 4,
    seed: int = 42,
    multiprobe: bool = True,
    normalized: DataFrame | None = None,
) -> DataFrame:
    """Approximate NN: signed-random-projection LSH candidates, then an
    exact cosine re-rank — pure DataFrame ops, no MLlib.

    Each of ``num_hash_tables`` bands hashes ``bits/num_hash_tables``
    hyperplane signs into one bucket key; the per-row signature is a
    single Arrow-batched numpy matmul (map-side, no shuffle). Queries use
    multi-probe LSH (Lv et al., VLDB '07): besides its own bucket, each
    query probes every 1-bit-flip neighbor bucket, which buys brute-force-
    level recall while the corpus side stays selectively bucketed.

    Scale story: the corpus is scanned once and never shuffled — the
    (small) query probe set is broadcast onto it; candidate pairs are the
    only data that moves, and the final top-k window partitions by query
    id. At 100 TB the signature would be precomputed at rest and the
    bucket key bucketed-by for a pure map-side probe join.
    """
    from dumpty_spark.operators.util import ensure_parallelism

    bands = num_hash_tables
    dim = (
        len(normalized.select("nv").first()[0])
        if normalized is not None
        else len(corpus.select(vec_col).first()[0])
    )

    def band_keys(vec_name: str, probe: bool):
        # shared with lsh_build/lsh_search so in-flight and at-rest
        # bucket keys are provably identical (seed+shape pinned)
        return _srp_band_keys(
            vec_col=vec_name, bits=bits, bands=bands, seed=seed, dim=dim,
            probe=probe,
        )

    c = (
        normalized.select("n_id", F.col("nv").alias("n_vec"))
        if normalized is not None
        else ensure_parallelism(
            corpus.select(
                F.col(id_col).alias("n_id"),
                normalize(as_double(vec_col)).alias("n_vec"),
            ),
            min_partitions=_VEC_MIN_PARTS,
        )
    )
    csig = c.select("n_id", "n_vec", F.explode(band_keys("n_vec", False)).alias("bkey"))
    q = queries.select(
        F.col(id_col).alias("q_id"), normalize(as_double(vec_col)).alias("q_vec")
    )
    qsig = q.select(
        "q_id", "q_vec", F.explode(band_keys("q_vec", multiprobe)).alias("bkey")
    )
    return _bucket_probe_rerank(csig, qsig, k)


def _bucket_probe_rerank(csig: DataFrame, qsig: DataFrame, k: int) -> DataFrame:
    """Shared LSH tail: broadcast the probe rows onto the bucketed corpus
    rows, dedup candidate pairs across bands, score with one dot pass on
    pre-normalized vectors, exact top-k re-rank. Used by the in-flight
    ann_lsh_topk AND the at-rest lsh_search so their results cannot
    diverge (asserted equal in tests)."""
    cand = (
        csig.join(F.broadcast(qsig), "bkey")
        .filter(F.col("q_id") != F.col("n_id"))
        .dropDuplicates(["q_id", "n_id"])
    )
    scored = cand.select(
        "q_id", "n_id", F.round(dot(F.col("q_vec"), F.col("n_vec")), 4).alias("sim")
    )
    return _rerank_topk(scored, k)


def _best_cell(vec_name: str, cents: list[tuple[int, list[float]]]):
    """Map-side cell assignment: one Arrow-batched numpy matmul against
    the broadcast centroid matrix — no crossJoin, no shuffle, no window,
    and a small plan (a 16×dim literal tree per use made cold-compile
    dominate; a matmul is also the only formulation that survives real
    1024-dim embeddings). Ties → lowest c_id."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    ids = np.array([cid for cid, _ in cents])
    mat = np.array([v for _, v in cents]).T  # dim × nlist

    @pandas_udf("int")
    def assign(col: pd.Series) -> pd.Series:
        import numpy as np

        vs = np.vstack(col.to_numpy())  # batch × dim
        return pd.Series(ids[np.argmax(vs @ mat, axis=1)])

    return assign(vec_name)


def _probe_cells(vec_name: str, cents: list[tuple[int, list[float]]], n: int):
    """Top-n cells per query vector, same matmul, ties → lowest c_id."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    ids = np.array([cid for cid, _ in cents])
    mat = np.array([v for _, v in cents]).T

    @pandas_udf("array<int>")
    def probe(col: pd.Series) -> pd.Series:
        import numpy as np

        vs = np.vstack(col.to_numpy())
        order = np.argsort(-(vs @ mat), axis=1, kind="stable")[:, :n]
        return pd.Series([ids[row].tolist() for row in order])

    return probe(vec_name)


def _ivf_centroids(
    cn: DataFrame, nlist: int, best_cell
) -> list[tuple[int, list[float]]]:
    """Deterministic spherical k-means centroids: seed with the nlist
    vectors of smallest xxhash64(id) (stable pseudo-random draw), refine
    with one distributed Lloyd step. Only nlist×dim values ever reach the
    driver — metadata, not data."""
    import numpy as np

    seeds = cn.withColumn("h", F.xxhash64("n_id")).orderBy("h").limit(nlist).collect()
    cents = [(i, list(r["nv"])) for i, r in enumerate(seeds)]
    dim = len(cents[0][1])
    mean_rows = (
        cn.select(best_cell("nv", cents).alias("c_id"), "nv")
        .select("c_id", F.posexplode("nv").alias("pos", "x"))
        .groupBy("c_id", "pos")
        .agg(F.avg("x").alias("m"))
        .collect()
    )  # ≤ nlist×dim rows (metadata-sized) — assemble vectors driver-side
    acc: dict[int, np.ndarray] = {}
    for r in mean_rows:
        acc.setdefault(int(r["c_id"]), np.zeros(dim))[r["pos"]] = r["m"]
    refined = []
    for cid, v in sorted(acc.items()):
        n = float(np.linalg.norm(v))
        refined.append((cid, (v / n).tolist() if n > 0 else v.tolist()))
    return refined


def _normalized_corpus(
    corpus: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    from dumpty_spark.operators.util import ensure_parallelism

    return ensure_parallelism(
        corpus.select(
            F.col(id_col).alias("n_id"), normalize(as_double(vec_col)).alias("nv")
        ),
        min_partitions=_VEC_MIN_PARTS,
    )


def _rerank_topk(scored: DataFrame, k: int) -> DataFrame:
    w = W.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "sim", "rnk")
    )


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    normalized: DataFrame | None = None,
    centroids: list[tuple[int, list[float]]] | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Approximate NN via an IVF (inverted-file) index: spherical
    k-means cells + probe-only-the-nearest-cells search, built in-flight.
    For the index-at-rest variant (corpus written partitioned by cell so
    probes prune partitions on disk) see ivf_build / ivf_search.

    Fully deterministic: seed centroids are the ``nlist`` corpus vectors
    with the smallest ``xxhash64(id)`` (a seeded pseudo-random draw that
    is stable across runs/partitionings), refined by one distributed
    Lloyd step (mean per cell, renormalized).

    Scale story: centroids are metadata-sized (nlist x dim) and always
    BROADCAST; cell assignment is one corpus scan with zero corpus
    shuffle — the probe set (queries × nprobe rows) broadcasts onto it.
    At 100 TB the corpus would be written partitioned by ``c_id`` so a
    query batch scans only nprobe/nlist of the data — that layout is
    ivf_build/ivf_search. Query fan-out is nprobe cells, then an exact
    cosine re-rank on the (small) candidate set.
    """
    cn = (
        normalized
        if normalized is not None
        else _normalized_corpus(corpus, id_col, vec_col).cache()
    )
    # centroids are a pure function of (cn, nlist); callers training an
    # IVF-PQ index over the same corpus pass the shared list so k-means
    # runs once, not once per method (they'd be bit-identical anyway)
    refined = (
        centroids
        if centroids is not None
        else _ivf_centroids(cn, nlist, _best_cell)
    )

    # cell assignment stays map-side; the corpus is never shuffled — the
    # (queries × nprobe)-row probe set broadcasts onto it. The at-rest
    # co-location by c_id lives in ivf_build/ivf_search. ``assigned``
    # lets a caller searching the same corpus at several operating
    # points (the nprobe curve) materialize the assignment pass once —
    # it is a pure function of (cn, centroids), so sharing it cannot
    # change any result.
    if assigned is None:
        assigned = cn.select("n_id", "nv", _best_cell("nv", refined).alias("c_id"))

    # probe selection is map-side too: top-nprobe cells per query
    q = queries.select(
        F.col(id_col).alias("q_id"), normalize(as_double(vec_col)).alias("qv")
    )
    probes = q.select(
        "q_id", "qv", F.explode(_probe_cells("qv", refined, nprobe)).alias("c_id")
    )
    scored = (
        assigned.join(F.broadcast(probes), "c_id")
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id", "n_id", F.round(dot(F.col("qv"), F.col("nv")), 4).alias("sim")
        )
    )
    return _rerank_topk(scored, k)


def ivf_build(
    corpus: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> list[tuple[int, list[float]]]:
    """Materialize the IVF index AT REST: the normalized corpus written
    ``partitionBy(c_id)`` (hive-layout parquet, one directory per cell)
    plus a JSON centroid sidecar. This is the 100 TB shape — build once,
    then every search scans only the probed cells' files via partition
    pruning (see ivf_search), the disk analog of the reference's persisted
    introspection plan (src/dumpty/pipeline.py:284-300 caches per-table
    plans; here the 'plan' is the cluster layout itself)."""
    import json
    import os

    cn = _normalized_corpus(corpus, id_col, vec_col).cache()
    # ``centroids`` pins a pre-existing codebook instead of re-learning
    # one — the batch twin of ivf_append (same cells ⇒ byte-comparable
    # index state, which is what the incremental-equals-rebuild test
    # asserts)
    cents = centroids if centroids is not None else _ivf_centroids(cn, nlist, _best_cell)
    assigned = cn.select("n_id", "nv", _best_cell("nv", cents).alias("c_id"))
    # one file per cell, not one per (task, cell) sliver
    assigned.repartition("c_id").write.mode("overwrite").partitionBy("c_id").parquet(
        os.path.join(index_dir, "cells")
    )
    with open(os.path.join(index_dir, "centroids.json"), "w") as fh:
        json.dump([{"c_id": c, "v": v} for c, v in cents], fh)
    cn.unpersist()
    return cents


def ivf_search(
    spark,
    index_dir: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
    audit: dict | None = None,
) -> DataFrame:
    """Search a built IVF index: centroids load driver-side (metadata),
    each query picks its nprobe cells, and the scan filter
    ``c_id IN (probed cells)`` PRUNES PARTITIONS — only nprobe/nlist of
    the corpus files are read (assert-able in the physical plan's
    PartitionFilters). Re-rank is exact cosine over the candidates.
    ``audit``, when passed, receives {"probed": [c_id, ...]} so callers
    (q_ann_index_prune_audit) can measure the file-level pruning of the
    identical scan without duplicating the probe logic."""
    import json
    import os

    with open(os.path.join(index_dir, "centroids.json")) as fh:
        cents = [(int(e["c_id"]), list(e["v"])) for e in json.load(fh)]

    q = queries.select(
        F.col(id_col).alias("q_id"), normalize(as_double(vec_col)).alias("qv")
    )
    probes = q.select(
        "q_id", "qv", F.explode(_probe_cells("qv", cents, nprobe)).alias("c_id")
    )
    # the probed-cell set is tiny (≤ queries × nprobe distinct values):
    # collect it and push it into the scan as a partition filter
    cells = [r["c_id"] for r in probes.select("c_id").distinct().collect()]
    if audit is not None:
        audit["probed"] = cells
    cn = spark.read.parquet(os.path.join(index_dir, "cells")).filter(
        F.col("c_id").isin(cells)
    )
    scored = (
        cn.join(F.broadcast(probes), "c_id")
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id", "n_id", F.round(dot(F.col("qv"), F.col("nv")), 4).alias("sim")
        )
    )
    return _rerank_topk(scored, k)


def lsh_build(
    corpus: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 16,
    num_hash_tables: int = 4,
    seed: int = 42,
) -> None:
    """Materialize the SRP-LSH index AT REST: every (vector, bucket-key)
    row written ``partitionBy(bkey)`` plus a JSON sidecar pinning the
    hyperplane seed/shape. The companion of ivf_build for the
    hash-bucket family: build once, then a probe batch reads only its
    buckets' files via partition pruning (lsh_search). Storage is
    ``num_hash_tables`` copies of the corpus (one per band) — the
    classic LSH space/recall trade."""
    import json
    import os

    from dumpty_spark.operators.util import ensure_parallelism

    bands = num_hash_tables
    first = corpus.select(vec_col).first()
    if first is None:
        raise ValueError("lsh_build: corpus is empty — nothing to index")
    dim = len(first[0])
    c = ensure_parallelism(
        corpus.select(
            F.col(id_col).alias("n_id"), normalize(as_double(vec_col)).alias("n_vec")
        ),
        min_partitions=_VEC_MIN_PARTS,
    )
    keys = _srp_band_keys(vec_col="n_vec", bits=bits, bands=bands, seed=seed,
                          dim=dim, probe=False)
    csig = c.select("n_id", "n_vec", F.explode(keys).alias("bkey"))
    # one file per bucket, not one per (task, bucket) sliver
    csig.repartition("bkey").write.mode("overwrite").partitionBy("bkey").parquet(
        os.path.join(index_dir, "buckets")
    )
    with open(os.path.join(index_dir, "meta.json"), "w") as fh:
        json.dump({"bits": bits, "bands": bands, "seed": seed, "dim": dim}, fh)


def ivf_append(
    spark,
    index_dir: str,
    delta: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    upsert: bool = True,
) -> dict:
    """Incremental IVF maintenance (VERDICT r2 task 8): fold a (small)
    delta of new/changed vectors into an existing at-rest index WITHOUT
    rebuilding — the E14 incremental-store pattern applied to the vector
    layout. At 100 TB a nightly embedding trickle must cost O(delta),
    not O(corpus).

    The codebook is FROZEN: delta vectors are assigned to the existing
    sidecar centroids, so the resulting layout is identical to batch-
    building base+delta with those same centroids (asserted in tests).
    Replaced keys are removed via the keyed-delete path (only hit files
    rewritten — partition dirs and pruning survive), then the assigned
    delta lands as appended files inside its cells' directories; the
    accumulating small files are compact_parquet's job, like every other
    incremental store here.

    Freezing the codebook trades centroid freshness for O(delta) cost;
    after heavy drift, rebuild. Returns {"rows_appended",
    "rows_replaced", "cells_touched"}.
    """
    import json
    import os

    from dumpty_spark.sinks.writers import delete_keys

    with open(os.path.join(index_dir, "centroids.json")) as fh:
        cents = [(int(e["c_id"]), list(e["v"])) for e in json.load(fh)]
    cells_dir = os.path.join(index_dir, "cells")

    dn = _normalized_corpus(delta, id_col, vec_col).localCheckpoint()
    rows_replaced = 0
    if upsert:
        ids = [r["n_id"] for r in dn.select("n_id").distinct().collect()]
        rows_replaced = delete_keys(spark, cells_dir, "n_id", ids)["rows_deleted"]
    assigned = dn.select("n_id", "nv", _best_cell("nv", cents).alias("c_id"))
    n_cells = assigned.select("c_id").distinct().count()
    n_rows = assigned.count()
    # a delta is trickle-sized: one file per touched cell, not per task
    assigned.repartition("c_id").write.mode("append").partitionBy("c_id").parquet(
        cells_dir
    )
    return {
        "rows_appended": n_rows,
        "rows_replaced": rows_replaced,
        "cells_touched": n_cells,
    }


def lsh_append(
    spark,
    index_dir: str,
    delta: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    upsert: bool = True,
) -> dict:
    """Incremental SRP-LSH maintenance: hash the delta with the sidecar-
    pinned hyperplanes (seed+shape frozen ⇒ bucket keys provably match
    the at-rest index), keyed-delete replaced ids, append the new
    (vector, bucket) rows into their bucket directories. Because the
    hyperplanes are deterministic, append-then-search is EXACTLY
    rebuild-then-search — no codebook caveat like IVF's."""
    import json
    import os

    from dumpty_spark.sinks.writers import delete_keys

    with open(os.path.join(index_dir, "meta.json")) as fh:
        meta = json.load(fh)
    buckets_dir = os.path.join(index_dir, "buckets")

    dn = delta.select(
        F.col(id_col).alias("n_id"), normalize(as_double(vec_col)).alias("n_vec")
    ).localCheckpoint()
    rows_replaced = 0
    if upsert:
        ids = [r["n_id"] for r in dn.select("n_id").distinct().collect()]
        rows_replaced = delete_keys(spark, buckets_dir, "n_id", ids)["rows_deleted"]
    keys = _srp_band_keys(
        vec_col="n_vec", bits=meta["bits"], bands=meta["bands"],
        seed=meta["seed"], dim=meta["dim"], probe=False,
    )
    sig = dn.select("n_id", "n_vec", F.explode(keys).alias("bkey"))
    n_rows = sig.count()
    sig.repartition("bkey").write.mode("append").partitionBy("bkey").parquet(
        buckets_dir
    )
    return {"rows_appended": n_rows, "rows_replaced": rows_replaced}


def lsh_search(
    spark,
    index_dir: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    multiprobe: bool = True,
    audit: dict | None = None,
) -> DataFrame:
    """Search a built SRP-LSH index: recompute the query-side bucket
    keys from the sidecar-pinned hyperplanes (multi-probe: own bucket +
    every 1-bit flip), collect the tiny probed-key set, and push
    ``bkey IN (...)`` into the scan as a PartitionFilter — only the
    probed buckets' files are read. Exact cosine re-rank on candidates.
    ``audit``, when passed, receives {"probed": [bkey, ...]} (see
    ivf_search)."""
    import json
    import os

    with open(os.path.join(index_dir, "meta.json")) as fh:
        meta = json.load(fh)

    q = queries.select(
        F.col(id_col).alias("q_id"), normalize(as_double(vec_col)).alias("q_vec")
    )
    qkeys = _srp_band_keys(
        vec_col="q_vec", bits=meta["bits"], bands=meta["bands"],
        seed=meta["seed"], dim=meta["dim"], probe=multiprobe,
    )
    qsig = q.select("q_id", "q_vec", F.explode(qkeys).alias("bkey"))
    probed = [r["bkey"] for r in qsig.select("bkey").distinct().collect()]
    if audit is not None:
        audit["probed"] = probed
    buckets = spark.read.parquet(os.path.join(index_dir, "buckets")).filter(
        F.col("bkey").isin(probed)
    )
    return _bucket_probe_rerank(buckets, qsig, k)


def _srp_band_keys(vec_col: str, bits: int, bands: int, seed: int, dim: int,
                   probe: bool):
    """Banded SRP bucket keys (band_idx << rpb | band_sig) as an
    array<long> Column — one Arrow-batched matmul; with ``probe`` also
    every 1-bit flip of each band signature (Lv et al. '07). Shared by
    the in-flight ann_lsh_topk and the at-rest lsh_build/lsh_search (the
    seed+shape pin makes both sides hash identically)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    rpb = bits // bands
    rng = np.random.default_rng(seed)
    planes = rng.choice((-1.0, 1.0), size=(bits, dim))
    P = planes.T
    w = (1 << np.arange(rpb)).astype(np.int64)

    @pandas_udf("array<long>")
    def keys(col: pd.Series) -> pd.Series:
        import numpy as np

        vs = np.vstack(col.to_numpy())
        B = (vs @ P > 0).astype(np.int64)
        sig = np.stack(
            [B[:, b * rpb : (b + 1) * rpb] @ w for b in range(bands)], axis=1
        )
        base = sig | (np.arange(bands, dtype=np.int64) << rpb)
        if not probe:
            return pd.Series(list(base))
        flips = [base ^ (1 << f) for f in range(rpb)]
        return pd.Series(list(np.concatenate([base] + flips, axis=1)))

    return keys(vec_col)
