"""Round-11 optimization guards for the ANN operator internals.

The r11 optimization round gave ``ann_ivf_topk`` an optional
``assigned=`` parameter (a pre-materialized cell-assignment frame shared
across several searches of the same corpus — the nprobe curve) and
floored the vector frames at ``_VEC_MIN_PARTS`` partitions instead of
the full core count. Neither may change any result: the assignment is a
pure function of (corpus, centroids), and every downstream operator is
content-based (4dp-rounded sims, id tie-breaks). These tests pin both.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _rows(df):
    return sorted(
        tuple(r) for r in df.select("q_id", "n_id", "sim", "rnk").collect()
    )


def test_ann_ivf_topk_shared_assignment_identical(spark, sf_smoke):
    """ann_ivf_topk(assigned=precomputed) ≡ ann_ivf_topk() — the shared
    assignment pass cannot change the result set."""
    from dumpty_spark.operators import similarity as S
    from dumpty_spark.sources.parquet import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    cn = S._normalized_corpus(emb, "vec_id", "embedding").localCheckpoint()
    cents = S._ivf_centroids(cn, 8, S._best_cell)

    base = S.ann_ivf_topk(
        emb, queries, k=5, nlist=8, nprobe=3, normalized=cn, centroids=cents
    )
    assigned = cn.select(
        "n_id", "nv", S._best_cell("nv", cents).alias("c_id")
    ).localCheckpoint()
    shared = S.ann_ivf_topk(
        emb, queries, k=5, nlist=8, nprobe=3, normalized=cn, centroids=cents,
        assigned=assigned,
    )
    assert _rows(base) == _rows(shared)


def test_vector_partition_floor_result_invariant(spark, sf_smoke):
    """brute_force_topk over an 8-partition corpus equals a 32-partition
    run of the same corpus — partitioning is layout, not semantics."""
    from dumpty_spark.operators import similarity as S
    from dumpty_spark.sources.parquet import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    narrow = S._normalized_corpus(emb, "vec_id", "embedding")
    assert narrow.rdd.getNumPartitions() >= S._VEC_MIN_PARTS
    wide = narrow.repartition(32)
    a = S.brute_force_topk(emb, queries, k=5, normalized=narrow)
    b = S.brute_force_topk(emb, queries, k=5, normalized=wide)
    assert _rows(a) == _rows(b)
