"""IVF-PQ (operators/pq.py, EXT E3h): codes-only index, ADC scoring.

Audit contract mirrors the other approximate-ANN surfaces (E3b/E3c):
recall floor vs the exact brute-force baseline, plus the claims that
make PQ worth having — the index stores no full vectors, compresses the
corpus, and the whole thing is deterministic."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from dumpty_spark.operators import pq as PQ
from dumpty_spark.operators.similarity import brute_force_topk


@pytest.fixture(scope="module")
def emb(spark, sf_t2):
    from dumpty_spark.sources import load_table

    return load_table(spark, sf_t2, "embeddings").localCheckpoint()


def test_pq_train_shapes_and_determinism(spark, emb):
    cb1 = PQ.pq_train(emb, m=8, k=16, iters=2)
    cb2 = PQ.pq_train(emb, m=8, k=16, iters=2)
    assert cb1 == cb2  # hash-seeded draw + fixed Lloyd step count
    dim = len(emb.select("embedding").first()[0])
    assert len(cb1) == 8 and len(cb1[0]) == 16 and len(cb1[0][0]) == dim // 8


def test_pq_codes_reconstruct_better_than_random(spark, emb):
    """Encoding must pick the L2-nearest codeword: reconstruction error
    with argmin codes beats codeword 0 for essentially every vector."""
    import numpy as np

    cb = np.array(PQ.pq_train(emb, m=8, k=16, iters=2))
    rows = (
        emb.limit(64)
        .select(
            PQ.pq_encode_col("embedding", cb.tolist()).alias("codes"),
            "embedding",
        )
        .collect()
    )
    m, k, dsub = cb.shape
    better = 0
    for r in rows:
        v = np.array(r["embedding"]).reshape(m, dsub)
        rec = cb[np.arange(m), np.array(r["codes"])]
        base = cb[:, 0, :]
        if ((v - rec) ** 2).sum() <= ((v - base) ** 2).sum():
            better += 1
    assert better >= len(rows) - 1


def test_ivf_pq_recall_floor_and_compression(spark, emb, tmp_path):
    idx = str(tmp_path / "pq")
    stats = PQ.ivf_pq_build(emb, idx, nlist=16, m=16, k=32)

    # codes-only at rest: no vector column in the stored schema, and the
    # index is much smaller than the float corpus it indexes
    stored = spark.read.parquet(os.path.join(idx, "cells"))
    assert set(stored.columns) == {"n_id", "codes", "c_id"}
    # apples-to-apples compression: the SAME rows in the SAME hive layout
    # but carrying the full float vectors must be strictly larger (at toy
    # scale parquet per-file overhead dominates both sides, so the honest
    # comparison is layout-vs-layout, not bytes-vs-theoretical-floats)
    from dumpty_spark.operators.similarity import ivf_build

    full_dir = str(tmp_path / "full")
    ivf_build(emb, full_dir, nlist=16)
    full_bytes = sum(
        os.path.getsize(p)
        for p in glob.glob(
            os.path.join(full_dir, "cells", "**", "part-*"), recursive=True
        )
        if os.path.isfile(p)
    )
    assert stats["index_bytes"] < full_bytes

    queries = emb.filter(F.col("vec_id") < 20)
    got = PQ.ivf_pq_search(
        spark, idx, queries, topk=5, nprobe=8, refine_with=emb, shortlist=40
    )
    exact = brute_force_topk(emb, queries, k=5)
    g = {(r["q_id"], r["n_id"]) for r in got.collect()}
    e = {(r["q_id"], r["n_id"]) for r in exact.collect()}
    recall = len(g & e) / len(e)
    assert recall >= 0.7, f"IVF-PQ recall {recall:.2f} below floor"
    # every query answered, exactly k rows each
    counts = {r["q_id"] for r in got.collect()}
    assert len(counts) == queries.count()


def test_ivf_pq_search_is_deterministic(spark, emb, tmp_path):
    idx = str(tmp_path / "pq2")
    PQ.ivf_pq_build(emb, idx, nlist=8, m=16, k=32, iters=2)
    queries = emb.filter(F.col("vec_id") < 5)
    a = sorted(map(tuple, PQ.ivf_pq_search(spark, idx, queries).collect()))
    b = sorted(map(tuple, PQ.ivf_pq_search(spark, idx, queries).collect()))
    assert a == b


def test_inflight_equals_at_rest_search(spark, emb, tmp_path):
    """The in-flight ivf_pq_topk (used by the recall audit) and the
    at-rest build/search pair must return the IDENTICAL top-k — same
    codebook training, cell assignment, probe selection, ADC scoring
    and exact refine, differing only in where the codes live."""
    queries = emb.filter(F.col("vec_id") < 8)
    kwargs = dict(nlist=8, m=8, k=16, iters=2)
    d = str(tmp_path / "ix")
    PQ.ivf_pq_build(emb, d, **kwargs)
    at_rest = sorted(
        (r["q_id"], r["n_id"], r["sim"], r["rnk"])
        for r in PQ.ivf_pq_search(
            spark, d, queries, topk=5, nprobe=4, refine_with=emb,
            shortlist=40,
        ).collect()
    )
    in_flight = sorted(
        (r["q_id"], r["n_id"], r["sim"], r["rnk"])
        for r in PQ.ivf_pq_topk(
            emb, queries, topk=5, nprobe=4, refine_with=emb,
            shortlist=40, **kwargs,
        ).collect()
    )
    assert in_flight == at_rest
    assert at_rest  # non-vacuous
