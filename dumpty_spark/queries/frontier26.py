"""Round-8 engine extensions, first batch (EXT E189): the at-rest ANN
index pruning contract promoted from tests-only to driver-oracle-proven
(VERDICT r7 task 3) — the E129 z-order pattern applied to the IVF and
SRP-LSH indexes: run the REAL at-rest search, then hash booleans the
oracle states as constants (result ≡ in-flight, files strictly pruned).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.session import scratch_cleanup, warehouse_scratch
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E189: ANN index-at-rest prune audit (E3b'/E3c'/E3g promoted)
# ---------------------------------------------------------------------------
# ivf_build / lsh_build materialize the index hive-partitioned by cell /
# bucket key; the whole point of the layout is that a probe batch reads
# ONLY its probed partitions' files. The hashed surface per method:
#   * at_rest_eq_inflight — the at-rest search returns the EXACT
#     (q_id, n_id, rnk, sim) set of the in-flight search with the same
#     shared centroids / pinned hyperplane seed (sims 4dp both paths,
#     parquet round-trips doubles bit-exactly), and
#   * files_pruned — distinct input_file_name() of the probe-filtered
#     scan is a STRICT subset of the index's files (measured 4/16 cell
#     files for IVF, 34/64 bucket files for LSH at sf0.01).
# A 2-query probe batch keeps the probed-partition set selective — the
# audit measures the I/O SHAPE (the E129 slicing rationale); recall and
# full-batch behavior are q_ann_recall_check / q_ann_*_topk's contracts.

_PRUNE_ORACLE = """
SELECT 'ivf' AS method, TRUE AS at_rest_eq_inflight, TRUE AS files_pruned,
       10::BIGINT AS n_rows
UNION ALL
SELECT 'lsh', TRUE, TRUE, 10::BIGINT
ORDER BY method
"""


def _result_key(rows) -> set:
    return {(r["q_id"], r["n_id"], r["rnk"], r["sim"]) for r in rows}


def _hit_vs_total(spark, data_dir: str, key_col: str, probed: list) -> tuple:
    total = len(
        [p for p in glob.glob(os.path.join(data_dir, "*", "part-*"))
         if os.path.isfile(p)]
    )
    hit = (
        spark.read.parquet(data_dir)
        .filter(F.col(key_col).isin(probed))
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    return hit, total


@register(
    "q_ann_index_prune_audit",
    oracle=_PRUNE_ORACLE,
    doc="at-rest ANN index pruning audit (E189; E3b'/E3c'/E3g promoted "
    "from tests-only): build the IVF index (shared Lloyd centroids, "
    "partitionBy cell) and the SRP-LSH index (pinned seed, partitionBy "
    "bucket key) at rest, search a 2-query probe batch, and hash (a) "
    "exact (q_id, n_id, rnk, sim) equality with the in-flight searches "
    "and (b) strict file-subset pruning of each probe-filtered scan — "
    "the disk layout IS the query plan at 100 TB, so the audit proves "
    "the layout answers exactly and reads only probed partitions",
)
def q_ann_index_prune_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators import similarity as S
    from dumpty_spark.queries.vector import _shared_ann_artifacts

    from dumpty_spark.operators.util import run_overlapped

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 2)
    cn, cents = _shared_ann_artifacts(spark, sf_dir, nlist=16)
    scratch = warehouse_scratch(spark, "annprune")

    # the IVF and LSH halves are independent store-build+search
    # lineages dominated by fixed per-job overhead at audit scale —
    # run them from concurrent driver threads so the Spark jobs
    # overlap on the executor pool (the q_ann_recall_check
    # discipline); results are collected inside each thread and are
    # batch-sized by contract

    def _ivf_half():
        ivf_dir = os.path.join(scratch, "ivf")
        S.ivf_build(emb, ivf_dir, nlist=16, centroids=cents)
        a: dict = {}
        at_rest = _result_key(
            S.ivf_search(spark, ivf_dir, queries, k=5, nprobe=2, audit=a)
            .collect()
        )
        inflight = _result_key(
            S.ann_ivf_topk(
                emb, queries, k=5, nlist=16, nprobe=2, normalized=cn,
                centroids=cents,
            ).collect()
        )
        hit, total = _hit_vs_total(
            spark, os.path.join(ivf_dir, "cells"), "c_id", a["probed"]
        )
        return (
            "ivf",
            bool(at_rest == inflight),
            bool(0 < hit < total),
            len(at_rest),
        )

    def _lsh_half():
        lsh_dir = os.path.join(scratch, "lsh")
        S.lsh_build(emb, lsh_dir, bits=16, num_hash_tables=4)
        b: dict = {}
        at_rest2 = _result_key(
            S.lsh_search(spark, lsh_dir, queries, k=5, audit=b).collect()
        )
        inflight2 = _result_key(
            S.ann_lsh_topk(
                emb, queries, k=5, bits=16, num_hash_tables=4, normalized=cn
            ).collect()
        )
        hit2, total2 = _hit_vs_total(
            spark, os.path.join(lsh_dir, "buckets"), "bkey", b["probed"]
        )
        return (
            "lsh",
            bool(at_rest2 == inflight2),
            bool(0 < hit2 < total2),
            len(at_rest2),
        )

    try:
        ivf_row, lsh_row = run_overlapped(spark, [_ivf_half, _lsh_half])
    finally:
        scratch_cleanup(spark, scratch)
    return spark.createDataFrame(
        [ivf_row, lsh_row],
        "method string, at_rest_eq_inflight boolean, files_pruned boolean, "
        "n_rows long",
    ).orderBy("method")


# ---------------------------------------------------------------------------
# E190: ANN-composed retrieval scale path, proven (VERDICT r7 task 2)
# ---------------------------------------------------------------------------
# q_mutual_nn_margin and q_mmr_rerank document that "at corpus scale the
# identical composition runs over the ANN indexes". This audit RUNS that
# composition as real code and hashes its agreement with the brute-force
# slice (E37 recall-audit pattern):
#   * mutual-NN: per-side candidates from ann_lsh_topk (pinned seed),
#     fed through the SAME mutual_nn_margin_from_topk composition the
#     brute-force query uses — pair recall/precision >= 0.85 vs the
#     brute-force pair set (measured 0.92/0.95 at sf0.01) and max
#     |margin delta| <= 0.1 on shared pairs (ANN top-4 denominators
#     vs exact top-4; measured 0.064),
#   * MMR: candidate pool from ann_ivf_topk (nprobe=12), fed through
#     the SAME mmr_rerank_pool greedy tail — pool recall >= 0.75 vs the
#     brute-force top-20 (measured 0.8) and the greedy PICK SEQUENCE
#     identical (pool differences live in the tail candidates that
#     never win a round; measured equal at sf0.001 and sf0.01).
# Everything is deterministic (pinned LSH seed, shared Lloyd centroids,
# 4dp sims), so the booleans are engine-stable constants.

_COMPOSED_ORACLE = """
SELECT 'mmr' AS path, 'picks_equal_bruteforce' AS metric, TRUE AS ok
UNION ALL SELECT 'mmr', 'pool_recall_ge_075', TRUE
UNION ALL SELECT 'mutual_nn', 'margin_delta_le_01', TRUE
UNION ALL SELECT 'mutual_nn', 'pair_precision_ge_085', TRUE
UNION ALL SELECT 'mutual_nn', 'pair_recall_ge_085', TRUE
ORDER BY path, metric
"""


@register(
    "q_ann_composed_retrieval",
    oracle=_COMPOSED_ORACLE,
    doc="ANN-composed retrieval audit (E190): the corpus-scale path the "
    "E178/E179 docstrings promise, run as real code — mutual-NN margin "
    "mining composed over ann_lsh_topk candidates through the identical "
    "mutual_nn_margin_from_topk plan (pair recall/precision >= 0.85 vs "
    "brute force, margin delta <= 0.1), and MMR re-ranking fed an "
    "ann_ivf_topk pool through the identical mmr_rerank_pool tail "
    "(pool recall >= 0.75, greedy pick sequence equal) — hashed as "
    "engine-stable booleans",
)
def q_ann_composed_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators import similarity as S
    from dumpty_spark.queries import frontier18 as f18
    from dumpty_spark.queries import frontier19 as f19
    from dumpty_spark.queries.vector import _shared_ann_artifacts

    from dumpty_spark.operators.util import run_overlapped

    emb = load_table(spark, sf_dir, "embeddings")
    # resolve the shared artifacts BEFORE spawning threads so the
    # session caches build once
    cn, cents = _shared_ann_artifacts(spark, sf_dir, nlist=16)

    # the composed mutual-NN, the brute-force mutual-NN and the MMR
    # block are independent lineages dominated by per-job overhead at
    # audit scale — concurrent driver threads overlap their jobs on
    # the executor pool (the q_ann_recall_check discipline); every
    # collected frame is pairs-/pool-sized by contract

    def _composed():
        sliced = emb.filter(F.col("vec_id") < f18._MNN_MAX_ID)
        a_side = sliced.filter(F.col("vec_id") % 2 == 0)
        b_side = sliced.filter(F.col("vec_id") % 2 == 1)
        ab = S.ann_lsh_topk(b_side, a_side, k=f18._MNN_TOPK)
        ba = S.ann_lsh_topk(a_side, b_side, k=f18._MNN_TOPK)
        return {
            (r["a_id"], r["b_id"]): r["margin"]
            for r in f18.mutual_nn_margin_from_topk(ab, ba).collect()
        }

    def _brute():
        return {
            (r["a_id"], r["b_id"]): r["margin"]
            for r in f18.q_mutual_nn_margin(spark, sf_dir).collect()
        }

    def _mmr():
        q0 = emb.filter(F.col("vec_id") == 0)
        pool = S.ann_ivf_topk(
            emb, q0, k=f19._MMR_POOL, nlist=16, nprobe=12, normalized=cn,
            centroids=cents,
        )
        rel = (
            cn.join(
                F.broadcast(
                    pool.select(
                        F.col("n_id").alias("id"), F.col("sim").alias("rel")
                    )
                ),
                cn["n_id"] == F.col("id"),
            )
            .select("id", F.col("nv").alias("v"), "rel")
            .localCheckpoint()
        )
        ann_picks = [
            r["doc_id"] for r in f19.mmr_rerank_pool(spark, rel).collect()
        ]
        bf_picks = [
            r["doc_id"] for r in f19.q_mmr_rerank(spark, sf_dir).collect()
        ]
        bf_pool = {r["n_id"] for r in pool.collect()}  # ANN pool ids
        exact_pool = {
            r["n_id"]
            for r in S.brute_force_topk(
                emb, q0, k=f19._MMR_POOL, normalized=cn
            ).collect()
        }
        pool_recall = len(bf_pool & exact_pool) / max(1, len(exact_pool))
        return ann_picks, bf_picks, pool_recall

    composed, brute, (ann_picks, bf_picks, pool_recall) = run_overlapped(
        spark, [_composed, _brute, _mmr]
    )

    shared = set(composed) & set(brute)
    recall = len(shared) / max(1, len(brute))
    precision = len(shared) / max(1, len(composed))
    max_delta = max(
        (abs(composed[p] - brute[p]) for p in shared), default=1.0
    )

    rows = [
        ("mmr", "picks_equal_bruteforce", bool(ann_picks == bf_picks)),
        ("mmr", "pool_recall_ge_075", bool(pool_recall >= 0.75)),
        ("mutual_nn", "margin_delta_le_01", bool(max_delta <= 0.1)),
        ("mutual_nn", "pair_precision_ge_085", bool(precision >= 0.85)),
        ("mutual_nn", "pair_recall_ge_085", bool(recall >= 0.85)),
    ]
    return spark.createDataFrame(
        rows, "path string, metric string, ok boolean"
    ).orderBy("path", "metric")
