"""Round-8 batch 1: at-rest ANN prune audit (E189) and the ANN-composed
retrieval scale path (E190)."""

from pyspark.sql import functions as F

from dumpty_spark.queries import REGISTRY


def test_ann_index_prune_audit_booleans(spark, sf_smoke):
    rows = {
        r["method"]: r
        for r in REGISTRY["q_ann_index_prune_audit"].fn(spark, sf_smoke).collect()
    }
    assert set(rows) == {"ivf", "lsh"}
    for method, r in rows.items():
        assert r["at_rest_eq_inflight"], method
        assert r["files_pruned"], method
        assert r["n_rows"] == 10, method


def test_ann_composed_retrieval_booleans(spark, sf_smoke):
    rows = REGISTRY["q_ann_composed_retrieval"].fn(spark, sf_smoke).collect()
    assert len(rows) == 5
    assert all(r["ok"] for r in rows), [
        (r["path"], r["metric"]) for r in rows if not r["ok"]
    ]


def test_mmr_ann_pool_picks_equal_bruteforce(spark, sf_smoke):
    """Brute-force ≡ ANN-backed on the demo slice (VERDICT r7 task 2):
    the greedy MMR tail fed an IVF nprobe=12 pool picks the IDENTICAL
    sequence the brute-force pool produces — pool differences live in
    tail candidates that never win a round."""
    from dumpty_spark.operators import similarity as S
    from dumpty_spark.queries import frontier19 as f19
    from dumpty_spark.queries.vector import _shared_ann_artifacts

    from dumpty_spark.sources import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    cn, cents = _shared_ann_artifacts(spark, sf_smoke, nlist=16)
    pool = S.ann_ivf_topk(
        emb, emb.filter(F.col("vec_id") == 0), k=f19._MMR_POOL, nlist=16,
        nprobe=12, normalized=cn, centroids=cents,
    )
    rel = (
        cn.join(
            F.broadcast(
                pool.select(F.col("n_id").alias("id"), F.col("sim").alias("rel"))
            ),
            cn["n_id"] == F.col("id"),
        )
        .select("id", F.col("nv").alias("v"), "rel")
        .localCheckpoint()
    )
    ann = [
        (r["round"], r["doc_id"])
        for r in f19.mmr_rerank_pool(spark, rel).collect()
    ]
    bf = [
        (r["round"], r["doc_id"])
        for r in f19.q_mmr_rerank(spark, sf_smoke).collect()
    ]
    assert ann == bf


def test_mutual_nn_ann_composition_recall(spark, sf_smoke):
    """The LSH-composed mutual-NN pair set recovers >= 85% of the
    brute-force pairs on the demo slice through the IDENTICAL
    downstream composition (mutual_nn_margin_from_topk)."""
    from dumpty_spark.operators import similarity as S
    from dumpty_spark.queries import frontier18 as f18
    from dumpty_spark.sources import load_table

    emb = load_table(spark, sf_smoke, "embeddings").filter(
        F.col("vec_id") < f18._MNN_MAX_ID
    )
    a_side = emb.filter(F.col("vec_id") % 2 == 0)
    b_side = emb.filter(F.col("vec_id") % 2 == 1)
    composed = {
        (r["a_id"], r["b_id"])
        for r in f18.mutual_nn_margin_from_topk(
            S.ann_lsh_topk(b_side, a_side, k=f18._MNN_TOPK),
            S.ann_lsh_topk(a_side, b_side, k=f18._MNN_TOPK),
        ).collect()
    }
    brute = {
        (r["a_id"], r["b_id"])
        for r in f18.q_mutual_nn_margin(spark, sf_smoke).collect()
    }
    assert len(composed & brute) / len(brute) >= 0.85
    assert len(composed & brute) / len(composed) >= 0.85
