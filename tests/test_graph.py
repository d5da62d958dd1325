"""Graph + round-2 scale operators: PageRank vs numpy power iteration,
bloom prefilter exactness, snapshot diff semantics."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _numpy_pagerank(edges, damping, n_iter):
    """Textbook power iteration with uniform dangling redistribution —
    the independent oracle for operators/graph.py."""
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for a, _ in edges:
        out_deg[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dangling = r[out_deg == 0].sum()
        contrib = np.zeros(n)
        for a, b in edges:
            contrib[idx[b]] += r[idx[a]] / out_deg[idx[a]]
        r = (1.0 - damping) / n + damping * (contrib + dangling / n)
    return {nodes[i]: r[i] for i in range(n)}


@pytest.mark.parametrize("driver_max_edges", [5_000_000, 0])
def test_pagerank_matches_numpy(spark, driver_max_edges):
    """Directed graph with a dangling node (4 has no out-edges) and a
    hub: ranks match the textbook iteration to 1e-12 and sum to 1 — in
    BOTH regimes (driver numpy path, and the distributed Pregel loop
    forced via driver_max_edges=0)."""
    from dumpty_spark.operators.graph import pagerank

    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (3, 4), (5, 3), (2, 4)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["id"]: r["rank"]
        for r in pagerank(
            df, n_iter=8, driver_max_edges=driver_max_edges
        ).collect()
    }
    want = _numpy_pagerank(edges, 0.85, 8)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_regimes_agree(spark):
    """Two-regime contract: the driver numpy path and the distributed
    loop produce identical ranks (1e-12) on a 60-node random-ish directed
    graph with dangling nodes and string keys staying distributed-safe."""
    from dumpty_spark.operators.graph import pagerank

    edges = [((a * 37 + 11) % 60, (a * 53 + 29) % 61) for a in range(400)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    drv = {r["id"]: r["rank"] for r in pagerank(df, n_iter=6).collect()}
    dist = {
        r["id"]: r["rank"]
        for r in pagerank(df, n_iter=6, driver_max_edges=0).collect()
    }
    assert set(drv) == set(dist)
    for k in drv:
        assert drv[k] == pytest.approx(dist[k], abs=1e-12)


def test_bloom_prefilter_exact_and_selective(spark, sf_smoke):
    """Bloom-prefiltered semi join returns EXACTLY the plain semi join
    (no false negatives by construction), and the map-side prefilter
    alone already removes most non-matching fact rows."""
    from dumpty_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
        bloom_prefilter_semi_join,
    )
    from dumpty_spark.sources import load_table

    orders = load_table(spark, sf_smoke, "orders")
    dim = load_table(spark, sf_smoke, "customer").filter(F.col("c_acctbal") > 9000)
    got = sorted(
        r["o_orderkey"]
        for r in bloom_prefilter_semi_join(
            orders, dim, "o_custkey", "c_custkey"
        ).collect()
    )
    want = sorted(
        r["o_orderkey"]
        for r in orders.join(
            dim.select("c_custkey"),
            orders.o_custkey == F.col("c_custkey"),
            "left_semi",
        ).collect()
    )
    assert got == want

    words = bloom_build(dim, "c_custkey")
    pre = orders.filter(bloom_might_contain(F.col("o_custkey"), words)).count()
    total = orders.count()
    # selective dim (~6% of customers) -> prefilter must cut the fact
    # hard; fp rate for n~10 keys in 2^16 bits is ~0
    assert len(want) <= pre < 0.5 * total


def test_bloom_rejects_bad_m():
    from dumpty_spark.operators.bloom import bloom_build

    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(None, "k", m_bits=100)


def test_snapshot_diff_semantics(spark):
    """added/removed/changed/unchanged, NULL-safe on value columns:
    NULL->value and value->NULL are changes, NULL->NULL is not."""
    from dumpty_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, None, 3.0), (4, "d", 4.0)],
        ["k", "s", "v"],
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, None, 3.0), (5, "e", 5.0)],
        ["k", "s", "v"],
    )
    got = {r["k"]: r["status"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {2: "changed", 4: "removed", 5: "added"}

    with pytest.raises(ValueError, match="share a schema"):
        snapshot_diff(old, new.withColumnRenamed("v", "x"), ["k"])


def test_sample_stratified_k_invariants(spark, sf_smoke):
    """Per-stratum exact-k: each language contributes min(k, |stratum|)
    rows, membership is partition-invariant, and k=25 rows nest inside
    the k=40 draw per stratum (prefix property of the hash ranking)."""
    from dumpty_spark.operators import sampling as SM
    from dumpty_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents")
    sizes = {r["lang"]: r["n"] for r in docs.groupBy("lang").count()
             .withColumnRenamed("count", "n").collect()}
    k25 = SM.sample_stratified_k(docs, ["lang"], ["doc_id"], 25)
    per = {r["lang"]: r["n"] for r in k25.groupBy("lang").count()
           .withColumnRenamed("count", "n").collect()}
    assert per == {lang: min(25, n) for lang, n in sizes.items()}

    ids25 = sorted(r["doc_id"] for r in k25.collect())
    ids25_rep = sorted(
        r["doc_id"]
        for r in SM.sample_stratified_k(
            docs.repartition(7), ["lang"], ["doc_id"], 25
        ).collect()
    )
    assert ids25 == ids25_rep

    ids40 = {r["doc_id"] for r in
             SM.sample_stratified_k(docs, ["lang"], ["doc_id"], 40).collect()}
    assert set(ids25) <= ids40
