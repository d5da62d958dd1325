"""Two-regime gate crossover, pinned on a replicated pair graph
(VERDICT r2, task 1): the ×10-replication trick from
``scripts/make_scale_fixtures.py`` — id-offset copies, no RNG — is used
here at test scale to push the SAME pair-graph shape across the
connected-components driver gate, asserting (a) the regime actually
flips at the documented threshold, (b) both regimes produce identical
components, (c) the fixture replicator preserves intra-replica FKs.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dumpty_spark.operators import telemetry
from dumpty_spark.operators.dedup import connected_components


def replicated_pair_graph(spark, n_replicas: int, stride: int = 10_000):
    """The scale-fixture construction in miniature: one 6-node near-dup
    cluster (a chain — worst diameter) plus one isolated pair, replicated
    with id offsets. Deterministic, no RNG."""
    base = [(i, i + 1) for i in range(5)] + [(100, 101)]
    rows = [
        (a + k * stride, b + k * stride)
        for k in range(n_replicas)
        for (a, b) in base
    ]
    return spark.createDataFrame(rows, "a_id long, b_id long")


def expected_clusters(n_replicas: int, stride: int = 10_000):
    out = {}
    for k in range(n_replicas):
        for i in range(6):
            out[i + k * stride] = k * stride
        out[100 + k * stride] = 100 + k * stride
        out[101 + k * stride] = 100 + k * stride
    return out


def test_cc_gate_crossover_on_replicated_graph(spark):
    """6 edges/replica × 50 replicas = 300 pairs → 600 symmetrized.
    gate=400: 600 > 2·400? No — 600 ≤ 800 → driver. gate=200: 600 >
    400 → distributed. Same data, same answer, regime observable."""
    edges = replicated_pair_graph(spark, 50)

    below = connected_components(edges, driver_max_edges=400)
    got_below = {r["id"]: r["cluster_id"] for r in below.collect()}
    assert telemetry.LAST["connected_components"] == {
        "regime": "driver",
        "size": 600,
    }

    above = connected_components(edges, driver_max_edges=200)
    got_above = {r["id"]: r["cluster_id"] for r in above.collect()}
    t = telemetry.LAST["connected_components"]
    assert t["regime"] == "distributed" and t["size"] == 600

    exp = expected_clusters(50)
    assert got_below == exp
    assert got_above == exp


def test_cc_gate_exact_threshold(spark):
    """The gate is `n_sym <= 2 * driver_max_edges`: exactly-at-threshold
    stays driver-side; one replica more crosses. Pins the arithmetic so
    a refactor can't silently shift the crossover."""
    # 25 replicas × 6 pairs = 150 pairs = 300 symmetrized = exactly 2·150
    edges = replicated_pair_graph(spark, 25)
    connected_components(edges, driver_max_edges=150).collect()
    assert telemetry.LAST["connected_components"]["regime"] == "driver"

    edges26 = replicated_pair_graph(spark, 26)
    connected_components(edges26, driver_max_edges=150).collect()
    assert telemetry.LAST["connected_components"]["regime"] == "distributed"


def test_pagerank_gate_crossover(spark):
    """Same observable for the PageRank two-regime gate."""
    from dumpty_spark.operators.graph import pagerank

    edges = replicated_pair_graph(spark, 10).selectExpr(
        "a_id as src", "b_id as dst"
    )
    pagerank(edges, driver_max_edges=100).collect()
    assert telemetry.LAST["pagerank"] == {"regime": "driver", "size": 60}
    pagerank(edges, driver_max_edges=50, n_iter=2).collect()
    assert telemetry.LAST["pagerank"]["regime"] == "distributed"


def permuted_path_edges(spark, n: int, mult: int):
    """A path graph whose node ids are a deterministic permutation of
    0..n-1 (multiplicative perm mod prime n) — high diameter AND ids
    uncorrelated with topology: min-label's worst case (measured 1500
    rounds at n=2003), LS/SS's bread and butter (O(log² n))."""
    perm = lambda i: (i * mult) % n
    return spark.createDataFrame(
        [(perm(i), perm(i + 1)) for i in range(n - 1)], "a_id long, b_id long"
    )


def test_large_small_star_agrees_with_union_find(spark):
    """LS/SS on a 2003-node permuted path + disjoint replicated clusters:
    distributed result equals the exact driver union-find result."""
    path = permuted_path_edges(spark, 2003, 1201)
    clusters = replicated_pair_graph(spark, 20, stride=1_000_000)
    edges = path.union(clusters)

    exact = {
        r["id"]: r["cluster_id"]
        for r in connected_components(edges, driver_max_edges=10**9).collect()
    }
    assert telemetry.LAST["connected_components"]["regime"] == "driver"

    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components(
            edges, driver_max_edges=0, algorithm="star"
        ).collect()
    }
    t = telemetry.LAST["connected_components"]
    assert t["regime"] == "distributed" and t["algorithm"] == "star"
    assert got == exact
    # the whole path collapses to min id 0
    assert got[1201 % 2003] == 0
    # O(log² n) bound in practice: ~log n rounds, nowhere near the 1500
    # min-label needs on this graph
    assert t["rounds"] <= 20


def test_minlabel_cannot_converge_where_star_does(spark):
    """The motivating contrast, pinned: on the permuted path min-label
    raises non-convergence at a round budget LS/SS finishes well inside."""
    edges = permuted_path_edges(spark, 509, 151)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            edges, driver_max_edges=0, algorithm="minlabel", max_iter=15
        )
    got = connected_components(
        edges, driver_max_edges=0, algorithm="star", max_iter=15
    )
    assert {r["cluster_id"] for r in got.collect()} == {0}
    assert telemetry.LAST["connected_components"]["rounds"] <= 15


def test_auto_falls_back_to_star(spark):
    """algorithm='auto' (the production default): clique-ish graphs stay
    on min-label; the permuted path triggers the star fallback and still
    returns the right components."""
    clusters = replicated_pair_graph(spark, 30)
    connected_components(clusters, driver_max_edges=0).collect()
    t = telemetry.LAST["connected_components"]
    assert t["algorithm"] == "auto" and t["rounds"] <= 12

    edges = permuted_path_edges(spark, 509, 151)
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components(edges, driver_max_edges=0).collect()
    }
    t = telemetry.LAST["connected_components"]
    assert t["algorithm"] == "star-fallback"
    assert set(got.values()) == {0} and len(got) == 509


def test_fixture_replicator_preserves_fks(spark, tmp_path):
    """make_scale_fixtures ×3 on sf0.001: row counts triple for fact
    tables, dims stay single, and every intra-replica FK join resolves
    (no orphaned lineitem/orders keys across the offset id-spaces)."""
    from scripts.make_scale_fixtures import build

    src = "/root/testdata/sf0.001"
    if not os.path.isdir(src):
        pytest.skip("sf0.001 fixtures absent")
    out = str(tmp_path / "sf3x")
    build(src, out, 3)

    orders = spark.read.parquet(os.path.join(out, "orders.parquet"))
    li = spark.read.parquet(os.path.join(out, "lineitem.parquet"))
    cust = spark.read.parquet(os.path.join(out, "customer.parquet"))
    nation = spark.read.parquet(os.path.join(out, "nation.parquet"))

    src_orders = spark.read.parquet(os.path.join(src, "orders.parquet"))
    assert orders.count() == 3 * src_orders.count()
    assert nation.count() == 25  # dims not replicated

    # keys are globally unique across replicas
    assert orders.select("o_orderkey").distinct().count() == orders.count()
    # every FK resolves: lineitem→orders, orders→customer, customer→nation
    assert li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti").count() == 0
    assert orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti").count() == 0
    assert cust.join(
        nation, cust.c_nationkey == nation.n_nationkey, "left_anti"
    ).count() == 0
    # replica 2 really is offset replica 0: same order count per id-space
    n0 = orders.filter(F.col("o_orderkey") < 100_000_000).count()
    n2 = orders.filter(F.col("o_orderkey") >= 200_000_000).count()
    assert n0 == n2 == src_orders.count()
