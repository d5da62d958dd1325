"""Regime-equality tests for the round-6 two-regime promotions: k-core
peeling and bounded BFS both gained a driver (numpy) regime next to
their distributed loops — the two paths must be bit-identical, with the
distributed path forced via driver_max_edges=0 (the pagerank/LPA
pattern from tests/test_graph.py)."""

from __future__ import annotations

import pytest


def _kcore_sets(spark, edges, k, driver_max_edges):
    from dumpty_spark.operators.kcore import kcore

    df = spark.createDataFrame(edges, ["a_id", "b_id"])
    return sorted(
        (r["id"], r["degree"])
        for r in kcore(df, k, driver_max_edges=driver_max_edges).collect()
    )


def test_kcore_regimes_agree(spark):
    """Triangle + pendant chain + a second clique: both regimes peel to
    the identical (id, in-core degree) set."""
    edges = (
        [(1, 2), (2, 3), (1, 3)]                      # triangle: 2-core
        + [(3, 4), (4, 5)]                            # pendant chain
        + [(10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13)]
    )
    for k in (2, 3):
        drv = _kcore_sets(spark, edges, k, 5_000_000)
        dist = _kcore_sets(spark, edges, k, 0)
        assert drv == dist
    # k=3: only the 4-clique survives, every node at degree 3
    assert _kcore_sets(spark, edges, 3, 5_000_000) == [
        (10, 3), (11, 3), (12, 3), (13, 3)
    ]


def test_kcore_empty_core_both_regimes(spark):
    """A path graph has no 3-core: both regimes return an empty frame
    with the stable (id, degree) schema."""
    edges = [(1, 2), (2, 3), (3, 4)]
    for gate in (5_000_000, 0):
        got = _kcore_sets(spark, edges, 3, gate)
        assert got == []


def _bfs_rows(spark, edges, sources, hops, gate):
    from dumpty_spark.operators.bfs import bounded_bfs

    df = spark.createDataFrame(edges, ["u", "v"])
    return sorted(
        (r["src"], r["node"], r["dist"])
        for r in bounded_bfs(
            df, sources, n_hops=hops, driver_max_edges=gate
        ).collect()
    )


def test_bfs_regimes_agree(spark):
    """Directed diamond + tail: first-distance semantics (a node
    reachable at hops 1 AND 2 reports 1), bounded horizon, multi-source
    — identical rows from both regimes."""
    edges = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (5, 6), (2, 3)]
    for sources in ([1], [1, 4]):
        drv = _bfs_rows(spark, edges, sources, 3, 5_000_000)
        dist = _bfs_rows(spark, edges, sources, 3, 0)
        assert drv == dist
    got = dict(
        ((s, n), d) for s, n, d in _bfs_rows(spark, edges, [1], 3, 5_000_000)
    )
    # node 3: direct hop (1->3) wins over 1->2->3
    assert got[(1, 3)] == 1
    # node 4: hop 2 via either branch; node 5: hop 3; node 6: beyond horizon
    assert got[(1, 4)] == 2 and got[(1, 5)] == 3
    assert (1, 6) not in got


def test_bfs_query_unchanged_by_regime(spark, sf_smoke):
    """The registered query's rollup must be identical whichever regime
    the operator picks (driver at smoke SF vs distributed forced)."""
    import dumpty_spark.operators.bfs as B
    from dumpty_spark.queries import REGISTRY

    rows_driver = sorted(
        tuple(r) for r in REGISTRY["q_bfs_reachability"].fn(spark, sf_smoke).collect()
    )
    orig = B.bounded_bfs

    def forced(edges, sources, n_hops=3, **kw):
        kw["driver_max_edges"] = 0
        return orig(edges, sources, n_hops=n_hops, **kw)

    B.bounded_bfs = forced
    try:
        import dumpty_spark.queries.frontier as fr

        rows_dist = sorted(
            tuple(r) for r in fr.q_bfs_reachability(spark, sf_smoke).collect()
        )
    finally:
        B.bounded_bfs = orig
    assert rows_driver == rows_dist
