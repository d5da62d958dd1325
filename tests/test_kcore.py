"""k-core extraction (operators/kcore.py, EXT E50) vs an independent
pure-python peeling reference."""

from __future__ import annotations

import pytest

from dumpty_spark.operators.kcore import kcore


def py_kcore(edges, k):
    """Reference peeling: repeatedly drop degree<k nodes."""
    from collections import defaultdict

    E = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    while True:
        deg = defaultdict(int)
        for u, v in E:
            deg[u] += 1
            deg[v] += 1
        bad = {x for x, d in deg.items() if d < k}
        if not bad:
            return dict(deg)
        E = {(u, v) for u, v in E if u not in bad and v not in bad}


CASES = [
    # triangle + pendant chain: 2-core = the triangle
    ([(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)], 2),
    # two 4-cliques joined by one bridge: 3-core = both cliques, bridge out
    (
        [(a, b) for a in range(4) for b in range(a + 1, 4)]
        + [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
        + [(0, 10)],
        3,
    ),
    # pure path: 2-core empty
    ([(i, i + 1) for i in range(20)], 2),
    # k larger than any degree: empty
    ([(1, 2), (2, 3)], 5),
]


@pytest.mark.parametrize("edges,k", CASES)
def test_kcore_matches_reference(spark, edges, k):
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    got = {r["id"]: r["degree"] for r in kcore(df, k).collect()}
    assert got == py_kcore(edges, k)


def test_kcore_ring_is_its_own_2core(spark):
    n = 50
    edges = [(i, (i + 1) % n) for i in range(n)]
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    got = {r["id"]: r["degree"] for r in kcore(df, 2).collect()}
    assert got == {i: 2 for i in range(n)}
