"""Round-7 graph-operator contract fixes (ADVICE r6):

- personalized_pagerank: a seed id absent from the edge list must lose
  its restart-mass share IDENTICALLY in both regimes (the driver regime
  used an unchecked searchsorted that either raised IndexError or
  silently credited a neighboring node).
- bounded_bfs: an empty source list raises an explicit ValueError in
  both regimes instead of an opaque schema-inference error.
"""

from __future__ import annotations

import pytest


def _ppr_ranks(spark, edges, seeds, gate):
    from pyspark.sql import functions as F

    from dumpty_spark.operators.graph import personalized_pagerank

    e = spark.createDataFrame(edges, ["src", "dst"])
    s = spark.createDataFrame([(x,) for x in seeds], ["id"])
    out = personalized_pagerank(
        e, s, damping=0.75, n_iter=6, driver_max_edges=gate
    )
    return {
        r["id"]: round(r["rank"], 9)
        for r in out.select("id", F.col("rank")).collect()
    }


EDGES = [(1, 2), (2, 3), (3, 1), (3, 4)]


def test_ppr_off_graph_seed_regimes_agree(spark):
    """Seed 0 is not an endpoint of any edge: its 1/len(seeds) share of
    the restart mass is lost (isin semantics) in BOTH regimes, and the
    on-graph seed's neighborhood still ranks. Before the fix the driver
    regime assigned seed 0's mass to node 1 (searchsorted landing)."""
    drv = _ppr_ranks(spark, EDGES, [0, 1], 5_000_000)
    dist = _ppr_ranks(spark, EDGES, [0, 1], 0)
    assert drv == dist
    # total mass < 1: the off-graph seed's share never enters
    assert 0 < sum(drv.values()) < 0.999
    assert drv[1] > drv[4]  # locality bias from the surviving seed


def test_ppr_all_seeds_off_graph_regimes_agree(spark):
    """Every seed off-graph: both regimes return all-zero ranks over the
    node set (no restart mass at all) rather than raising."""
    drv = _ppr_ranks(spark, EDGES, [99], 5_000_000)
    dist = _ppr_ranks(spark, EDGES, [99], 0)
    assert drv == dist
    assert set(drv.values()) == {0.0}


def test_ppr_high_seed_beyond_max_id(spark):
    """A seed id greater than every node id used to raise IndexError in
    the driver regime (searchsorted returns n); now it is dropped in
    both regimes."""
    drv = _ppr_ranks(spark, EDGES, [1, 1000], 5_000_000)
    dist = _ppr_ranks(spark, EDGES, [1, 1000], 0)
    assert drv == dist


def test_bfs_empty_sources_raises(spark):
    from dumpty_spark.operators.bfs import bounded_bfs

    e = spark.createDataFrame(EDGES, ["u", "v"])
    for gate in (5_000_000, 0):
        with pytest.raises(ValueError, match="empty source set"):
            bounded_bfs(e, [], driver_max_edges=gate)
