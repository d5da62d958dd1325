"""Incremental CC store (operators/components.py, EXT E46): per-batch
fold-in must equal full recompute over all pairs seen, at touched-rows
update cost, through atomic manifest commits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dumpty_spark.operators.components import (
    component_store_read,
    component_store_update,
)
from dumpty_spark.operators.dedup import connected_components
from dumpty_spark.sinks import manifest as M


def df_pairs(spark, pairs):
    return spark.createDataFrame(pairs, "a_id long, b_id long")


def assignment(spark, root):
    return {
        r["id"]: r["cluster_id"] for r in component_store_read(spark, root).collect()
    }


def full_recompute(spark, all_pairs):
    return {
        r["id"]: r["cluster_id"]
        for r in connected_components(df_pairs(spark, all_pairs)).collect()
    }


def test_batches_equal_full_recompute(spark, tmp_path):
    """Three batches that (a) create clusters, (b) extend them with new
    nodes, and (c) MERGE two existing clusters through a bridge edge —
    the hard case, since both old labels must converge to one min."""
    root = str(tmp_path / "cc")
    batches = [
        [(1, 2), (2, 3), (10, 11), (20, 21)],
        [(3, 4), (11, 12), (30, 31)],          # extends 1- and 10-clusters
        [(4, 10), (21, 30), (40, 41)],         # merges {1..4}+{10..12}, {20,21}+{30,31}
    ]
    seen: list = []
    for batch in batches:
        stats = component_store_update(spark, root, df_pairs(spark, batch))
        seen += batch
        assert assignment(spark, root) == full_recompute(spark, seen)
    # final shape: {1,2,3,4,10,11,12}→1, {20,21,30,31}→20, {40,41}→40
    a = assignment(spark, root)
    assert a[12] == 1 and a[31] == 20 and a[41] == 40
    assert stats["n_touched_clusters"] == 3  # two merges + the new {40,41} cluster


def test_incremental_cost_is_touched_rows(spark, tmp_path):
    """A batch that touches nothing already stored must not rewrite the
    untouched clusters' files: version advances, but kept files carry
    over by reference (the manifest makes this observable)."""
    root = str(tmp_path / "cc")
    component_store_update(
        spark, root, df_pairs(spark, [(i, i + 1000) for i in range(50)])
    )
    v0_files = set(M.read_manifest(root)["files"])
    component_store_update(spark, root, df_pairs(spark, [(9000, 9001)]))
    v1 = M.read_manifest(root)
    shared = v0_files & set(v1["files"])
    assert shared, "untouched files must be shared between versions"
    a = assignment(spark, root)
    assert a[9001] == 9000 and a[1049] == 49


def test_replay_is_idempotent(spark, tmp_path):
    root = str(tmp_path / "cc")
    b = [(1, 2), (2, 3)]
    component_store_update(spark, root, df_pairs(spark, b))
    before = assignment(spark, root)
    stats = component_store_update(spark, root, df_pairs(spark, b))  # replay
    assert assignment(spark, root) == before
    assert stats["n_rows_upserted"] == 0


def test_snapshot_isolation_across_update(spark, tmp_path):
    """Old snapshot remains readable (time travel) after a merge batch."""
    root = str(tmp_path / "cc")
    component_store_update(spark, root, df_pairs(spark, [(1, 2), (10, 11)]))
    component_store_update(spark, root, df_pairs(spark, [(2, 10)]))
    now = assignment(spark, root)
    assert now[11] == 1
    old = {
        r["id"]: r["cluster_id"]
        for r in component_store_read(spark, root, version=0).collect()
    }
    assert old[11] == 10  # pre-merge world, intact
