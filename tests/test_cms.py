"""Count-min sketch store (operators/cms.py, EXT E68)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dumpty_spark.operators import cms
from dumpty_spark.sources import load_table


@pytest.fixture(scope="module")
def events(spark, sf_t2):
    return load_table(spark, sf_t2, "events").select(
        "event_id", "user_id"
    ).localCheckpoint()


def _estimates(spark, store, keys, batches=None):
    return {
        r["user_id"]: (r["est"], r["n_total"])
        for r in cms.cms_store_estimate(
            spark, store, keys, "user_id", batches=batches
        ).collect()
    }


def test_merged_estimates_never_undercount(spark, events, tmp_path):
    """Two disjoint batches at rest; the merged estimate obeys both CMS
    bounds for every key: est >= true (always) and est <= true + eps*N
    (the one-sided envelope, deterministic for fixed hashes/data)."""
    store = str(tmp_path / "cms")
    cms.cms_store_append(
        events.filter(F.col("event_id") % 2 == 0), store, "user_id", "b0"
    )
    cms.cms_store_append(
        events.filter(F.col("event_id") % 2 == 1), store, "user_id", "b1"
    )
    keys = events.select("user_id").distinct()
    est = _estimates(spark, store, keys)
    exact = {
        r["user_id"]: r["c"]
        for r in events.groupBy("user_id").agg(F.count("*").alias("c")).collect()
    }
    n = events.count()
    import math

    eps_n = math.e / cms.WIDTH * n
    assert set(est) == set(exact)
    for k, (e, n_total) in est.items():
        assert n_total == n
        assert e >= exact[k], f"undercount for {k}: {e} < {exact[k]}"
        assert e <= exact[k] + eps_n, f"overflow for {k}: {e} > {exact[k]}+{eps_n}"


def test_batch_grid_is_sketch_sized(spark, events):
    """One batch reduces to at most DEPTH*WIDTH rows regardless of the
    input row count — the bytes-per-batch contract of the store."""
    grid = cms.cms_batch(events, "user_id", "b0")
    assert grid.count() <= cms.DEPTH * cms.WIDTH
    # every row of the grid carries DEPTH... each input row contributes
    # exactly DEPTH increments, so the grid mass is DEPTH * n_rows
    mass = grid.agg(F.sum("cnt")).first()[0]
    assert mass == cms.DEPTH * events.count()


def test_reappend_is_idempotent(spark, events, tmp_path):
    """Re-running a batch overwrites only its own hive partition — the
    estimates are unchanged, not doubled (E14/E45 store contract)."""
    store = str(tmp_path / "cms")
    b0 = events.filter(F.col("event_id") % 2 == 0)
    cms.cms_store_append(b0, store, "user_id", "b0")
    cms.cms_store_append(
        events.filter(F.col("event_id") % 2 == 1), store, "user_id", "b1"
    )
    keys = events.select("user_id").distinct()
    before = _estimates(spark, store, keys)
    cms.cms_store_append(b0, store, "user_id", "b0")  # re-ingest
    assert _estimates(spark, store, keys) == before


def test_batch_pruning_estimates_single_batch(spark, events, tmp_path):
    """batches=[...] prunes to the selected partitions: estimating over
    b0 alone bounds b0's exact counts, not the full stream's."""
    store = str(tmp_path / "cms")
    b0 = events.filter(F.col("event_id") % 2 == 0)
    cms.cms_store_append(b0, store, "user_id", "b0")
    cms.cms_store_append(
        events.filter(F.col("event_id") % 2 == 1), store, "user_id", "b1"
    )
    keys = events.select("user_id").distinct()
    est = _estimates(spark, store, keys, batches=["b0"])
    exact = {
        r["user_id"]: r["c"]
        for r in b0.groupBy("user_id").agg(F.count("*").alias("c")).collect()
    }
    n0 = b0.count()
    for k, (e, n_total) in est.items():
        assert n_total == n0
        assert e >= exact.get(k, 0)


def test_unseen_key_estimate_is_bounded(spark, events, tmp_path):
    """A key never ingested can only pick up collision mass — its
    estimate stays within eps*N of its true count of zero."""
    import math

    store = str(tmp_path / "cms")
    cms.cms_store_append(events, store, "user_id", "b0")
    ghost = spark.range(1).select(
        (F.lit(10_000_000_007)).alias("user_id")
    )
    est = _estimates(spark, store, ghost)
    n = events.count()
    (e, _), = est.values()
    assert 0 <= e <= math.e / cms.WIDTH * n
