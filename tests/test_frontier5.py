"""Unit + plan tests for the round-5 fifth batch (queries/frontier5.py,
E125-E128) — gate-wired in round 6 per the r5 verdict: hand-sized
fixtures with independently derivable answers, driven through the REAL
registered query code via a load_table monkeypatch, plus the physical-
plan assertions the verdict asked for (broadcast θ join for CUPED, no
global window in the Neyman draw, cluster-partitioned cap window)."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from dumpty_spark.queries import REGISTRY
from tests.test_plans import plan_of


def _fake_loader(frames: dict):
    def load_table(spark, sf_dir, name):
        return frames[name]

    return load_table


# ---------------------------------------------------------------------------
# E125 manifest time travel + CDC
# ---------------------------------------------------------------------------
def test_time_travel_version_arithmetic(spark, sf_smoke):
    """n_v1 must equal n_v0 - removed + added, and the change statuses
    must be exactly the three CDC kinds the mutation produces."""
    rows = REGISTRY["q_manifest_time_travel"].fn(spark, sf_smoke).collect()
    by = {r["status"]: r for r in rows}
    assert set(by) == {"added", "changed", "removed"}
    r0 = rows[0]
    assert (
        r0["n_v1"]
        == r0["n_v0"] - by["removed"]["n_keys"] + by["added"]["n_keys"]
    )
    # every cloned key lands above the 10M offset; every removed below
    assert by["added"]["min_key"] >= 10_000_000
    assert by["removed"]["max_key"] < 10_000_000


def test_time_travel_scratch_is_cleaned(spark, sf_smoke):
    """The store root lives under spark.sql.warehouse.dir (shared
    storage on a real deployment — VERDICT r5 #2) and must be removed
    after the query returns, success or failure."""
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for scheme in ("file://", "file:"):
        if wh.startswith(scheme):
            wh = wh[len(scheme):]
            break
    REGISTRY["q_manifest_time_travel"].fn(spark, sf_smoke).collect()
    assert glob.glob(os.path.join(wh, "_tt_scratch_*")) == []


def test_time_travel_reads_are_version_pruned(spark, tmp_path):
    """read_store(v) must scan ONLY the files in version v's manifest:
    after commit_snapshot, v0 still returns the original rows even
    though v1's files sit in the same data dir."""
    from dumpty_spark.sinks import manifest as MF

    root = str(tmp_path / "store")
    v0 = spark.range(10).select(F.col("id").alias("k"))
    MF.create_store(v0, root)
    MF.commit_snapshot(
        spark.range(3).select((F.col("id") + 100).alias("k")), root
    )
    assert sorted(r["k"] for r in MF.read_store(spark, root, 0).collect()) == list(
        range(10)
    )
    assert MF.read_store(spark, root, 1).count() == 3
    # version-0 manifest file list is a strict subset of what's on disk
    assert len(MF.data_files(root, 0)) < len(
        glob.glob(os.path.join(root, "data", "*.parquet"))
    )


# ---------------------------------------------------------------------------
# E126 CUPED
# ---------------------------------------------------------------------------
def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, value double, ts timestamp"
    ).select(
        "user_id",
        "event_type",
        "value",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
    )


def test_cuped_perfect_covariate_removes_all_variance(spark, monkeypatch):
    """If post = 2·pre + 5 exactly for every user, pooled θ = 2, the
    adjusted metric is constant, so cuped_lift = 0 and the variance
    reduction is exactly 1 — independent of which arm the md5 coin put
    each user in."""
    import datetime as dt

    import dumpty_spark.queries.frontier5 as FR5

    rows = []
    for uid in range(1, 41):
        rows.append((uid, "view", float(uid), dt.datetime(2024, 1, 10)))
        rows.append((uid, "view", 2.0 * uid + 5.0, dt.datetime(2024, 1, 20)))
    monkeypatch.setattr(FR5, "load_table", _fake_loader({"events": _events(spark, rows)}))
    r = FR5.q_cuped_lift(spark, "ignored").collect()
    assert len(r) == 1
    row = r[0]
    assert row["n_treated"] > 0 and row["n_control"] > 0
    assert row["cuped_lift"] == 0.0
    assert row["variance_reduction"] == 1.0
    # the raw lift is whatever the coin dealt — only its adjustment is pinned
    assert row["raw_lift"] is not None


def test_cuped_theta_frame_broadcasts(spark, sf_smoke):
    """The per-series θ/x̄ frame is series-sized and must ride a
    broadcast join back onto the per-user partials."""
    plan = plan_of(REGISTRY["q_cuped_lift"].fn(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# E127 Neyman allocation
# ---------------------------------------------------------------------------
def test_neyman_budget_follows_n_sigma(spark, monkeypatch):
    """Two strata, one with all the variance: the high-σ stratum gets
    the whole budget (capped by its size at draw time), the zero-σ
    stratum gets the 1-doc floor."""
    import dumpty_spark.queries.frontier5 as FR5

    rows = []
    for i in range(50):  # lang 'a': n_chars alternates 0/20 -> σ = 10
        rows.append((i, "a", 0 if i % 2 == 0 else 20, "s"))
    for i in range(50, 100):  # lang 'b': constant -> σ = 0
        rows.append((i, "b", 5, "s"))
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, n_chars int, source string"
    )
    monkeypatch.setattr(FR5, "load_table", _fake_loader({"documents": docs}))
    out = {r["lang"]: r for r in FR5.q_neyman_allocation(spark, "ignored").collect()}
    assert out["a"]["allocated"] == 100  # floor(100 * 50*10 / 500)
    assert out["a"]["drawn"] == 50  # capped by stratum size
    assert out["b"]["allocated"] == 1  # zero-σ stratum: the 1-doc floor
    assert out["b"]["drawn"] == 1
    assert out["a"]["sigma"] == 10.0 and out["b"]["sigma"] == 0.0


def test_neyman_draw_window_is_stratum_partitioned(spark, sf_smoke):
    """The ranked draw must partition by lang — no global sort window
    anywhere in the plan."""
    plan = plan_of(REGISTRY["q_neyman_allocation"].fn(spark, sf_smoke))
    assert "hashpartitioning(lang" in plan


# ---------------------------------------------------------------------------
# E128 cluster-capped dedup
# ---------------------------------------------------------------------------
def test_cluster_cap_keeps_k_longest(spark):
    """Direct cap semantics on a crafted assignment: a 3-doc cluster
    keeps its 2 longest (id tie-break), singletons always survive."""
    from pyspark.sql.window import Window

    assigned = spark.createDataFrame(
        [
            (1, "s1", 100, 1),
            (2, "s1", 300, 1),
            (3, "s2", 300, 1),  # ties with doc 2 -> doc 2 wins on id
            (4, "s2", 10, 4),
        ],
        "doc_id long, source string, len int, cluster_id long",
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("len"), F.asc("doc_id"))
    kept = {
        r["doc_id"]
        for r in assigned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .collect()
    }
    assert kept == {2, 3, 4}  # doc 1 (shortest in the trio) dropped


def test_cluster_cap_accounting_and_plan(spark, sf_smoke):
    """kept + dropped must equal the per-source doc count, and the cap
    window must partition by cluster_id (docs-sized key, never global)."""
    df = REGISTRY["q_cluster_cap_dedup"].fn(spark, sf_smoke)
    plan = plan_of(df)
    assert "hashpartitioning(cluster_id" in plan
    for r in df.collect():
        assert r["n_kept"] + r["n_dropped"] == r["n_docs"]
        assert r["n_kept"] >= 1
