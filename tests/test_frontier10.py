"""Unit + plan tests for the round-6 fifth batch (queries/frontier10.py,
E149-E154): crafted fixtures with hand-derivable answers through the
real registered query code (load_table monkeypatch), operator-level
composition tests for the join-view store, a hand-solved absorption
chain for the Markov attribution, and the plan assertions each query's
doc claims."""

from __future__ import annotations

import datetime as dt
import glob
import math
import os

import pyspark.sql.functions as F
import pytest

from dumpty_spark.queries import REGISTRY
from tests.test_plans import plan_of


def _fake_loader(frames: dict):
    def load_table(spark, sf_dir, name):
        return frames[name]

    return load_table


def _ev_schema():
    return ["event_id", "ts", "user_id", "event_type", "value", "props"]


# ---------------------------------------------------------------------------
# E149 incremental join-view store
# ---------------------------------------------------------------------------
def test_join_view_fixture(spark, monkeypatch):
    """2 customers (one %11 key that moves nation 7->8), 3 order batches:
    the maintained view must equal the from-scratch join against the
    FINAL mapping — including order 4 ingested under the OLD mapping and
    re-homed by the dimension-move batch."""
    import dumpty_spark.queries.frontier10 as f10

    cust = spark.createDataFrame(
        [(1, 5), (11, 7)], ["c_custkey", "c_nationkey"]
    )
    orders = spark.createDataFrame(
        [(3, 1, 100.0), (4, 11, 50.0), (5, 11, 70.0)],
        ["o_orderkey", "o_custkey", "o_totalprice"],
    )
    monkeypatch.setattr(
        f10, "load_table", _fake_loader({"orders": orders, "customer": cust})
    )
    got = {r["grp"]: r for r in f10.q_join_view_store(spark, "fixture").collect()}
    assert got[5]["rev"] == pytest.approx(100.0) and got[5]["cnt"] == 1
    assert got[8]["rev"] == pytest.approx(120.0) and got[8]["cnt"] == 2
    assert 7 not in got  # the moved key's old nation ended at net zero


def test_join_view_scratch_cleaned(spark, sf_smoke):
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for scheme in ("file://", "file:"):
        if wh.startswith(scheme):
            wh = wh[len(scheme):]
            break
    REGISTRY["q_join_view_store"].fn(spark, sf_smoke).collect()
    assert glob.glob(os.path.join(wh, "_jv_*")) == []


def test_join_view_operator_idempotent_reingest(spark, tmp_path):
    """Re-writing a batch_id overwrites only its own partition (the
    store-family dynamic-overwrite contract): double-ingesting b0 must
    not double-count."""
    from dumpty_spark.operators import joinview as JV

    fact = spark.createDataFrame([(1, 10, 5.0)], ["k", "fk", "m"])
    dim = spark.createDataFrame([(10, "g1")], ["dk", "grp0"])
    store = str(tmp_path / "jv")
    p = JV.fact_delta_partials(fact, dim, "fk", "dk", "grp0", "m")
    JV.view_append(p, store, "b0")
    JV.view_append(p, store, "b0")  # idempotent re-ingest
    got = JV.view_read(spark, store).collect()
    assert len(got) == 1
    assert got[0]["rev"] == pytest.approx(5.0) and got[0]["cnt"] == 1


def test_join_view_move_partials_net_zero_rows(spark):
    """A dimension move emits matched negative/positive partials: total
    cnt across groups must be zero (rows re-homed, never duplicated)."""
    from dumpty_spark.operators import joinview as JV

    hist = spark.createDataFrame(
        [(1, 10, 5.0), (2, 10, 7.0), (3, 20, 1.0)], ["k", "fk", "m"]
    )
    moves = spark.createDataFrame([(10, "a", "b")], ["dk", "og", "ng"])
    p = JV.dim_move_partials(hist, moves, "fk", "dk", "og", "ng", "m").collect()
    by = {r["grp"]: r for r in p}
    assert by["a"]["cnt"] == -2 and by["b"]["cnt"] == 2
    assert by["a"]["rev"] == pytest.approx(-12.0)
    assert by["b"]["rev"] == pytest.approx(12.0)


# ---------------------------------------------------------------------------
# E150 Markov attribution
# ---------------------------------------------------------------------------
def test_markov_hand_solved_chain(spark, monkeypatch):
    """u1 view->buy, u2 view->click->buy, u3 view (no buy), u4 direct
    buy. P(START,view)=3/4, P(START,CONV)=1/4, view uniform thirds,
    click->CONV certain. Hand absorption: base=3/4; removing view ->
    1/4 (effect 2/3); removing click -> 1/2 (effect 1/3); absent
    channels get 0."""
    import dumpty_spark.queries.frontier10 as f10

    t0 = dt.datetime(2024, 1, 1)

    def ev(i, u, typ):
        return (i, t0 + dt.timedelta(minutes=i), u, typ, 0.0, "{}")

    rows = [
        ev(1, 1, "view"), ev(2, 1, "purchase"),
        ev(3, 2, "view"), ev(4, 2, "click"), ev(5, 2, "purchase"),
        ev(6, 3, "view"),
        ev(7, 4, "purchase"),
    ]
    evdf = spark.createDataFrame(rows, _ev_schema())
    monkeypatch.setattr(f10, "load_table", _fake_loader({"events": evdf}))
    got = {
        r["channel"]: r
        for r in f10.q_markov_attribution(spark, "fixture").collect()
    }
    assert set(got) == set(f10._MK_CHANNELS)
    assert got["view"]["base_conversion"] == pytest.approx(0.75)
    assert got["view"]["removal_effect"] == pytest.approx(round(2 / 3, 6))
    assert got["click"]["removal_effect"] == pytest.approx(round(1 / 3, 6))
    assert got["signup"]["removal_effect"] == pytest.approx(0.0)
    assert got["error"]["removal_effect"] == pytest.approx(0.0)
    assert got["view"]["attribution_share"] == pytest.approx(
        round(got["view"]["removal_effect"]
              / (got["view"]["removal_effect"] + got["click"]["removal_effect"]), 6),
        abs=1e-6,
    )


def test_markov_shares_sum_to_one(spark, sf_smoke):
    rows = REGISTRY["q_markov_attribution"].fn(spark, sf_smoke).collect()
    assert len(rows) == 4
    assert sum(r["attribution_share"] for r in rows) == pytest.approx(1.0, abs=1e-4)
    assert all(0.0 <= r["removal_effect"] <= 1.0 for r in rows)


# ---------------------------------------------------------------------------
# E151 WOE encoding
# ---------------------------------------------------------------------------
def test_woe_fixture(spark, monkeypatch):
    """Two sources: s1 = 3 pos / 1 neg, s2 = 1 pos / 3 neg — symmetric
    smoothed WOE, IV = sum of contributions."""
    import dumpty_spark.queries.frontier10 as f10

    rows = (
        [(i, "x", "en", "s1", 1) for i in range(3)]
        + [(3, "x", "fr", "s1", 1)]
        + [(4, "x", "en", "s2", 1)]
        + [(5 + i, "x", "fr", "s2", 1) for i in range(3)]
    )
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    monkeypatch.setattr(f10, "load_table", _fake_loader({"documents": docs}))
    got = {r["source"]: r for r in f10.q_woe_encoding(spark, "fixture").collect()}
    tp, tn, k = 4.0, 4.0, 2
    dp1, dn1 = (3 + 0.5) / (tp + 0.5 * k), (1 + 0.5) / (tn + 0.5 * k)
    woe1 = math.log(dp1 / dn1)
    assert got["s1"]["pos"] == 3 and got["s1"]["neg"] == 1
    assert got["s1"]["woe"] == pytest.approx(round(woe1, 6))
    assert got["s2"]["woe"] == pytest.approx(round(-woe1, 6))  # symmetric
    iv = 2 * (dp1 - dn1) * woe1
    assert got["s1"]["iv_total"] == pytest.approx(round(iv, 6))
    assert got["s1"]["iv_contrib"] == pytest.approx(round((dp1 - dn1) * woe1, 6))


# ---------------------------------------------------------------------------
# E152 SCD2 interval audit
# ---------------------------------------------------------------------------
def test_scd2_audit_counts_injected_defects(spark, monkeypatch):
    """Five 2-interval keys: %13==0 -> 1 overlap, %13==5 (wide) -> 1 gap,
    %13==5 (narrow) -> gap AND inverted, %13==7 -> loses its current
    row, clean key -> nothing."""
    import dumpty_spark.queries.frontier10 as f10

    t0 = dt.datetime(2024, 1, 1)

    def buy(i, u, hours):
        return (i, t0 + dt.timedelta(hours=hours), u, "purchase", 0.0, "{}")

    rows = [
        buy(1, 13, 0), buy(2, 13, 2),   # overlap: to+1h > next_from
        buy(3, 5, 0), buy(4, 5, 3),     # gap: to-2h < next_from
        buy(5, 18, 0), buy(6, 18, 1),   # to-2h < from: gap AND inverted
        buy(7, 7, 0), buy(8, 7, 1),     # last row closed -> no current
        buy(9, 1, 0), buy(10, 1, 1),    # clean
    ]
    evdf = spark.createDataFrame(rows, _ev_schema())
    monkeypatch.setattr(f10, "load_table", _fake_loader({"events": evdf}))
    row = f10.q_scd2_interval_audit(spark, "fixture").first()
    assert row["n_keys"] == 5 and row["n_rows"] == 10
    assert row["n_overlaps"] == 1
    assert row["n_gaps"] == 2
    assert row["n_inverted"] == 1
    assert row["n_keys_no_current"] == 1


# ---------------------------------------------------------------------------
# E153 ratio-metric standard errors
# ---------------------------------------------------------------------------
def test_ratio_se_matches_python(spark, monkeypatch):
    """Hand recomputation of both closed forms from per-user sums on a
    4-user fixture."""
    import dumpty_spark.queries.frontier10 as f10

    t0 = dt.datetime(2024, 1, 1)
    data = {1: [1.0, 3.0], 2: [2.0], 3: [5.0, 1.0, 0.0], 4: [4.0]}
    rows, i = [], 0
    for u, vals in data.items():
        for v in vals:
            rows.append((i, t0 + dt.timedelta(minutes=i), u, "view", v, "{}"))
            i += 1
    evdf = spark.createDataFrame(rows, _ev_schema())
    monkeypatch.setattr(f10, "load_table", _fake_loader({"events": evdf}))
    row = f10.q_ratio_se(spark, "fixture").first()

    ys = {u: sum(v) for u, v in data.items()}
    ns = {u: len(v) for u, v in data.items()}
    sy, sn, u_ = sum(ys.values()), float(sum(ns.values())), len(data)
    r = sy / sn
    ss = sum((ys[u] - r * ns[u]) ** 2 for u in data)
    se_delta = math.sqrt(ss / (sn * sn) * u_ / (u_ - 1))
    loo = [(sy - ys[u]) / (sn - ns[u]) for u in data]
    rbar = sum(loo) / u_
    se_jack = math.sqrt((u_ - 1) / u_ * sum((x - rbar) ** 2 for x in loo))
    assert row["n_users"] == 4
    assert row["ratio"] == pytest.approx(round(r, 6))
    assert row["se_delta"] == pytest.approx(round(se_delta, 6))
    assert row["se_jackknife"] == pytest.approx(round(se_jack, 6))


def test_ratio_se_plan_broadcasts(spark, sf_smoke):
    plan = plan_of(REGISTRY["q_ratio_se"].fn(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# E154 mSPRT readout
# ---------------------------------------------------------------------------
def test_msprt_properties(spark, sf_smoke):
    """Null synthetic data: every always-valid p is in (0,1] and the
    statistic is internally consistent (p = min(1, 1/lambda))."""
    rows = REGISTRY["q_msprt_readout"].fn(spark, sf_smoke).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["lambda"] > 0
        assert 0 < r["always_valid_p"] <= 1.0
        assert r["always_valid_p"] == pytest.approx(
            round(min(1.0, 1.0 / r["lambda"]), 4), abs=2e-4
        )
        assert r["significant"] == (r["always_valid_p"] < 0.05)


def test_msprt_detects_planted_effect(spark, monkeypatch):
    """Plant a large treatment effect using the REAL md5 coin (computed
    via the same bucket_fraction expression): the always-valid p must
    fall below 0.05."""
    import dumpty_spark.queries.frontier10 as f10
    from dumpty_spark.operators.sampling import bucket_fraction

    t0 = dt.datetime(2024, 1, 1)
    users = spark.createDataFrame(
        [(u,) for u in range(1, 41)], ["user_id"]
    ).select("user_id", (bucket_fraction(["user_id"]) < 0.5).alias("treated"))
    arms = {r["user_id"]: r["treated"] for r in users.collect()}
    rows = []
    i = 0
    for u, tr in arms.items():
        for k in range(5):
            base = 10.0 if tr else 1.0
            rows.append(
                (i, t0 + dt.timedelta(minutes=i), u, "view",
                 base + (u * 7 + k) % 3 * 0.1, "{}")
            )
            i += 1
    evdf = spark.createDataFrame(rows, _ev_schema())
    monkeypatch.setattr(f10, "load_table", _fake_loader({"events": evdf}))
    row = f10.q_msprt_readout(spark, "fixture").first()
    assert row["always_valid_p"] < 0.05 and row["significant"]
