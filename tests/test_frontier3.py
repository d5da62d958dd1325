"""Unit tests for the round-5 third batch (queries/frontier3.py +
operators/decay.py)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_type string, event_id long, ts timestamp, value double"
    ).select(
        "event_type", "event_id", F.col("ts").cast("timestamp_ntz").alias("ts"),
        "value",
    )


# ---------------------------------------------------------------------------
# E116 decayed store
# ---------------------------------------------------------------------------
def test_decay_two_step_equals_direct(spark, tmp_path):
    """Batch-local decay x re-decay == direct weighting at the global
    reference, and a value exactly one half-life old weighs 0.5."""
    from dumpty_spark.operators import decay as D

    base = dt.datetime(2024, 3, 1)
    hl = 86400.0
    rows = [
        ("s", 1, base, 10.0),                          # 2 half-lives old
        ("s", 2, base + dt.timedelta(days=1), 10.0),   # 1 half-life old
        ("s", 3, base + dt.timedelta(days=2), 10.0),   # reference row
    ]
    df = _ev(spark, rows)
    store = str(tmp_path / "d")
    # adversarial split: the NEWEST row in its own batch, the old pair in
    # another — forces a genuine cross-reference-time merge
    D.decay_store_append(df.filter("event_id < 3"), store, ["event_type"], "value", "ts", hl, "b0")
    D.decay_store_append(df.filter("event_id = 3"), store, ["event_type"], "value", "ts", hl, "b1")
    out = D.decay_store_read(spark, store, ["event_type"], hl).collect()[0]
    # direct: 10*(0.25 + 0.5 + 1.0)
    assert out["decayed_sum"] == pytest.approx(17.5, abs=1e-9)
    assert out["decayed_n"] == pytest.approx(1.75, abs=1e-9)
    assert out["decayed_mean"] == pytest.approx(10.0, abs=1e-9)
    assert out["n_rows"] == 3


def test_decay_reingest_idempotent(spark, tmp_path):
    from dumpty_spark.operators import decay as D

    base = dt.datetime(2024, 3, 1)
    df = _ev(spark, [("s", 1, base, 4.0)])
    store = str(tmp_path / "d")
    D.decay_store_append(df, store, ["event_type"], "value", "ts", 86400.0, "b0")
    D.decay_store_append(df, store, ["event_type"], "value", "ts", 86400.0, "b0")
    out = D.decay_store_read(spark, store, ["event_type"], 86400.0).collect()[0]
    assert out["decayed_sum"] == pytest.approx(4.0)
    assert out["n_rows"] == 1


def test_decay_read_at_later_time(spark, tmp_path):
    """Reading the store one half-life after the newest data halves
    every weight — the 'as of t_now' query."""
    from dumpty_spark.operators import decay as D

    base = dt.datetime(2024, 3, 1)
    df = _ev(spark, [("s", 1, base, 8.0)])
    store = str(tmp_path / "d")
    D.decay_store_append(df, store, ["event_type"], "value", "ts", 86400.0, "b0")
    t_now = base.replace(tzinfo=dt.timezone.utc).timestamp() + 86400.0
    out = D.decay_store_read(
        spark, store, ["event_type"], 86400.0, t_now=t_now
    ).collect()[0]
    assert out["decayed_sum"] == pytest.approx(4.0, abs=1e-9)


# ---------------------------------------------------------------------------
# E117 multivariate OLS
# ---------------------------------------------------------------------------
def test_multivar_ols_recovers_exact_plane(spark, monkeypatch):
    """y = 2*day + 3*hour + 5 exactly -> betas/intercept exact, R2 = 1."""
    import dumpty_spark.queries.frontier3 as FR3

    base = dt.datetime(2024, 3, 1)
    rows = []
    i = 0
    for d in range(4):
        for h in (0, 5, 11, 17, 23):
            ts = base + dt.timedelta(days=d, hours=h)
            day_idx = int(ts.replace(tzinfo=dt.timezone.utc).timestamp() // 86400)
            rows.append(("s", i, ts, 2.0 * day_idx + 3.0 * h + 5.0))
            i += 1
    df = _ev(spark, rows)
    monkeypatch.setattr(FR3, "load_table", lambda *a: df)
    out = FR3.q_multivar_ols(spark, "unused").collect()[0]
    assert out["beta_day"] == pytest.approx(2.0, abs=1e-4)
    assert out["beta_hour"] == pytest.approx(3.0, abs=1e-4)
    assert out["intercept"] == pytest.approx(5.0, abs=1e-2)
    assert out["r2"] == pytest.approx(1.0, abs=1e-5)


# ---------------------------------------------------------------------------
# E118 weighted median
# ---------------------------------------------------------------------------
def test_weighted_median_crossing(spark, monkeypatch):
    """Mass-weighted crossing differs from the plain median: prices
    1,2,3 with weights 1,1,8 -> weighted median 3."""
    import dumpty_spark.queries.frontier3 as FR3

    df = spark.createDataFrame(
        [("A", 1, 1, 1.0, 1.0), ("A", 2, 1, 2.0, 1.0), ("A", 3, 1, 3.0, 8.0)],
        "l_returnflag string, l_orderkey long, l_linenumber int, "
        "l_extendedprice double, l_quantity double",
    )
    monkeypatch.setattr(FR3, "load_table", lambda *a: df)
    out = FR3.q_weighted_median(spark, "unused").collect()[0]
    assert out["weighted_median"] == 3.0
    assert out["total_weight"] == 10.0


def test_weighted_median_exact_half_boundary(spark, monkeypatch):
    """cumw == totw/2 exactly at the first row -> that row wins (>=)."""
    import dumpty_spark.queries.frontier3 as FR3

    df = spark.createDataFrame(
        [("A", 1, 1, 1.0, 5.0), ("A", 2, 1, 2.0, 5.0)],
        "l_returnflag string, l_orderkey long, l_linenumber int, "
        "l_extendedprice double, l_quantity double",
    )
    monkeypatch.setattr(FR3, "load_table", lambda *a: df)
    out = FR3.q_weighted_median(spark, "unused").collect()[0]
    assert out["weighted_median"] == 1.0


# ---------------------------------------------------------------------------
# E119 Matryoshka
# ---------------------------------------------------------------------------
def test_matryoshka_overlap_bounds_and_monotone_tendency(spark, sf_t2):
    from dumpty_spark.queries import REGISTRY

    rows = {r["dim"]: r["overlap_at_5"] for r in
            REGISTRY["q_matryoshka_audit"].fn(spark, sf_t2).collect()}
    assert set(rows) == {8, 16, 32}
    for dim, ov in rows.items():
        assert 0.0 <= ov <= 1.0
    # wider prefixes should not be dramatically WORSE (allow jitter)
    assert rows[32] >= rows[8] - 0.2


# ---------------------------------------------------------------------------
# E120 interpolation
# ---------------------------------------------------------------------------
def test_interpolation_exact_linear_fill(spark, monkeypatch):
    """Hours 0 and 3 observed (values 1 and 7): hours 1,2 fill to 3,5;
    the checksum counts them exactly."""
    import dumpty_spark.queries.frontier3 as FR3

    base = dt.datetime(2024, 3, 1)
    rows = [("s", 1, base, 1.0), ("s", 2, base + dt.timedelta(hours=3), 7.0)]
    df = _ev(spark, rows)
    monkeypatch.setattr(FR3, "load_table", lambda *a: df)
    out = FR3.q_interpolate_gaps(spark, "unused").collect()[0]
    assert out["n_hours"] == 4
    assert out["n_filled"] == 2
    assert out["filled_sum"] == pytest.approx(1.0 + 3.0 + 5.0 + 7.0)


def test_interpolation_edges_use_nearest_anchor(spark, monkeypatch):
    """No before-anchor: leading gap can't exist (grid starts at the
    first observation); interior + values verified per hour."""
    import dumpty_spark.queries.frontier3 as FR3
    from dumpty_spark.sources.parquet import load_table as real_load

    base = dt.datetime(2024, 3, 1)
    # two series: one with a 2-hour interior gap, one dense
    rows = [
        ("a", 1, base, 0.0),
        ("a", 2, base + dt.timedelta(hours=3), 9.0),
        ("b", 3, base, 5.0),
        ("b", 4, base + dt.timedelta(hours=1), 5.0),
    ]
    df = _ev(spark, rows)
    monkeypatch.setattr(FR3, "load_table", lambda *a: df)
    out = {r["event_type"]: r for r in FR3.q_interpolate_gaps(spark, "unused").collect()}
    assert out["a"]["n_filled"] == 2
    assert out["a"]["filled_sum"] == pytest.approx(0.0 + 3.0 + 6.0 + 9.0)
    assert out["b"]["n_filled"] == 0
    assert out["b"]["filled_sum"] == pytest.approx(10.0)
