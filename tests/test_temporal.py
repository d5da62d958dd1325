"""Edge semantics of the temporal joins (operators/temporal.py):
backward-inclusive as-of matching, null fill on no-match, and the
half-open [ts-w, ts) range-join window — asserted on hand-built frames
where every boundary case is planted."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from dumpty_spark.operators.temporal import asof_join, range_join_count


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, ts("2024-01-01 10:00:00")),  # exact tie with right r2
            (2, 10, ts("2024-01-01 09:00:00")),  # between r1 and r2
            (3, 10, ts("2024-01-01 07:00:00")),  # before all rights -> null
            (4, 99, ts("2024-01-01 10:00:00")),  # key with no rights -> null
        ],
        "lid long, k long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (101, 10, ts("2024-01-01 08:00:00"), 1.0),  # r1
            (102, 10, ts("2024-01-01 10:00:00"), 2.0),  # r2 (ties lid=1)
            (103, 10, ts("2024-01-01 11:00:00"), 3.0),  # after everything
        ],
        "rid long, k long, ts timestamp_ntz, v double",
    )
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _frames(spark)
    out = {
        r["lid"]: (r["rid_r"], r["v_r"])
        for r in asof_join(left, right, on=["k"]).collect()
    }
    assert out[1] == (102, 2.0)  # equal ts matches (inclusive)
    assert out[2] == (101, 1.0)  # latest at-or-before, not the later one
    assert out[3] == (None, None)  # nothing at-or-before
    assert out[4] == (None, None)  # key absent on right
    assert len(out) == 4  # left-join: every left row exactly once


def test_asof_keeps_left_ts_and_attaches_right_ts(spark):
    left, right = _frames(spark)
    row = (
        asof_join(left, right, on=["k"])
        .filter(F.col("lid") == 2)
        .select("ts", "ts_r")
        .first()
    )
    assert row["ts"] == ts("2024-01-01 09:00:00")
    assert row["ts_r"] == ts("2024-01-01 08:00:00")


def test_range_join_half_open_window(spark):
    left = spark.createDataFrame(
        [(1, 10, ts("2024-01-01 10:00:00"))],
        "lid long, k long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (10, ts("2024-01-01 09:00:00")),  # == ts - w: INCLUDED
            (10, ts("2024-01-01 09:30:00")),  # inside
            (10, ts("2024-01-01 10:00:00")),  # == ts: EXCLUDED (strict <)
            (10, ts("2024-01-01 08:59:59")),  # just before window
            (99, ts("2024-01-01 09:30:00")),  # other key
        ],
        "k long, ts timestamp_ntz",
    )
    out = range_join_count(left, right, on=["k"], window_s=3600).collect()
    assert len(out) == 1 and out[0]["n_in_range"] == 2


def test_range_join_zero_and_bucket_straddle(spark):
    # right rows one bucket below the left bucket must still be found
    left = spark.createDataFrame(
        [(1, 10, ts("2024-01-01 10:00:30")), (2, 20, ts("2024-01-01 10:00:00"))],
        "lid long, k long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(10, ts("2024-01-01 09:59:45"))],  # previous bucket, inside window
        "k long, ts timestamp_ntz",
    )
    out = {
        r["lid"]: r["n_in_range"]
        for r in range_join_count(left, right, on=["k"], window_s=60).collect()
    }
    assert out[1] == 1
    assert out[2] == 0  # no rights at all for key 20 -> count 0, row kept


def test_asof_directions_and_tie(spark):
    """Direction semantics at the boundaries: backward takes <=, forward
    takes >=, nearest takes the closer side and resolves an exact tie
    backward (pandas rule)."""
    import pytest
    from pyspark.sql import functions as F

    from dumpty_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 100), (1, 205), (1, 310)], ["k", "t"]
    ).select("k", F.col("t").cast("long").alias("t"))
    right = spark.createDataFrame(
        [(1, 100, "a"), (1, 200, "b"), (1, 300, "c")], ["k", "t", "v"]
    )

    def got(direction):
        out = asof_join(
            left, right, on=["k"], left_ts="t", right_ts="t",
            direction=direction,
        )
        return {r["t"]: r["v_r"] for r in out.collect()}

    assert got("backward") == {100: "a", 205: "b", 310: "c"}
    assert got("forward") == {100: "a", 205: "c", 310: None}
    # 205 is 5 from b(200) vs 95 from c(300) -> b; 310 only has c behind
    assert got("nearest") == {100: "a", 205: "b", 310: "c"}

    # exact midpoint: 250 is 50 from both b and c -> backward wins
    mid = spark.createDataFrame([(1, 250)], ["k", "t"])
    out = asof_join(mid, right, on=["k"], left_ts="t", right_ts="t",
                    direction="nearest")
    assert out.collect()[0]["v_r"] == "b"

    with pytest.raises(ValueError):
        asof_join(left, right, on=["k"], direction="sideways")


def test_asof_tolerance_bounds_matches(spark):
    """tolerance reverts matches farther than the bound to NULL, in all
    three directions (numeric keys here; interval Columns for
    timestamps)."""
    from pyspark.sql import functions as F

    from dumpty_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 205), (1, 400)], ["k", "t"])
    right = spark.createDataFrame(
        [(1, 200, "b"), (1, 300, "c")], ["k", "t", "v"]
    )

    def got(direction, tol):
        out = asof_join(
            left, right, on=["k"], left_ts="t", right_ts="t",
            direction=direction, tolerance=F.lit(tol),
        )
        return {r["t"]: r["v_r"] for r in out.collect()}

    assert got("backward", 10) == {205: "b", 400: None}   # 400-300=100 > 10
    assert got("backward", 100) == {205: "b", 400: "c"}
    assert got("forward", 10) == {205: None, 400: None}    # 300-205=95 > 10
    assert got("forward", 95) == {205: "c", 400: None}
    assert got("nearest", 5) == {205: "b", 400: None}
    assert got("nearest", 100) == {205: "b", 400: "c"}


def test_asof_null_payload_row_consistency(spark):
    """A matched right row with a NULL payload value must yield NULL —
    never a spliced-in value from an older row (whole-row struct fill);
    with tolerance, the bound applies to the row the payload came from."""
    from pyspark.sql import functions as F

    from dumpty_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 205)], ["k", "t"])
    right = spark.createDataFrame(
        [(1, 100, "a"), (1, 200, None)], ["k", "t", "v"]
    )
    out = asof_join(left, right, on=["k"], left_ts="t", right_ts="t")
    assert out.collect()[0]["v_r"] is None  # matched row t=200 has NULL v

    tol = asof_join(
        left, right, on=["k"], left_ts="t", right_ts="t",
        tolerance=F.lit(10),
    )
    assert tol.collect()[0]["v_r"] is None  # not 'a' from 105 away

    import pytest

    with pytest.raises(ValueError, match="tolerance"):
        asof_join(left, right, on=["k"], left_ts="t", right_ts="t",
                  tolerance=-5)


def test_resample_ffill_grid_and_fill(spark):
    """Gap-fill: dense hourly grid per key spanning [min,max], observed
    buckets keep their sum, gaps carry the last value forward with
    is_gap=1, and keys never bleed into each other."""
    from dumpty_spark.operators.temporal import resample_ffill

    rows = [
        # key 'a': hours 0, 3 observed -> 1,2 are gaps filled with 10.0
        ("a", "2024-01-01 00:10:00", 4.0),
        ("a", "2024-01-01 00:50:00", 6.0),
        ("a", "2024-01-01 03:00:00", 7.0),
        # key 'b': single hour -> single-row series, no gaps
        ("b", "2024-01-05 12:30:00", 1.5),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"]).selectExpr(
        "k", "CAST(ts AS TIMESTAMP) AS ts", "v"
    )
    out = resample_ffill(df, "k", "ts", "v", "1 hour")
    got = {
        (r["k"], str(r["bucket_ts"]), r["value_filled"], r["is_gap"])
        for r in out.collect()
    }
    assert got == {
        ("a", "2024-01-01 00:00:00", 10.0, 0),
        ("a", "2024-01-01 01:00:00", 10.0, 1),
        ("a", "2024-01-01 02:00:00", 10.0, 1),
        ("a", "2024-01-01 03:00:00", 7.0, 0),
        ("b", "2024-01-05 12:00:00", 1.5, 0),
    }
