"""CEP sequence pattern semantics (queries/relational6.py, EXT E69)."""

from __future__ import annotations

from datetime import datetime

import pytest

from dumpty_spark.queries.relational6 import sequence_match


def _ev(spark, rows):
    """rows: (user_id, minute_offset, event_type)."""
    data = [
        (i, datetime(2024, 1, 1, 12, m), u, t, 1.0, "{}")
        for i, (u, m, t) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )


def _result(df):
    return {
        r["user_id"]: (r["n_views"], r["n_conversions"], r["avg_latency_sec"])
        for r in df.collect()
    }


def test_basic_conversion_within_window(spark):
    out = _result(
        sequence_match(_ev(spark, [(1, 0, "view"), (1, 10, "purchase")]))
    )
    assert out[1] == (1, 1, 600.0)


def test_purchase_outside_window_not_matched(spark):
    out = _result(
        sequence_match(_ev(spark, [(1, 0, "view"), (1, 31, "purchase")]))
    )
    assert out[1] == (1, 0, None)


def test_error_between_blocks_match(spark):
    out = _result(
        sequence_match(
            _ev(spark, [(1, 0, "view"), (1, 5, "error"), (1, 10, "purchase")])
        )
    )
    assert out[1] == (1, 0, None)


def test_error_after_purchase_does_not_block(spark):
    out = _result(
        sequence_match(
            _ev(spark, [(1, 0, "view"), (1, 10, "purchase"), (1, 15, "error")])
        )
    )
    assert out[1] == (1, 1, 600.0)


def test_error_before_view_does_not_block(spark):
    out = _result(
        sequence_match(
            _ev(spark, [(1, 0, "error"), (1, 1, "view"), (1, 10, "purchase")])
        )
    )
    assert out[1] == (1, 1, 540.0)


def test_matches_first_purchase_not_best(spark):
    # two purchases after the view: latency measured to the FIRST
    out = _result(
        sequence_match(
            _ev(
                spark,
                [(1, 0, "view"), (1, 20, "purchase"), (1, 25, "purchase")],
            )
        )
    )
    assert out[1] == (1, 1, 1200.0)


def test_users_are_independent(spark):
    # user 2's error must not block user 1's conversion
    out = _result(
        sequence_match(
            _ev(
                spark,
                [
                    (1, 0, "view"),
                    (2, 5, "error"),
                    (1, 10, "purchase"),
                    (2, 0, "view"),
                    (2, 10, "purchase"),
                ],
            )
        )
    )
    assert out[1] == (1, 1, 600.0)
    assert out[2] == (1, 0, None)


def test_multiple_views_share_downstream_purchase(spark):
    # both views convert on the same purchase; latencies averaged
    out = _result(
        sequence_match(
            _ev(spark, [(1, 0, "view"), (1, 5, "view"), (1, 10, "purchase")])
        )
    )
    assert out[1] == (2, 2, pytest.approx(450.0))
