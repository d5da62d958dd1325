"""Unit tests for bench.py's regression gate (no Spark needed)."""

from __future__ import annotations

from bench import find_regressions


def test_flags_only_double_gate_violations():
    baseline = {"fast": 0.2, "mid": 2.0, "slow": 10.0}
    timings = {
        "fast": 0.9,   # 4.5x but only +0.7s absolute -> noise, not flagged
        "mid": 3.5,    # 1.75x and +1.5s -> flagged
        "slow": 12.0,  # +2s but only 1.2x -> not flagged
        "new": 50.0,   # no baseline -> never flagged
    }
    assert find_regressions(timings, baseline) == {"mid": [2.0, 3.5]}


def test_thresholds_are_parameters():
    baseline = {"q": 1.0}
    assert find_regressions({"q": 1.4}, baseline) == {}
    assert find_regressions({"q": 1.4}, baseline, ratio=1.2, abs_slack_s=0.1) == {
        "q": [1.0, 1.4]
    }


def test_empty_baseline_flags_nothing():
    assert find_regressions({"q": 100.0}, {}) == {}
