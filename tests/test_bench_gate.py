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


def test_adjudicate_clears_ambient_suite_spikes():
    """A suite-time spike that re-times clean solo is recorded but cleared."""
    from bench import adjudicate_flags

    candidates = {"q_spiky": [4.0, 14.0]}  # 3.5x in-suite
    standing, cleared = adjudicate_flags(candidates, solo_timer=lambda name: 4.2)
    assert standing == {}
    assert cleared == {"q_spiky": {"base": 4.0, "suite": 14.0, "solo": 4.2}}


def test_adjudicate_keeps_real_regressions():
    """Synthetic slowdown: solo re-time still exceeds the gate -> stands."""
    from bench import adjudicate_flags

    candidates = {"q_slow": [4.0, 14.0]}
    standing, cleared = adjudicate_flags(candidates, solo_timer=lambda name: 13.5)
    assert cleared == {}
    assert standing == {"q_slow": {"base": 4.0, "suite": 14.0, "solo": 13.5}}
    # both regimes recorded so the artifact shows the adjudication
    assert standing["q_slow"]["suite"] == 14.0 and standing["q_slow"]["solo"] == 13.5


def test_adjudicate_same_double_gate_as_find_regressions():
    """Solo at 1.4x base (under ratio) or +0.9s (under abs slack) clears."""
    from bench import adjudicate_flags

    standing, cleared = adjudicate_flags(
        {"q": [2.0, 9.0]}, solo_timer=lambda n: 2.8  # 1.4x -> under ratio
    )
    assert not standing and "q" in cleared
    standing, cleared = adjudicate_flags(
        {"q": [0.5, 9.0]}, solo_timer=lambda n: 1.3  # 2.6x but +0.8s abs
    )
    assert not standing and "q" in cleared
