"""Tighten-only baseline ratchet (scripts/ratchet_baseline.py) — the
policy BASELINE.md documents, pinned as code: faster tightens, slower
never loosens, first measurements enter as-is, streak state travels."""

from scripts.ratchet_baseline import ratchet


def test_ratchet_rules():
    run = {
        "metric": "total_query_wall_sec",
        "sf": 0.1,
        "queries": {"q_fast": 1.0, "q_slow": 9.0, "q_new": 2.5,
                    "shared_cache:x": 0.4},
        "early_probe_clear_streak": {"q_slow": 1},
    }
    baseline = {"queries": {"q_fast": 1.5, "q_slow": 4.0, "q_gone": 3.0}}
    doc, stats = ratchet(run, baseline)
    q = doc["queries"]
    assert q["q_fast"] == 1.0          # tightened
    assert q["q_slow"] == 4.0          # slower run never loosens
    assert q["q_new"] == 2.5           # first measurement
    assert "q_gone" not in q           # deregistered queries drop
    assert stats == {"tightened": 1, "kept": 1, "added": 2, "dropped": 1}
    assert doc["n_queries"] == 3 and doc["n_shared_caches"] == 1
    assert doc["early_probe_clear_streak"] == {"q_slow": 1}
    assert doc["value"] == round(1.0 + 4.0 + 2.5 + 0.4, 4)
