"""E179 MMR diversified re-rank contracts at smoke scale."""

from __future__ import annotations

from dumpty_spark.queries import REGISTRY


def test_mmr_first_pick_is_most_relevant_and_diversity_binds(spark, sf_smoke):
    rows = REGISTRY["q_mmr_rerank"].fn(spark, sf_smoke).collect()
    assert [r["round"] for r in rows] == [1, 2, 3, 4, 5]
    # round 1 has no penalty and must be the relevance argmax
    assert rows[0]["penalty"] == 0.0
    assert rows[0]["rel"] == max(r["rel"] for r in rows)
    # later rounds pay a diversity penalty (max cosine to the selected
    # set — can be negative when the pick is anti-correlated with every
    # prior pick); mmr = lam*rel - (1-lam)*pen always
    for r in rows[1:]:
        assert -1.0 <= r["penalty"] <= 1.0
        assert abs(r["mmr"] - round(0.7 * r["rel"] - 0.3 * r["penalty"], 4)) <= 1e-9
    # picks are distinct
    assert len({r["doc_id"] for r in rows}) == 5
