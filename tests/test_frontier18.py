"""E178 mutual-NN margin mining contracts at smoke scale."""

from __future__ import annotations

from dumpty_spark.queries import REGISTRY


def test_mutual_nn_is_reciprocal_and_one_to_one(spark, sf_smoke):
    rows = REGISTRY["q_mutual_nn_margin"].fn(spark, sf_smoke).collect()
    assert rows
    a_ids = [r["a_id"] for r in rows]
    b_ids = [r["b_id"] for r in rows]
    # top-1 reciprocity makes the matching one-to-one on both sides
    assert len(a_ids) == len(set(a_ids))
    assert len(b_ids) == len(set(b_ids))
    # parity split respected
    assert all(a % 2 == 0 and b % 2 == 1 for a, b in zip(a_ids, b_ids))
    margins = [r["margin"] for r in rows]
    assert margins == sorted(margins, reverse=True)
    # margin > 1 means the pair stands out from its neighborhood — the
    # top-ranked pair must, or the criterion is broken
    assert margins[0] > 1.0
