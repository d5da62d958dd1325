"""Round-8 batch 11: Wilson ranking, EB shrinkage, shard rebalance."""

from dumpty_spark.queries import REGISTRY


def test_wilson_bound_properties(spark, sf_smoke):
    rows = REGISTRY["q_wilson_ranking"].fn(spark, sf_smoke).collect()
    assert 1 <= len(rows) <= 20
    lbs = [r["wilson_lb"] for r in rows]
    assert lbs == sorted(lbs, reverse=True)
    for r in rows:
        # the lower bound is strictly below the naive rate unless p=0
        assert r["wilson_lb"] <= r["naive_rate"]
        assert 0.0 <= r["wilson_lb"] <= 1.0
        assert 0 <= r["ok"] <= r["n"]


def test_eb_shrinkage_pulls_toward_global(spark, sf_smoke):
    rows = REGISTRY["q_eb_shrinkage"].fn(spark, sf_smoke).collect()
    assert len(rows) >= 2
    # weighted global mean reconstructed from the raw means
    nn = sum(r["n_docs"] for r in rows)
    m = sum(r["raw_mean"] * r["n_docs"] for r in rows) / nn
    for r in rows:
        assert 0.0 <= r["b_weight"] <= 1.0
        # shrunken mean lies between the raw mean and the global mean
        lo, hi = sorted((r["raw_mean"], m))
        assert lo - 1e-4 <= r["shrunk_mean"] <= hi + 1e-4


def test_shard_rebalance_hrw_vs_mod(spark, sf_smoke):
    row = REGISTRY["q_shard_rebalance"].fn(spark, sf_smoke).first()
    assert row["n_keys"] >= 1
    # HRW moves ~1/17 of keys; mod moves ~16/17. With small fixtures the
    # envelopes are generous but the ORDER must hold decisively.
    assert row["pct_rdv"] < 0.25
    assert row["pct_mod"] > 0.70
    assert row["moved_rdv"] < row["moved_mod"]
