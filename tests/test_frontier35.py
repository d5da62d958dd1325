"""Round-8 batch 10: fertility, split finder, Shapley attribution."""

from dumpty_spark.queries import REGISTRY


def test_fertility_bounds(spark, sf_smoke):
    rows = REGISTRY["q_tokenizer_fertility"].fn(spark, sf_smoke).collect()
    assert len(rows) >= 1
    for r in rows:
        # every [a-z0-9]+ word contributes >= 1 estimated token
        assert r["tokens"] >= r["words"] >= 1
        assert r["fertility"] >= 1.0
        assert r["chars_per_token"] > 0


def test_split_finder_gain_ranking(spark, sf_smoke):
    from dumpty_spark.sources import load_table

    rows = REGISTRY["q_split_finder"].fn(spark, sf_smoke).collect()
    assert len(rows) == 5
    gains = [r["gain"] for r in rows]
    assert gains == sorted(gains, reverse=True)
    total = load_table(spark, sf_smoke, "events").count()
    for r in rows:
        assert r["n_left"] + r["n_right"] == total
        assert 0.0 <= r["gain"] <= 1.0
        assert 0 <= r["pos_left"] <= r["n_left"]
        assert 1 <= r["split_bin"] <= 63


def test_shapley_efficiency_and_shares(spark, sf_smoke):
    rows = REGISTRY["q_shapley_attribution"].fn(spark, sf_smoke).collect()
    assert [r["channel"] for r in rows] == ["click", "error", "signup", "view"]
    shares = [r["share"] for r in rows if r["share"] is not None]
    if shares:
        assert abs(sum(shares) - 1.0) < 1e-4
    # Shapley efficiency: sum of phis = v(full) - v(empty); both are
    # bounded by the max per-user purchase intensity, so phis are finite
    # and the sum has the sign of the grand-coalition lift
    total = sum(r["shapley"] for r in rows)
    assert abs(total) < 1e6
