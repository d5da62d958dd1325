"""Round-8 batches 2-3: HITS, FD profiler, MASE, assortativity,
modularity, BLEU, Theil-Sen, perplexity — value/contract pins beyond
the oracle hashes."""

from pyspark.sql import functions as F

from dumpty_spark.queries import REGISTRY


def test_hits_integer_scores_and_sides(spark, sf_smoke):
    rows = REGISTRY["q_hits_scores"].fn(spark, sf_smoke).collect()
    sides = {r["side"] for r in rows}
    assert sides == {"hub", "auth"}
    for side in sides:
        sub = sorted(
            (r for r in rows if r["side"] == side), key=lambda r: r["rnk"]
        )
        scores = [r["score"] for r in sub]
        assert scores == sorted(scores, reverse=True)
        assert all(isinstance(s, int) and s > 0 for s in scores)
        assert [r["rnk"] for r in sub] == list(range(1, len(sub) + 1))


def test_hits_hand_graph(spark):
    """Star: supplier 1 serves customers 10,11,12; supplier 2 serves 10.
    auth(10) after one step = hub mass; integer path counts exact."""
    from dumpty_spark.queries.frontier27 import q_hits_scores  # noqa: F401

    edges = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 10)], ["u", "v"]
    )
    a1 = edges.groupBy("v").agg(F.count("*").alias("s"))
    h1 = (
        edges.join(F.broadcast(a1), "v").groupBy("u").agg(F.sum("s").alias("s"))
    )
    got = {r["u"]: r["s"] for r in h1.collect()}
    # hub(1) = auth1(10)+auth1(11)+auth1(12) = 2+1+1; hub(2) = auth1(10) = 2
    assert got == {1: 4, 2: 2}


def test_fd_profile_expected_verdicts(spark, sf_smoke):
    rows = {r["fd"]: r for r in REGISTRY["q_fd_profile"].fn(spark, sf_smoke).collect()}
    assert rows["orders_key_priority"]["holds"]  # key LHS
    # the fixture's (l_orderkey, l_linenumber) is NOT unique — the
    # composite candidate is high-confidence but genuinely violated,
    # which is what a profiler exists to surface
    comp = rows["lineitem_composite_part"]
    assert not comp["holds"] and comp["confidence"] > 0.5
    assert not rows["events_user_type"]["holds"]
    for r in rows.values():
        assert 0 < r["confidence"] <= 1.0
        assert (r["g3_violations"] == 0) == r["holds"]


def test_seasonal_naive_mase_identities(spark, sf_smoke):
    rows = REGISTRY["q_seasonal_naive_mase"].fn(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r["n_test"] == 7
        assert r["test_abs_err"] >= 0 and r["train_abs_err"] >= 0
        if r["mase"] is not None:
            assert r["mase"] >= 0
        assert 0 <= r["test_smape_micro"] <= 7 * 2_000_000


def test_degree_assortativity_bounds(spark, sf_smoke):
    r = REGISTRY["q_degree_assortativity"].fn(spark, sf_smoke).first()
    assert -1.0 <= r["assortativity"] <= 1.0
    assert r["n_stubs"] % 2 == 0  # both directions of every pair
    assert r["max_deg"] >= 1


def test_modularity_bounds_and_consistency(spark, sf_smoke):
    r = REGISTRY["q_modularity_score"].fn(spark, sf_smoke).first()
    assert -0.5 <= r["modularity"] <= 1.0
    assert 0 <= r["within_edges"] <= r["m_edges"]
    assert r["sum_deg_sq"] >= 0 and r["n_communities"] >= 1


def test_bleu_pairs_identities(spark, sf_smoke):
    r = REGISTRY["q_bleu_pairs"].fn(spark, sf_smoke).first()
    assert r["p1_hits"] <= r["p1_total"]
    assert r["p2_hits"] <= r["p2_total"]
    assert 0 < r["bleu2"] <= 1.0
    assert r["n_pairs"] > 0


def test_theilsen_counts_partition(spark, sf_smoke):
    r = REGISTRY["q_theilsen_trend"].fn(spark, sf_smoke).first()
    assert r["n_pairs"] == r["n_days"] * (r["n_days"] - 1) // 2
    assert r["n_up"] + r["n_down"] + r["n_flat"] == r["n_pairs"]
    assert -1.0 <= r["kendall_tau"] <= 1.0
    assert abs(r["slope_per_day"] - r["median_slope_micro"] / 1e6) < 1e-9


def test_bigram_perplexity_floor(spark, sf_smoke):
    rows = REGISTRY["q_bigram_perplexity"].fn(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r["perplexity"] >= 1.0
        assert r["avg_logprob"] <= 0.0
        assert r["n_bigrams"] > 0
