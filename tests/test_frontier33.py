"""Round-8 batch 8: approximate neighborhood function (ANF/HyperBall)."""

from pyspark.sql import functions as F

from dumpty_spark.queries import REGISTRY


def test_fm_mask_math():
    # mask isolates the lowest set bit; R is the lowest ZERO bit index
    for h, want_mask in [(0b1011, 0b1), (0b1010, 0b10), (0b1000, 0b1000)]:
        assert h & -h == want_mask
    for m, want_r in [(0b0, 0), (0b1, 1), (0b111, 3), (0b1011, 2)]:
        assert bin(m & ~(m + 1)).count("1") == want_r


def test_anf_curve_invariants(spark, sf_smoke):
    rows = REGISTRY["q_neighborhood_function"].fn(spark, sf_smoke).collect()
    assert [r["t"] for r in rows] == [0, 1, 2, 3]
    n0 = rows[0]["n_nodes"]
    assert all(r["n_nodes"] == n0 for r in rows)
    # masks only gain bits, so the estimated curve is non-decreasing
    sums = [r["nf_sum_micro"] for r in rows]
    assert sums == sorted(sums)
    assert all(r["avg_ball"] >= 0.5 for r in rows)


def test_anf_per_node_monotone_and_t1_accuracy(spark, sf_smoke):
    from dumpty_spark.operators.graph import anf_estimates
    from dumpty_spark.queries.shared_graph import copurchase_symmetric

    edges = copurchase_symmetric(spark, sf_smoke)
    ests = anf_estimates(edges, rounds=1, k_masks=8)
    per_node = (
        ests.groupBy("node")
        .pivot("t", [0, 1])
        .agg(F.first("est_micro"))
        .collect()
    )
    assert all(r["1"] >= r["0"] for r in per_node)
    # t=1 truth is exactly degree+1; FM with K=8 is coarse per node but
    # the corpus-level mean must land in a generous envelope
    deg = {
        r["u"]: r["d"]
        for r in edges.groupBy("u").agg(F.count("*").alias("d")).collect()
    }
    est_mean = sum(r["1"] for r in per_node) / (10000.0 * len(per_node))
    true_mean = sum(deg.values()) / len(deg) + 1.0
    assert 0.4 * true_mean <= est_mean <= 2.5 * true_mean


def test_anf_two_regime_equality(spark, sf_smoke, monkeypatch):
    """The broadcast and shuffle regimes must return identical
    estimates — the regime is a plan choice, never a semantics one."""
    from dumpty_spark.operators import telemetry
    from dumpty_spark.operators.graph import anf_estimates
    from dumpty_spark.queries.shared_graph import copurchase_symmetric

    edges = copurchase_symmetric(spark, sf_smoke)

    telemetry.LAST.clear()
    small = {
        (r["t"], r["node"]): r["est_micro"]
        for r in anf_estimates(edges, rounds=2).collect()
    }
    assert telemetry.LAST["anf"]["regime"] == "broadcast"

    telemetry.LAST.clear()
    monkeypatch.setenv("SPARK_GRAFT_FORCE_DISTRIBUTED", "1")
    big = {
        (r["t"], r["node"]): r["est_micro"]
        for r in anf_estimates(edges, rounds=2).collect()
    }
    assert telemetry.LAST["anf"]["regime"] == "distributed"
    assert small == big
