"""Round-9: Cohen's kappa inter-rater agreement."""

from dumpty_spark.queries import REGISTRY


def test_cohens_kappa_closed_form(spark, sf_smoke):
    r = REGISTRY["q_cohens_kappa"].fn(spark, sf_smoke).first()
    assert r["a"] + r["b"] + r["c"] + r["d"] == r["n"]
    po = (r["a"] + r["d"]) / r["n"]
    pe = (
        (r["a"] + r["b"]) * (r["a"] + r["c"])
        + (r["c"] + r["d"]) * (r["b"] + r["d"])
    ) / r["n"] ** 2
    assert abs(r["p_observed"] - po) < 1e-6
    assert abs(r["kappa"] - (po - pe) / (1 - pe)) < 1e-5
    assert -1.0 <= r["kappa"] <= 1.0


def test_cohens_kappa_perfect_agreement_is_one(spark, sf_smoke):
    """Degenerate check via the closed form: if both raters were the
    same rule, a=n or a+d=n and kappa=1 — recompute kappa from the
    contingency with r2:=r1 by reusing the engine's own marginals."""
    r = REGISTRY["q_cohens_kappa"].fn(spark, sf_smoke).first()
    # self-agreement contingency: diag = rater-1 marginals
    a, d = r["a"] + r["b"], r["c"] + r["d"]
    n = r["n"]
    po = (a + d) / n
    pe = (a * a + d * d) / n**2
    assert po == 1.0
    assert abs((po - pe) / (1 - pe) - 1.0) < 1e-12
