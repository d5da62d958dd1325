"""Round-7 batch (E164-E168) value/plan contracts at smoke scale — the
sf0.01 hash match is the driver's job; here we pin scale-design and
semantic invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.test_plans import plan_of

from dumpty_spark.queries import REGISTRY


def test_ndcg_bounds_and_ideal(spark, sf_smoke):
    row = REGISTRY["q_ndcg_eval"].fn(spark, sf_smoke).first()
    assert 0.0 <= row["ndcg"] <= 1.0
    assert row["idcg"] >= row["dcg"] >= 0.0
    assert 0 < row["n_ranked"] <= 10


def test_negative_sampling_excludes_same_source(spark, sf_smoke):
    from dumpty_spark.sources.parquet import load_table

    out = REGISTRY["q_negative_sampling"].fn(spark, sf_smoke)
    docs = load_table(spark, sf_smoke, "documents").select(
        F.col("doc_id").alias("anchor_id"), F.col("source").alias("a_src")
    )
    joined = out.join(docs, "anchor_id")
    assert joined.filter(F.col("neg_source") == F.col("a_src")).count() == 0
    # exactly 5 negatives per anchor, ranks 1..5
    per = out.groupBy("anchor_id").agg(
        F.count("*").alias("n"), F.max("rnk").alias("mx")
    )
    assert per.filter((F.col("n") != 5) | (F.col("mx") != 5)).count() == 0


def test_negative_sampling_deterministic(spark, sf_smoke):
    a = sorted(map(tuple, REGISTRY["q_negative_sampling"].fn(spark, sf_smoke).collect()))
    b = sorted(map(tuple, REGISTRY["q_negative_sampling"].fn(spark, sf_smoke).collect()))
    assert a == b


def test_bitmap_distinct_matches_exact_and_never_expands(spark, sf_smoke):
    from dumpty_spark.sources.parquet import load_table

    out = {
        r["event_type"]: r["n_users"]
        for r in REGISTRY["q_bitmap_distinct"].fn(spark, sf_smoke).collect()
    }
    ev = load_table(spark, sf_smoke, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["__all__"] = ev.select("user_id").distinct().count()
    assert out == exact
    # the plan must carry bitmap partials, never a distinct expand
    plan = plan_of(REGISTRY["q_bitmap_distinct"].fn(spark, sf_smoke))
    assert "Expand" not in plan
    assert "count(distinct" not in plan.lower()


def test_dp_release_noise_is_laplace_shaped(spark, sf_smoke):
    rows = REGISTRY["q_dp_release"].fn(spark, sf_smoke).collect()
    assert all(r["abs_noise"] >= 0 for r in rows)
    # P(|Laplace(1)| > 25) = e^-25 — a failure here means broken math
    assert all(r["abs_noise"] < 25 for r in rows)


def test_coverage_selection_greedy_invariants(spark, sf_smoke):
    rows = REGISTRY["q_coverage_selection"].fn(spark, sf_smoke).collect()
    assert [r["round"] for r in rows] == list(range(1, len(rows) + 1))
    gains = [r["gain"] for r in rows]
    # marginal gains of greedy max-coverage are non-increasing
    assert all(a >= b for a, b in zip(gains, gains[1:]))
    # picks are distinct and cumulative coverage telescopes
    assert len({r["doc_id"] for r in rows}) == len(rows)
    assert rows[-1]["covered_cum"] == sum(gains)
