"""Round-7 batch (E183-E184): API-surface parity contracts."""

from __future__ import annotations

from tests.test_plans import plan_of

from dumpty_spark.queries import REGISTRY


def test_cogroup_asof_equals_relational_asof(spark, sf_smoke):
    """The cogrouped pandas merge must be row-identical to the E6
    relational as-of join on the same user slice — same keys, same
    matches, same values."""
    rel = [
        tuple(r)
        for r in REGISTRY["q_asof_join"].fn(spark, sf_smoke).collect()
        if r["user_id"] < 30  # the cogroup demo's bounded slice
    ]
    cg = [
        tuple(r)
        for r in REGISTRY["q_cogroup_asof"].fn(spark, sf_smoke).collect()
    ]
    assert sorted(rel) == sorted(cg)
    assert cg, "slice produced no purchases at smoke scale"


def test_cogroup_plan_is_arrow_not_row_python(spark, sf_smoke):
    plan = plan_of(REGISTRY["q_cogroup_asof"].fn(spark, sf_smoke))
    assert "FlatMapCoGroupsInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_arrow_lengths_plan_and_values(spark, sf_smoke):
    from pyspark.sql import functions as F

    from dumpty_spark.sources import load_table

    plan = plan_of(REGISTRY["q_arrow_lengths"].fn(spark, sf_smoke))
    assert "MapInArrow" in plan or "PythonMapInArrow" in plan
    rows = REGISTRY["q_arrow_lengths"].fn(spark, sf_smoke).collect()
    docs = load_table(spark, sf_smoke, "documents")
    total_chars = docs.agg(F.sum(F.length("text"))).first()[0]
    assert sum(r["chars"] for r in rows) == total_chars
    for r in rows:
        assert r["bytes"] >= r["chars"]  # utf8 bytes never fewer than chars
