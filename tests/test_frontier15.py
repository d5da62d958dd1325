"""Round-7 batch (E169-E172) value/plan contracts at smoke scale."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.test_plans import plan_of

from dumpty_spark.queries import REGISTRY


def test_irls_converges_to_base_rate_intercept(spark, sf_smoke):
    """With a near-uninformative feature, the intercept must land on
    logit(base purchase rate) — the closed-form optimum — and log-loss
    at or below the base-rate entropy."""
    from dumpty_spark.sources.parquet import load_table

    row = REGISTRY["q_logistic_irls"].fn(spark, sf_smoke).first()
    ev = load_table(spark, sf_smoke, "events")
    rate = (
        ev.agg(
            F.avg((F.col("event_type") == "purchase").cast("double"))
        ).first()[0]
    )
    base_entropy = -(rate * math.log(rate) + (1 - rate) * math.log(1 - rate))
    assert abs(row["coef_a"] - math.log(rate / (1 - rate))) < 0.2
    assert row["log_loss"] <= base_entropy + 1e-6


def test_irls_plan_is_partial_agg_no_python(spark, sf_smoke):
    plan = plan_of(REGISTRY["q_logistic_irls"].fn(spark, sf_smoke))
    assert "BatchEvalPython" not in plan
    assert "HashAggregate" in plan


def test_kanonymity_consistency(spark, sf_smoke):
    row = REGISTRY["q_kanonymity_audit"].fn(spark, sf_smoke).first()
    assert row["n_classes"] > 0 and row["min_class_size"] >= 1
    assert 0.0 <= row["frac_below_k"] <= 1.0
    assert row["k_anonymous"] == (row["min_class_size"] >= 5)
    assert row["l_diverse"] == (row["min_l_diversity"] >= 2)


def test_golden_record_priorities(spark, sf_smoke):
    """crm (prio 1) wins every field it has; its deterministic NULLs
    fall through to web (prio 2), then legacy (prio 3)."""
    rows = {
        r["c_custkey"]: r
        for r in REGISTRY["q_golden_record"].fn(spark, sf_smoke).collect()
    }
    from dumpty_spark.sources.parquet import load_table

    cust = {
        r["c_custkey"]: r
        for r in load_table(spark, sf_smoke, "customer")
        .filter(F.col("c_custkey") < 300)
        .collect()
    }
    for k, r in rows.items():
        c = cust[k]
        if k % 5 != 0:
            assert r["golden_name"] == c["c_name"]  # crm wins
        elif k % 4 != 1:
            assert r["golden_name"] == c["c_name"]  # web fallback
        else:
            assert r["golden_name"] == c["c_name"].upper()  # legacy only
        assert r["golden_segment"] == c["c_mktsegment"]  # crm always has seg
        # record count: 2 base + web unless k%4==1
        assert r["n_records"] == (2 if k % 4 == 1 else 3)


def test_schema_evolution_null_fills_old_batch(spark, sf_smoke):
    rows = {
        r["batch"]: r
        for r in REGISTRY["q_schema_evolution"].fn(spark, sf_smoke).collect()
    }
    assert rows["b1"]["n_quality"] == 0  # old files null-filled
    assert rows["b2"]["n_quality"] == rows["b2"]["n_rows"]
