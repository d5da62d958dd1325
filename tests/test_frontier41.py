"""Round-8 batch 16: approx-percentile accuracy ladder."""

from dumpty_spark.queries import REGISTRY


def test_quantile_ladder_guarantees(spark, sf_smoke):
    rows = REGISTRY["q_quantile_accuracy_ladder"].fn(spark, sf_smoke).collect()
    assert [r["accuracy"] for r in rows] == [100, 1000, 10000]
    n0 = rows[0]["n_rows"]
    assert n0 >= 1
    for r in rows:
        assert r["n_rows"] == n0
        assert r["p50_ok"] and r["p90_ok"] and r["p99_ok"]
