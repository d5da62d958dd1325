"""Round-7 batch (E173-E175) value/plan contracts at smoke scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.test_plans import plan_of

from dumpty_spark.queries import REGISTRY


def test_peak_concurrency_bounds(spark, sf_smoke):
    from dumpty_spark.sources.parquet import load_table

    rows = REGISTRY["q_peak_concurrency"].fn(spark, sf_smoke).collect()
    ev = load_table(spark, sf_smoke, "events")
    per_type = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert {r["event_type"] for r in rows} == set(per_type)
    for r in rows:
        # peak is at least 1 and can never exceed the interval count
        assert 1 <= r["peak"] <= per_type[r["event_type"]]


def test_peak_concurrency_window_is_partitioned(spark, sf_smoke):
    """The sweep's cumulative window partitions on event_type — the
    event-sized frame must never collapse to a single partition."""
    df = REGISTRY["q_peak_concurrency"].fn(spark, sf_smoke)
    plan = plan_of(df)
    assert "SinglePartition" not in plan


def test_chunk_dedup_accounting(spark, sf_smoke):
    rows = REGISTRY["q_chunk_dedup"].fn(spark, sf_smoke).collect()
    total_kept = sum(r["n_kept"] for r in rows)
    total_distinct_ub = sum(r["n_distinct"] for r in rows)
    for r in rows:
        assert 0 < r["n_kept"] <= r["n_distinct"] <= r["n_chunks"]
        assert 0.0 <= r["drop_frac"] < 1.0
    # global keep-first keeps exactly one chunk per distinct hash:
    # summed kept == corpus-wide distinct hashes <= summed per-source
    assert total_kept <= total_distinct_ub


def test_mg_store_guarantees(spark, sf_smoke):
    rows = REGISTRY["q_mg_topk_store"].fn(spark, sf_smoke).collect()
    assert rows and all(r["no_overestimate"] for r in rows)
    assert all(r["within_bound"] for r in rows)
    ests = [r["est"] for r in rows]
    assert ests == sorted(ests, reverse=True)


def test_mg_batch_offset_and_merge_unit(spark):
    """Hand-computable MG: 30 a, 20 b, 3 c, 2 d with k=2 — the 3rd
    largest count (3) offsets everyone; survivors a:27, b:17."""
    from dumpty_spark.operators.mg import mg_batch

    data = (
        [("a",)] * 30 + [("b",)] * 20 + [("c",)] * 3 + [("d",)] * 2
    )
    df = spark.createDataFrame(data, ["k"])
    got = {
        r["key"]: r["est"] for r in mg_batch(df, "k", 2, "b0").collect()
    }
    assert got == {"a": 27, "b": 17}
