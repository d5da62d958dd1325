"""Planner tests (SURVEY §5.3-5.4): property tests on predicate
generation, decision-tree unit tests, and the metamorphic partition-parity
check the reference relies on but never tests."""

from __future__ import annotations

from functools import reduce

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dumpty_spark.plans.planner import (
    TableStats,
    approx_boundaries,
    exact_julienne_boundaries,
    introspect_stats,
    introspect_stats_fast,
    plan_partitions,
    predicates_from_boundaries,
    slice_id_column,
    slice_predicates_as_columns,
)
from dumpty_spark.sources import load_table


@given(st.lists(st.integers(-10**6, 10**6), min_size=1, max_size=20, unique=True))
@settings(max_examples=200, deadline=None)
def test_predicate_strings_cover_domain(bounds):
    bounds = sorted(bounds)
    preds = predicates_from_boundaries("pk", bounds, numeric=True)
    assert len(preds) == len(bounds) + 1
    assert "IS NULL" in preds[0]
    assert all("pk" in p for p in preds)
    # pure-python mirror of the slice semantics: every value lands in
    # exactly one slice
    def slice_of(v):
        hits = []
        for i in range(len(bounds) + 1):
            if i == 0:
                ok = v is None or v <= bounds[0]
            elif i == len(bounds):
                ok = v is not None and v > bounds[-1]
            else:
                ok = v is not None and bounds[i - 1] < v <= bounds[i]
            if ok:
                hits.append(i)
        return hits

    probe = [None, bounds[0], bounds[0] - 1, bounds[-1], bounds[-1] + 1] + bounds
    for v in probe:
        assert len(slice_of(v)) == 1


def test_introspect_and_density_bounds_path(spark, sf_smoke):
    orders = load_table(spark, sf_smoke, "orders")
    stats = introspect_stats(orders, "o_orderkey")
    assert stats.rows == 1500 and stats.pk_numeric
    plan = plan_partitions(stats, rows_per_partition=500)
    # o_orderkey is a dense sequential surrogate key → Spark bounds path
    assert plan.strategy == "bounds"
    assert plan.partitions == 3
    assert plan.lower == stats.min and plan.upper == stats.max


def test_skewed_key_predicates_path(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem")
    stats = introspect_stats(li, "l_orderkey")
    assert stats.rows == 6000
    # duplicate-valued key: rows ≠ max-min → julienne path
    width = 1500
    bounds = exact_julienne_boundaries(li, "l_orderkey", width)
    plan = plan_partitions(stats, rows_per_partition=width, boundaries=bounds)
    assert plan.strategy == "predicates"
    assert len(plan.predicates) == len(bounds) + 1
    assert "IS NULL" in plan.predicates[0]


def test_low_distinct_single_fallback(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem")
    stats = introspect_stats(li, "l_linenumber")
    # l_linenumber has ~7 distinct values → boundary yield < 10% → single
    bounds = exact_julienne_boundaries(li, "l_linenumber", 60)
    plan = plan_partitions(stats, rows_per_partition=60, boundaries=bounds)
    assert plan.strategy == "single"


def test_tiny_table_single(spark, sf_smoke):
    region = load_table(spark, sf_smoke, "region")
    stats = introspect_stats(region, "r_regionkey")
    assert plan_partitions(stats).strategy == "single"


@pytest.mark.parametrize("n_slices", [2, 5, 9])
def test_metamorphic_partition_parity(spark, sf_smoke, n_slices):
    """Extracting in 1 vs N slices must yield the same row multiset —
    the invariant dumpty relies on but never tests (SURVEY §5.4)."""
    li = load_table(spark, sf_smoke, "lineitem")
    # inject NULL pks to exercise P3 routing
    null_rows = li.limit(7).withColumn("l_orderkey", F.lit(None).cast("bigint"))
    df = li.unionByName(null_rows)
    total = df.count()
    width = max(1, total // n_slices)
    bounds = exact_julienne_boundaries(df, "l_orderkey", width)
    slices = slice_predicates_as_columns("l_orderkey", bounds)
    counts = [df.filter(p).count() for p in slices]
    assert sum(counts) == total  # complete, no dup
    # NOTE: the LAST slice (pk > max boundary) may be legitimately empty
    # when the max key is duplicated at the tail — same as the reference.
    assert all(c > 0 for c in counts[:-1])
    # no row escapes every slice
    any_slice = reduce(lambda a, b: a | b, slices)
    assert df.filter(~any_slice).count() == 0
    # slice_id assignment agrees with the predicate slices
    ids = (
        df.withColumn("sid", slice_id_column("l_orderkey", bounds))
        .groupBy("sid")
        .count()
        .orderBy("sid")
        .collect()
    )
    by_sid = {r["sid"]: r["count"] for r in ids}
    assert [by_sid.get(i, 0) for i in range(len(counts))] == counts


def test_approx_boundaries_close_to_exact(spark, sf_t2):
    li = load_table(spark, sf_t2, "lineitem")
    n = 8
    total = li.count()
    approx = approx_boundaries(li, "l_orderkey", n)
    # slices from approx boundaries are within 25% of ideal width
    slices = slice_predicates_as_columns("l_orderkey", approx)
    counts = [li.filter(p).count() for p in slices]
    assert sum(counts) == total
    ideal = total / n
    assert all(0.5 * ideal <= c <= 1.5 * ideal for c in counts), counts


def test_profile_columns_exact(spark):
    """Profiler vs hand-computed stats on a frame with nulls, duplicates,
    and mixed types — and min/max NULL for non-numeric columns."""
    from dumpty_spark.plans.planner import profile_columns

    df = spark.createDataFrame(
        [(1, 2.5, "x"), (2, None, "y"), (2, 4.5, None), (None, 4.5, "y")],
        ["a", "b", "s"],
    )
    got = {r["col_name"]: r.asDict() for r in profile_columns(df).collect()}
    assert got["a"] == {
        "col_name": "a", "n_rows": 4, "n_nulls": 1, "n_distinct": 2,
        "min_num": 1.0, "max_num": 2.0,
    }
    assert got["b"] == {
        "col_name": "b", "n_rows": 4, "n_nulls": 1, "n_distinct": 2,
        "min_num": 2.5, "max_num": 4.5,
    }
    assert got["s"] == {
        "col_name": "s", "n_rows": 4, "n_nulls": 1, "n_distinct": 2,
        "min_num": None, "max_num": None,
    }


def test_fastcount_matches_exact_with_zero_spark_jobs(spark, sf_smoke):
    """A4 fastcount: footer-only stats equal the exact scan stats, and
    the fast path schedules NO Spark job (job-group listener: any job
    run inside the group would register against it)."""
    import os

    path = os.path.join(sf_smoke, "customer.parquet")
    exact = introspect_stats(load_table(spark, sf_smoke, "customer"), "c_custkey")

    sc = spark.sparkContext
    sc.setJobGroup("fastcount-audit", "must stay empty", False)
    try:
        fast = introspect_stats_fast(path, "c_custkey")
        jobs = sc.statusTracker().getJobIdsForGroup("fastcount-audit")
    finally:
        sc.setJobGroup(None, None, False)
    assert jobs == []
    assert fast.rows == exact.rows
    assert fast.min == exact.min and fast.max == exact.max
    assert fast.pk_numeric and fast.pk == "c_custkey"
    # the fast stats drive the planner to the identical plan
    assert plan_partitions(fast, rows_per_partition=50).strategy == \
        plan_partitions(exact, rows_per_partition=50).strategy


def test_fastcount_directory_and_no_pk(spark, sf_smoke, tmp_path):
    """Directory of part-files: footer row counts sum across files; the
    count matches what Spark reads back."""
    df = load_table(spark, sf_smoke, "orders")
    out = str(tmp_path / "orders_parts")
    df.repartition(4).write.mode("overwrite").parquet(out)
    fast = introspect_stats_fast(out)
    assert fast.rows == df.count()
    exact = introspect_stats(df, "o_orderkey")
    fast_pk = introspect_stats_fast(out, "o_orderkey")
    assert fast_pk.min == exact.min and fast_pk.max == exact.max
    assert fast_pk.rows == fast.rows
