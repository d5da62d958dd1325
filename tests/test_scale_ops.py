"""Scale-strategy operators: salted join semantics + plan shape, and
HLL error bounds."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from dumpty_spark.operators.joins import salted_join
from dumpty_spark.sources import load_table


def test_salted_join_equals_plain_join(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem").withColumnRenamed("l_orderkey", "okey")
    orders = load_table(spark, sf_smoke, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    plain = li.join(orders, "okey")
    salted = salted_join(li, orders, on=["okey"], salt_buckets=8)
    assert salted.count() == plain.count()
    assert sorted(salted.columns) == sorted(plain.columns)
    a = salted.groupBy("o_orderpriority").count().collect()
    b = plain.groupBy("o_orderpriority").count().collect()
    assert {(r[0], r[1]) for r in a} == {(r[0], r[1]) for r in b}


def test_salted_join_spreads_hot_key(spark):
    # one key holds 100% of the large side — the worst case AQE can't split
    large = spark.range(0, 10000).select(
        F.lit(1).alias("k"), F.col("id").alias("payload")
    )
    small = spark.createDataFrame([(1, "x")], "k long, v string")
    out = salted_join(large, small, on=["k"], salt_buckets=8)
    assert out.count() == 10000
    # the physical join key must include the salt
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    assert "__salt" in buf.getvalue()


def test_salted_left_join_keeps_unmatched(spark):
    large = spark.createDataFrame([(1, "a"), (2, "b")], "k long, p string")
    small = spark.createDataFrame([(1, "x")], "k long, v string")
    out = salted_join(large, small, on=["k"], how="left", salt_buckets=4).collect()
    got = {(r["k"], r["v"]) for r in out}
    assert got == {(1, "x"), (2, None)}


def test_approx_distinct_error_bound(spark, sf_t2):
    ev = load_table(spark, sf_t2, "events")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    for r in rows:
        assert abs(r["approx"] - r["exact"]) / r["exact"] < 0.02, r


def test_global_row_number_matches_sort(spark, sf_smoke):
    from dumpty_spark.operators.rownum import global_row_number

    orders = load_table(spark, sf_smoke, "orders")
    out = global_row_number(orders, ["o_orderkey"], out_col="rn")
    got = [r["o_orderkey"] for r in out.orderBy("rn").select("o_orderkey").collect()]
    want = sorted(r["o_orderkey"] for r in orders.select("o_orderkey").collect())
    assert got == want
    rns = [r["rn"] for r in out.select("rn").orderBy("rn").collect()]
    assert rns == list(range(1, len(want) + 1))  # dense, 1-based, no gaps


def test_global_row_number_partition_invariant(spark, sf_smoke):
    from dumpty_spark.operators.rownum import global_row_number

    orders = load_table(spark, sf_smoke, "orders")
    a = global_row_number(orders, ["o_orderkey"], num_partitions=3)
    b = global_row_number(orders.repartition(17), ["o_orderkey"], num_partitions=11)
    key = lambda df: {r["o_orderkey"]: r["rn"] for r in df.collect()}  # noqa: E731
    assert key(a) == key(b)


def test_global_row_number_no_global_window(spark, sf_smoke):
    """The plan must never contain a partition-less window (single task)."""
    import contextlib, io
    from dumpty_spark.operators.rownum import global_row_number

    orders = load_table(spark, sf_smoke, "orders")
    out = global_row_number(orders, ["o_orderkey"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue()
    for line in plan.splitlines():
        if "Window" in line and "__pid" not in line and "windowspecdefinition" in line.lower():
            # the only windows allowed partition by __pid or run over
            # the per-partition counts (metadata-sized)
            assert "__n" in line or "__off" in line, line
