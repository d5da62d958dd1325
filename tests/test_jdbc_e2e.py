"""Live-JDBC end-to-end tests against embedded Apache Derby (S1-S5).

The reference's core loop is introspect -> plan -> parallel JDBC scan ->
sink against a real database (reference src/dumpty/pipeline.py:424-459).
Derby ships on the Spark classpath (derby-*.jar, used by the Hive
metastore), so these tests run the whole loop over live JDBC cursors:

- S3 single scan, S1 bounds scan, S2 predicate (julienne) scan;
- metamorphic parity: all three strategies return the same row multiset,
  and the partitioned scans really produce one task per slice;
- NULL-PK routing: a NULL key lands in exactly one predicate slice;
- S4 catalog list via Derby's SYS tables (INFORMATION_SCHEMA analog);
- S5 change-tracking query with watermark substitution;
- scan -> NDJSON sink -> reconcile (the full pipeline round trip).
"""

from __future__ import annotations

import os

import pytest

from dumpty_spark.plans.planner import (
    PartitionPlan,
    approx_boundaries,
    plan_partitions,
)
from dumpty_spark.sources import load_table
from dumpty_spark.sources.jdbc import (
    DERBY_TABLES,
    JdbcSource,
    changed_tables_jdbc,
    introspect_jdbc,
    list_tables,
    run_query,
    scan,
)

SCHEMA = "APP"  # Derby's default schema


def _exec(spark, url: str, *stmts: str) -> None:
    """Run DDL/DML through a raw java.sql connection (py4j)."""
    jvm = spark._sc._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        for s in stmts:
            st.execute(s)
        st.close()
    finally:
        conn.close()


@pytest.fixture(scope="module")
def derby(spark, sf_smoke, tmp_path_factory):
    """One embedded Derby DB per module, seeded from the sf0.001 customer
    fixture (written through Spark's own JDBC sink — DerbyDialect) plus a
    gappy/NULL-keyed table and a change-log table."""
    db_dir = tmp_path_factory.mktemp("derby") / "db"
    url = f"jdbc:derby:{db_dir};create=true"

    # Column names are written UPPERCASE: Spark's JDBC writer quotes
    # identifiers (case-sensitive in Derby), while raw SQL — including
    # the planner's generated predicates — folds unquoted names to
    # uppercase. Uppercase names satisfy both resolution paths.
    cust = load_table(spark, sf_smoke, "customer").selectExpr(
        "c_custkey AS C_CUSTKEY",
        "c_name AS C_NAME",
        "c_nationkey AS C_NATIONKEY",
        "c_acctbal AS C_ACCTBAL",
    )
    # Derby is embedded (single JVM): serialize the write to one cursor.
    cust.coalesce(1).write.format("jdbc").option("url", url).option(
        "dbtable", "customer"
    ).mode("overwrite").save()

    # gappy key (custkey*10), plus one NULL-keyed row: exercises the
    # julienne path (non-dense) and P3 NULL routing.
    gappy = cust.selectExpr(
        "CAST(C_CUSTKEY * 10 AS BIGINT) AS GKEY", "C_NAME", "C_ACCTBAL"
    )
    gappy.coalesce(1).write.format("jdbc").option("url", url).option(
        "dbtable", "gappy"
    ).mode("overwrite").save()
    _exec(
        spark,
        url,
        "INSERT INTO gappy (GKEY, C_NAME, C_ACCTBAL) "
        "VALUES (NULL, 'null-key-row', 0.0)",
    )

    _exec(
        spark,
        url,
        "CREATE TABLE change_log (table_name VARCHAR(64), changed_at INT)",
        "INSERT INTO change_log VALUES ('customer', 100)",
        "INSERT INTO change_log VALUES ('gappy', 300)",
        "INSERT INTO change_log VALUES ('customer', 350)",
    )
    n_cust = cust.count()
    return {"url": url, "n_cust": n_cust}


def _src(derby, table: str) -> JdbcSource:
    # Derby has no MSSQL-style SET TRANSACTION statement: dirty_read off.
    return JdbcSource(url=derby["url"], table=table, dirty_read=False)


def test_s3_single_scan(spark, derby):
    df = scan(spark, _src(derby, "customer"), PartitionPlan(strategy="single"))
    assert df.count() == derby["n_cust"]
    assert df.rdd.getNumPartitions() == 1


def test_s1_bounds_scan_matches_and_partitions(spark, derby):
    src = _src(derby, "customer")
    stats = introspect_jdbc(spark, src, "C_CUSTKEY")
    assert stats.rows == derby["n_cust"] and stats.pk_numeric
    plan = plan_partitions(stats, partitions_override=4)
    assert plan.strategy == "bounds"  # custkey is dense 1..N
    df = scan(spark, src, plan)
    assert df.rdd.getNumPartitions() == 4
    single = scan(spark, src, PartitionPlan(strategy="single"))
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, single.collect()))


def test_s2_predicates_scan_matches_and_partitions(spark, derby):
    src = _src(derby, "gappy")
    stats = introspect_jdbc(spark, src, "GKEY")
    # gappy keys are 10,20,...: not dense, so the planner needs julienne
    # boundaries. Compute them from a bounded probe scan, like the
    # reference's boundary query runs on the source.
    probe = scan(spark, src, PartitionPlan(strategy="single"))
    bounds = approx_boundaries(probe, "GKEY", 4, rel_err=0.0)
    plan = plan_partitions(stats, partitions_override=4, boundaries=bounds)
    assert plan.strategy == "predicates"
    df = scan(spark, src, plan)
    assert df.rdd.getNumPartitions() == len(plan.predicates)
    # metamorphic: same multiset as the single scan, NULL row included
    assert sorted(map(tuple, df.fillna(-1).collect())) == sorted(
        map(tuple, probe.fillna(-1).collect())
    )


def test_null_pk_lands_in_exactly_one_slice(spark, derby):
    src = _src(derby, "gappy")
    probe = scan(spark, src, PartitionPlan(strategy="single"))
    bounds = approx_boundaries(probe, "GKEY", 4, rel_err=0.0)
    stats = introspect_jdbc(spark, src, "GKEY")
    plan = plan_partitions(stats, partitions_override=4, boundaries=bounds)
    hits = 0
    for pred in plan.predicates:
        part = run_query(
            spark, src, f"SELECT * FROM gappy WHERE {pred}"
        )
        hits += part.filter("GKEY IS NULL").count()
    assert hits == 1  # routed to the first slice only (P3)


def test_s4_catalog_list(spark, derby):
    names = list_tables(spark, _src(derby, "ignored"), SCHEMA, DERBY_TABLES)
    assert {"customer", "gappy", "change_log"} <= set(names)


def test_s5_change_tracking_query(spark, derby):
    src = _src(derby, "ignored")
    tmpl = (
        "SELECT DISTINCT table_name FROM change_log "
        "WHERE changed_at > {watermark}"
    )
    assert changed_tables_jdbc(spark, src, tmpl, "200") == ["customer", "gappy"]
    assert changed_tables_jdbc(spark, src, tmpl, "0") == ["customer", "gappy"]
    assert changed_tables_jdbc(spark, src, tmpl, "400") == []


def test_scan_to_sink_round_trip(spark, derby, tmp_path):
    """The full loop: introspect -> plan -> parallel scan -> NDJSON sink
    -> count reconcile (reference pipeline.py extract+load semantics)."""
    from dumpty_spark.sinks.writers import write_ndjson

    src = _src(derby, "customer")
    stats = introspect_jdbc(spark, src, "C_CUSTKEY")
    plan = plan_partitions(stats, partitions_override=3)
    df = scan(spark, src, plan)
    out = str(tmp_path / "customer_ndjson")
    write_ndjson(df, out)
    back = spark.read.json(os.path.join(out, "part-*"))
    # X7 reconcile: source introspection count == landed sink count
    assert back.count() == stats.rows


def test_julienne_boundaries_computed_server_side(spark, derby):
    """W1 parity: boundaries from the reference's ROW_NUMBER query run ON
    the database equal exact_julienne_boundaries over the scanned frame,
    and drive an identical predicates scan."""
    from dumpty_spark.plans.planner import exact_julienne_boundaries
    from dumpty_spark.sources.jdbc import DERBY_JULIENNE, julienne_boundaries_jdbc

    src = _src(derby, "gappy")
    probe = scan(spark, src, PartitionPlan(strategy="single")).filter(
        "GKEY IS NOT NULL"
    )
    width = 40
    want = exact_julienne_boundaries(probe, "GKEY", width)
    got = julienne_boundaries_jdbc(spark, src, "GKEY", width, DERBY_JULIENNE)
    assert got == want and len(got) >= 2

    stats = introspect_jdbc(spark, src, "GKEY")
    plan = plan_partitions(stats, partitions_override=len(got) + 1, boundaries=got)
    assert plan.strategy == "predicates"
    df = scan(spark, src, plan)
    full = scan(spark, src, PartitionPlan(strategy="single"))
    assert sorted(map(tuple, df.fillna(-1).collect())) == sorted(
        map(tuple, full.fillna(-1).collect())
    )
