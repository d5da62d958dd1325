"""Round-trip tests for the custom dumpty_ndjson Python DataSource: the
engine's NDJSON-gzip + `_schema.json` sink read back with the sidecar as
schema authority, against both the custom source and the JVM-json fast
path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dumpty_spark.sinks.writers import write_ndjson, write_schema_sidecar
from dumpty_spark.sources import load_table
from dumpty_spark.sources.ndjson_source import register, sidecar_schema


def _rows(df, cols):
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def sink(spark, sf_smoke, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ndjson") / "customer")
    df = load_table(spark, sf_smoke, "customer")
    write_ndjson(df, out)
    write_schema_sidecar(df, out)
    register(spark)
    return {"path": out, "df": df}


def test_sidecar_schema_round_trips_types(spark, sink):
    schema = sidecar_schema(sink["path"])
    # the sidecar collapses integer widths to INT64 and floats to
    # FLOAT64 (reference pipeline.py:184-191) — apply the same lattice to
    # the expectation
    lattice = {"tinyint": "bigint", "smallint": "bigint", "int": "bigint",
               "float": "double"}
    want = {
        f.name: lattice.get(f.dataType.simpleString(), f.dataType.simpleString())
        for f in sink["df"].schema.fields
    }
    got = {f.name: f.dataType.simpleString() for f in schema.fields}
    assert got == want


def test_custom_source_reads_back_exact_rows(spark, sink):
    back = spark.read.format("dumpty_ndjson").load(sink["path"])
    cols = sink["df"].columns
    assert sorted(back.columns) == sorted(cols)
    assert _rows(back, cols) == _rows(sink["df"], cols)


def test_custom_source_parallelizes_per_file(spark, sf_smoke, tmp_path):
    df = load_table(spark, sf_smoke, "orders")
    out = str(tmp_path / "orders")
    write_ndjson(df, out, partitions=4)
    write_schema_sidecar(df, out)
    register(spark)
    back = spark.read.format("dumpty_ndjson").load(out)
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == df.count()


def test_custom_source_matches_jvm_json_fast_path(spark, sf_smoke, tmp_path):
    """The documented scale path (spark.read.schema(sidecar).json) and
    the custom source agree bit-for-bit, including the pinned
    second-precision timestamp semantics."""
    ev = load_table(spark, sf_smoke, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    out = str(tmp_path / "events")
    write_ndjson(ev, out)
    write_schema_sidecar(ev, out)
    register(spark)
    schema = sidecar_schema(out)
    jvm = (
        spark.read.schema(schema)
        .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss")
        .json(out + "/part-*")
    )
    custom = spark.read.format("dumpty_ndjson").load(out)
    cols = ev.columns
    assert _rows(custom, cols) == _rows(jvm, cols)
    # and both equal the original truncated to the sink's second precision
    want = ev.withColumn("ts", F.date_trunc("second", "ts").cast("timestamp_ntz"))
    assert _rows(custom, cols) == _rows(want, cols)
