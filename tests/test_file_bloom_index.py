"""File-level Bloom skipping index (operators/bloom.py, EXT E48)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dumpty_spark.operators.bloom import (
    file_bloom_candidate_files,
    file_bloom_index_build,
    file_bloom_lookup,
)


@pytest.fixture(scope="module")
def store(spark, sf_smoke, tmp_path_factory):
    """events written range-clustered on ts — so event_id (the lookup
    key) is UNCLUSTERED across files and footer min-max cannot skip."""
    from dumpty_spark.sources import load_table

    tmp = tmp_path_factory.mktemp("bloomidx")
    data = str(tmp / "events")
    idx = str(tmp / "idx")
    ev = load_table(spark, sf_smoke, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    ev.repartitionByRange(8, "ts").write.mode("overwrite").parquet(data)
    n = file_bloom_index_build(spark, data, "event_id", idx)
    assert n == 8
    return data, idx, ev


def test_lookup_equals_full_scan(spark, store):
    data, idx, ev = store
    keys = [r["event_id"] for r in ev.orderBy("event_id").limit(5).collect()]
    got = sorted(
        map(tuple, file_bloom_lookup(spark, data, idx, "event_id", keys).collect())
    )
    exact = sorted(
        map(
            tuple,
            spark.read.parquet(data).filter(F.col("event_id").isin(keys)).collect(),
        )
    )
    assert got == exact and len(got) == 5


def test_index_actually_skips_files(spark, store):
    """One key lives in exactly one file; with m=2^16 bits per file and
    ~1.2k keys/file the false-positive rate is ~0, so the candidate set
    should be far smaller than the file count — this is the read-cost
    claim, asserted not narrated."""
    data, idx, ev = store
    one = [ev.select("event_id").first()[0]]
    cand = file_bloom_candidate_files(spark, idx, one)
    assert 1 <= len(cand) <= 2


def test_absent_key_reads_nothing(spark, store):
    data, idx, ev = store
    missing = [10**15 + 7]
    cand = file_bloom_candidate_files(spark, idx, missing)
    assert cand == [] or len(cand) <= 1  # bloom may false-positive rarely
    out = file_bloom_lookup(spark, data, idx, "event_id", missing)
    assert out.count() == 0
    assert out.columns == ["event_id", "ts", "user_id", "event_type"]


def test_int_typed_key_column(spark, sf_smoke, tmp_path):
    """xxhash64 is TYPE-sensitive (int 7 and bigint 7 hash differently):
    the probe must hash with the index's native key type or every lookup
    silently false-negatives. Regression for the hardcoded-long probe."""
    from dumpty_spark.sources import load_table

    data = str(tmp_path / "nation")
    idx = str(tmp_path / "idx")
    nation = load_table(spark, sf_smoke, "nation")  # n_nationkey is INT
    assert dict(nation.dtypes)["n_nationkey"] == "int"
    nation.repartition(4).write.parquet(data)
    file_bloom_index_build(spark, data, "n_nationkey", idx)
    got = file_bloom_lookup(spark, data, idx, "n_nationkey", [7])
    assert got.count() == 1
    assert got.first()["n_nationkey"] == 7


def test_no_false_negatives_over_many_keys(spark, store):
    data, idx, ev = store
    keys = [r["event_id"] for r in ev.limit(200).collect()]
    got = file_bloom_lookup(spark, data, idx, "event_id", keys)
    assert got.count() == 200
