"""Incremental at-rest ANN index maintenance (VERDICT r2 task 8):
appending/upserting a delta into the IVF and LSH partitioned layouts
must produce the same search results as rebuilding from scratch on
base+delta (same codebook/hyperplanes), at O(delta) write cost.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from dumpty_spark.operators.similarity import (
    ivf_append,
    ivf_build,
    ivf_search,
    lsh_append,
    lsh_build,
    lsh_search,
)
from dumpty_spark.sinks.writers import compact_parquet


@pytest.fixture(scope="module")
def corpus(spark, sf_smoke):
    emb = spark.read.parquet(os.path.join(sf_smoke, "embeddings.parquet"))
    return emb.localCheckpoint()


def split(corpus):
    base = corpus.filter(F.col("vec_id") % 5 != 0)
    fresh = corpus.filter(F.col("vec_id") % 5 == 0)
    # upsert half: 2 existing ids get a deterministically shifted vector
    changed_ids = [r["vec_id"] for r in base.select("vec_id").orderBy("vec_id").limit(2).collect()]
    changed = base.filter(F.col("vec_id").isin(changed_ids)).select(
        "vec_id",
        F.transform("embedding", lambda x: x + F.lit(0.25)).alias("embedding"),
        "label",
    )
    delta = fresh.unionByName(changed)
    merged = base.filter(~F.col("vec_id").isin(changed_ids)).unionByName(delta)
    return base, delta, merged


def canon(df):
    return sorted(
        (r["q_id"], r["n_id"], r["sim"], r["rnk"]) for r in df.collect()
    )


def test_ivf_append_equals_rebuild(spark, corpus, tmp_path):
    base, delta, merged = split(corpus)
    queries = corpus.orderBy("vec_id").limit(6)

    inc_dir = str(tmp_path / "ivf_inc")
    cents = ivf_build(base, inc_dir, nlist=8)
    stats = ivf_append(spark, inc_dir, delta)
    assert stats["rows_appended"] == delta.count()
    assert stats["rows_replaced"] == 2
    assert stats["cells_touched"] >= 1

    # batch twin: same frozen codebook over base+delta
    full_dir = str(tmp_path / "ivf_full")
    ivf_build(merged, full_dir, nlist=8, centroids=cents)

    got_inc = canon(ivf_search(spark, inc_dir, queries, k=4, nprobe=3))
    got_full = canon(ivf_search(spark, full_dir, queries, k=4, nprobe=3))
    assert got_inc == got_full and len(got_inc) > 0

    # the layout is still the partition-pruned hive shape, and the
    # accumulated small files compact without changing results
    assert glob.glob(os.path.join(inc_dir, "cells", "c_id=*"))
    compact_parquet(spark, os.path.join(inc_dir, "cells"))
    assert canon(ivf_search(spark, inc_dir, queries, k=4, nprobe=3)) == got_full


def test_ivf_append_upsert_replaces_old_vector(spark, corpus, tmp_path):
    """A re-embedded id must be searchable at its NEW position only —
    no stale duplicate row surviving in another cell."""
    base, delta, merged = split(corpus)
    idx = str(tmp_path / "ivf")
    ivf_build(base, idx, nlist=8)
    ivf_append(spark, idx, delta)
    cells = spark.read.parquet(os.path.join(idx, "cells"))
    dup = cells.groupBy("n_id").count().filter(F.col("count") > 1)
    assert dup.count() == 0
    assert cells.count() == merged.count()


def test_lsh_append_equals_rebuild(spark, corpus, tmp_path):
    base, delta, merged = split(corpus)
    queries = corpus.orderBy(F.desc("vec_id")).limit(6)

    inc_dir = str(tmp_path / "lsh_inc")
    lsh_build(base, inc_dir, bits=16, num_hash_tables=4)
    stats = lsh_append(spark, inc_dir, delta)
    # every vector appears once per band
    assert stats["rows_appended"] == delta.count() * 4
    assert stats["rows_replaced"] == 2 * 4

    full_dir = str(tmp_path / "lsh_full")
    lsh_build(merged, full_dir, bits=16, num_hash_tables=4)

    got_inc = canon(lsh_search(spark, inc_dir, queries, k=4))
    got_full = canon(lsh_search(spark, full_dir, queries, k=4))
    assert got_inc == got_full and len(got_inc) > 0

    # bucket count per id intact after upsert (no stale band rows)
    buckets = spark.read.parquet(os.path.join(inc_dir, "buckets"))
    per_id = buckets.groupBy("n_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per_id] == [4]
