"""Inverted index at rest (operators/inverted.py, EXT E66)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from dumpty_spark.operators import inverted as IV
from dumpty_spark.sources import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_t2):
    return load_table(spark, sf_t2, "documents").localCheckpoint()


@pytest.fixture(scope="module")
def index_dir(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("inv"))
    stats = IV.inverted_index_build(docs, d)
    assert stats["n_docs"] == docs.count()
    assert stats["n_postings"] > 100
    return d


def test_search_equals_inflight_bm25(spark, docs, index_dir):
    """Index-based BM25 must equal the direct in-flight computation —
    same rounded scores, same ranking."""
    from dumpty_spark.queries.text3 import _QUERY_TERMS, _TOP_K, bm25_scored

    direct = (
        bm25_scored(docs)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(_TOP_K)
        .collect()
    )
    indexed = IV.inverted_search(
        spark, index_dir, list(_QUERY_TERMS), topk=_TOP_K
    ).collect()
    assert [tuple(r) for r in indexed] == [tuple(r) for r in direct]


def test_search_prunes_partitions(spark, index_dir):
    """The postings scan must carry a PartitionFilters entry on the
    bucket column — the on-disk pruning the layout exists for."""
    df = IV.inverted_search(spark, index_dir, ["spark", "vector"], topk=5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [b#" in plan.replace("PartitionFilters: [ b#", "PartitionFilters: [b#") or "b IN" in plan
    # term filter pushed into the pruned scan
    assert "term" in plan.split("PushedFilters")[1].split("\n")[0]


def test_unknown_term_returns_empty(spark, index_dir):
    assert IV.inverted_search(spark, index_dir, ["zzzqqqxxx"], topk=5).count() == 0


def test_incremental_append_equals_one_shot(spark, docs, tmp_path):
    """Build on half the corpus, append the other half: search results
    must equal the one-shot build (df additive across disjoint-doc
    batches; stats merge in closed form)."""
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    inc_dir = str(tmp_path / "inc")
    one_dir = str(tmp_path / "one")
    IV.inverted_index_build(half_a, inc_dir)
    IV.inverted_index_append(half_b, inc_dir)
    IV.inverted_index_build(docs, one_dir)
    import json, os
    s_inc = json.load(open(os.path.join(inc_dir, "stats.json")))
    s_one = json.load(open(os.path.join(one_dir, "stats.json")))
    assert s_inc["n_docs"] == s_one["n_docs"]
    assert abs(s_inc["avgdl"] - s_one["avgdl"]) < 1e-9
    terms = ["spark", "vector", "dup"]
    got = IV.inverted_search(spark, inc_dir, terms, topk=15).collect()
    want = IV.inverted_search(spark, one_dir, terms, topk=15).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
