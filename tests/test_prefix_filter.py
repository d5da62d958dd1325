"""Prefix-filtered exact similarity join (operators/dedup.py, EXT E71)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dumpty_spark.operators.dedup import jaccard_pairs, prefix_filter_pairs
from dumpty_spark.sources import load_table


def _as_set(df):
    return {
        (r["a_id"], r["b_id"], r["jac"])
        for r in df.select("a_id", "b_id", "jac").collect()
    }


def test_prefix_filter_equals_full_join_on_fixture(spark, sf_t2):
    """The completeness lemma, empirically: prefix-filtered candidates +
    exact verification produce the IDENTICAL pair set as the naive
    full shingle self-join, at the same threshold."""
    docs = load_table(spark, sf_t2, "documents")
    full = _as_set(jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.7))
    pref = _as_set(
        prefix_filter_pairs(docs, "doc_id", "text", k=3, threshold=0.7)
    )
    assert pref == full
    assert full, "fixture should contain at least one near-dup pair"


@pytest.mark.parametrize("tau", [0.5, 0.8, 0.95])
def test_prefix_filter_thresholds_synthetic(spark, tau):
    """Adversarial shapes: exact dups, a one-word edit, disjoint docs,
    and docs short enough that the prefix is the whole set — the pair
    set must match the naive join at every threshold."""
    texts = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),
        (3, "the quick brown fox leaps over the lazy dog tonight"),
        (4, "completely different words entirely unrelated content here"),
        (5, "tiny doc here"),
        (6, "tiny doc here"),
        (7, "the quick brown fox jumps over the lazy cat tonight maybe"),
    ]
    docs = spark.createDataFrame(texts, ["doc_id", "text"])
    full = _as_set(jaccard_pairs(docs, "doc_id", "text", k=3, threshold=tau))
    pref = _as_set(
        prefix_filter_pairs(docs, "doc_id", "text", k=3, threshold=tau)
    )
    assert pref == full


def test_prefix_is_proper_subset_of_shingles(spark, sf_t2):
    """The filter must actually prune: across the corpus the prefix rows
    are strictly fewer than the full shingle rows (else the candidate
    join degenerates to the naive one)."""
    from dumpty_spark.operators.dedup import shingle_sets
    from pyspark.sql import Window

    docs = load_table(spark, sf_t2, "documents")
    sh = shingle_sets(docs, "doc_id", "text", 3)
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df_"))
    w = Window.partitionBy("id").orderBy("df_", "shingle")
    ranked = (
        sh.join(dfreq, "shingle")
        .withColumn("pos", F.row_number().over(w))
        .withColumn("n", F.count("*").over(Window.partitionBy("id")))
    )
    tau = 0.7
    n_prefix = ranked.filter(
        F.col("pos") <= F.col("n") - F.ceil(F.lit(tau) * F.col("n")) + 1
    ).count()
    n_all = sh.count()
    assert n_prefix < 0.5 * n_all, (n_prefix, n_all)


def test_prefix_length_float_boundary_tau_0545(spark):
    """Round-4 advice regression: tau=0.545, n=200 — tau*n floats to
    109.00000000000001, so a bare ceil gives 110 and shortens the prefix
    by one (exact ceiling is 109). With the 1e-9 slack, the prefix-filter
    join must still equal the naive join at this adversarial threshold."""
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(400)]
    base = [rng.choice(vocab) for _ in range(202)]  # ~200 3-shingles
    near = list(base)
    near[50] = "EDITED"  # one-token edit → high-but-not-1 Jaccard
    texts = [
        (1, " ".join(base)),
        (2, " ".join(near)),
        (3, " ".join(rng.choice(vocab) for _ in range(202))),
    ]
    docs = spark.createDataFrame(texts, ["doc_id", "text"])
    tau = 0.545
    full = _as_set(jaccard_pairs(docs, "doc_id", "text", k=3, threshold=tau))
    pref = _as_set(
        prefix_filter_pairs(docs, "doc_id", "text", k=3, threshold=tau)
    )
    assert pref == full
    assert (1, 2) in {(a, b) for a, b, _ in full}
