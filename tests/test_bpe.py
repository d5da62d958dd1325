"""Distributed BPE merge learning (operators/bpe.py, EXT E56) and the
containment near-dup relation (operators/dedup.containment_pairs, E53)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dumpty_spark.operators import bpe as B
from dumpty_spark.operators import dedup as D


def _corpus(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["id", "text"])


def test_learn_bpe_matches_reference_on_classic_example(spark):
    """The ACL'16 running example: 'low(er)/newest/widest' family. The
    distributed fold and the single-node dict loop must produce the
    identical ordered merge list."""
    texts = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    df = _corpus(spark, [" ".join(texts)])
    dist = B.learn_bpe(df, "text", n_merges=8)
    wf = [
        (r["word"], int(r["freq"]))
        for r in B.word_freq_table(df, "text").collect()
    ]
    ref = B.reference_bpe(wf, 8)
    assert dist == ref
    # first merge of the classic example: ('e','s') with count 9
    assert dist[0][:2] == ("e", "s") and dist[0][2] == 9


def test_merge_fold_is_leftmost_greedy(spark):
    """'aaaa' under merge (a,a) must become ['aa','aa…'] — leftmost
    non-overlapping, never the overlapping triple."""
    df = _corpus(spark, ["aaaa aaa"])
    dist = B.learn_bpe(df, "text", n_merges=2)
    wf = [
        (r["word"], int(r["freq"]))
        for r in B.word_freq_table(df, "text").collect()
    ]
    assert dist == B.reference_bpe(wf, 2)


def test_learn_bpe_stops_when_exhausted(spark):
    """A one-character corpus runs out of pairs before n_merges."""
    df = _corpus(spark, ["a b a b"])
    dist = B.learn_bpe(df, "text", n_merges=10)
    assert len(dist) < 10


def test_containment_detects_excerpt_jaccard_misses(spark):
    """A short doc pasted verbatim into a much longer one: Jaccard is
    far below threshold, containment of the excerpt is 1.0 — and only
    the excerpt→superset direction fires."""
    inner = "alpha beta gamma delta epsilon zeta"
    outer = inner + " " + " ".join(f"w{i} x{i} y{i}" for i in range(30))
    df = _corpus(spark, [inner, outer])
    jac = D.jaccard_pairs(df, "id", "text", k=3, threshold=0.8)
    assert jac.count() == 0
    cont = D.containment_pairs(df, "id", "text", k=3, threshold=0.85).collect()
    assert len(cont) == 1
    r = cont[0]
    assert (r["inner_id"], r["outer_id"]) == (0, 1)
    assert r["containment"] == 1.0


def test_containment_mutual_for_exact_duplicates(spark):
    t = "one two three four five six seven"
    df = _corpus(spark, [t, t])
    cont = D.containment_pairs(df, "id", "text", k=3, threshold=0.85)
    rows = {(r["inner_id"], r["outer_id"]): r["containment"] for r in cont.collect()}
    assert rows == {(0, 1): 1.0, (1, 0): 1.0}


def test_containment_stop_shingle_cap(spark):
    """max_shingle_df drops ubiquitous shingles from candidate
    generation (the E2a scale bound) — a shingle present in every doc
    cannot by itself create pairs."""
    common = "the quick brown fox jumps over"
    df = _corpus(spark, [common + f" tail{i} extra{i} pad{i}" for i in range(5)])
    capped = D.containment_pairs(
        df, "id", "text", k=3, threshold=0.5, max_shingle_df=2
    )
    assert capped.count() == 0


def test_encode_roundtrip_preserves_words(spark):
    """Concatenating each doc's subword stream and splitting on the END
    sentinel reconstructs exactly the normalized word sequence — no
    token loss at any merge count."""
    texts = ["Hello world, hello BPE!", "the low lower lowest newest"]
    df = _corpus(spark, texts)
    merges = B.learn_bpe(df, "text", n_merges=6)
    enc = df.select("id", B.encode_col("text", merges).alias("toks"))
    rows = {r["id"]: list(r["toks"]) for r in enc.collect()}
    import re

    for i, t in enumerate(texts):
        want = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        got = "".join(rows[i]).split(B.END)[:-1]
        assert got == want


def test_encode_applies_merges_by_rank(spark):
    """With the ('e','s') merge learned first, 'newest' must contain the
    fused 'es' subword, and an unmergeable word stays fully split."""
    texts = ["low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3]
    df = _corpus(spark, texts)
    merges = B.learn_bpe(df, "text", n_merges=1)  # just ('e','s')
    enc = df.select(B.encode_col("text", merges).alias("toks")).first()
    toks = list(enc["toks"])
    assert "es" in toks
    assert "low" not in toks  # only 1 merge learned: 'low' stays chars


# ---------------------------------------------------------------------------
# Property: distributed learn_bpe ≡ reference_bpe on arbitrary corpora.
# Few examples (each runs Spark jobs), wide input space: words with
# repeated characters, shared prefixes/suffixes, and skewed frequencies
# exercise tie-breaks and overlapping-pair merges.
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st

_words_st = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=5),
    min_size=1,
    max_size=8,
)


@given(_words_st, st.integers(min_value=1, max_value=5))
@settings(max_examples=8, deadline=None)
def test_learn_bpe_property_matches_reference(spark, words, n_merges):
    text = " ".join(words)
    df = _corpus(spark, [text])
    dist = B.learn_bpe(df, "text", n_merges=n_merges)
    wf = [
        (r["word"], int(r["freq"]))
        for r in B.word_freq_table(df, "text").collect()
    ]
    assert dist == B.reference_bpe(wf, n_merges)


def test_bpe_audit_inputs_are_absolute_capped(spark, sf_smoke, monkeypatch):
    """Round-4 scale fix: the two BPE registry queries' driver-side audit
    materializations must be O(1) in corpus size. Shrink the caps far
    below the fixture's vocab/doc counts and assert (a) the reference
    audit really receives <= K words (spy), (b) both queries stay green —
    the merge audit is still exact because BOTH the distributed learner
    and the reference consume the identical capped slice."""
    from dumpty_spark.operators import bpe as B
    from dumpty_spark.queries import text4

    seen = {}
    real_ref = B.reference_bpe

    def spy_ref(wf, n):
        seen["vocab_rows"] = len(wf)
        return real_ref(wf, n)

    monkeypatch.setattr(B, "reference_bpe", spy_ref)
    monkeypatch.setattr(text4, "_AUDIT_VOCAB_K", 30)
    monkeypatch.setattr(text4, "_AUDIT_DOCS", 3)

    merges = text4.q_bpe_merges(spark, sf_smoke).collect()
    assert seen["vocab_rows"] <= 30
    assert all(r["matches_reference"] for r in merges)

    stats = text4.q_bpe_encode_stats(spark, sf_smoke).collect()[0]
    assert stats["sample_matches_reference"] is True
    assert stats["n_words"] > 0  # stats side still covers the full corpus
