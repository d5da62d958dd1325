"""Soundness of the SymSpell deletion-neighborhood blocking behind
q_fuzzy_match (queries/relational3.py): strings within edit distance 1
must ALWAYS share a candidate variant, or the bucket join silently drops
true pairs. The theorem is exercised by hypothesis over random edits;
the Spark Column expression is then checked against the Python model so
the substr index arithmetic can't drift."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def d1(s: str) -> set[str]:
    """Reference model: the string plus every one-char deletion."""
    return {s} | {s[:i] + s[i + 1 :] for i in range(len(s))}


_alpha = st.text(alphabet="abcxyz019", min_size=1, max_size=12)


@st.composite
def _edit_pairs(draw):
    s = draw(_alpha)
    op = draw(st.sampled_from(["equal", "delete", "insert", "substitute"]))
    if op == "equal" or (op == "delete" and len(s) == 1):
        return s, s
    i = draw(st.integers(0, len(s) - 1))
    c = draw(st.sampled_from("abcxyz019"))
    if op == "delete":
        return s, s[:i] + s[i + 1 :]
    if op == "insert":
        return s, s[:i] + c + s[i:]
    return s, s[:i] + c + s[i + 1 :]


@given(_edit_pairs())
@settings(max_examples=300, deadline=None)
def test_edit_distance_1_always_shares_a_variant(pair):
    a, b = pair
    assert d1(a) & d1(b), f"no shared variant for {a!r} / {b!r}"


def test_spark_variant_expression_matches_model(spark):
    """The exploded (identity ∪ one-char-deletion) keys produced by the
    Column expression in q_fuzzy_match equal the Python model for every
    sample string, so the join key loses no true candidate."""
    samples = ["a", "ab", "abc", "Customer#000000001", "x" * 12, "0a1b2c"]
    df = spark.createDataFrame([(s,) for s in samples], "c_name string")
    name = F.col("c_name")
    deletions = F.transform(
        F.sequence(F.lit(1), F.length(name), F.lit(1)),
        lambda i: F.concat(
            name.substr(F.lit(1), i - F.lit(1)),
            name.substr(i + F.lit(1), F.length(name) - i),
        ),
    )
    out = df.select(
        "c_name",
        F.explode(F.array_union(F.array(name), deletions)).alias("vkey"),
    ).collect()
    got: dict[str, set[str]] = {}
    for r in out:
        got.setdefault(r["c_name"], set()).add(r["vkey"])
    for s in samples:
        assert got[s] == d1(s), f"variant mismatch for {s!r}"
