"""Complete edit-distance similarity join (EXT E78) — PassJoin-style
segment filtering.

The string-side sibling of the PPJoin prefix filter (operators/dedup.py):
an EXACT join "all pairs with levenshtein(a, b) <= d" whose candidate
generation provably misses nothing, built from the pigeonhole principle
(Li, Deng, Feng — "PassJoin: A Partition-based Method for Similarity
Joins", VLDB 2012; public literature):

    Partition every string into d+1 contiguous segments. d edit
    operations can touch at most d segments, so for any pair within
    distance d at least ONE segment of the shorter string survives
    untouched — and appears in the other string as an exact substring,
    displaced by at most d positions.

Dataflow (all relational, no UDFs — segment/probe generation is pure
higher-order-function Columns, verification is the built-in
``levenshtein``):

- index side: each string emits its d+1 segments keyed by
  (segment_idx, source_length, segment_text) — O(d) rows per string;
- probe side: each string emits, for every partner length within ±d and
  every segment index, the substrings at the ±d displacement window —
  O(d^3) rows per string (d is small: 1-3);
- equi-join on the key, distinct pairs, exact levenshtein verify.

At 100 TB this is shuffle-friendly: both sides are map-side expansions
joined on a compact composite key whose selectivity comes from the
segment text; no all-pairs stage exists anywhere. Skewed keys (a common
prefix segment shared by millions of rows) are the same hazard class as
hot shingles in the Jaccard join and amenable to the same df-capping.

Strings shorter than d+1 characters cannot donate a non-empty segment
from every partition slot; they are routed through a direct
short-string branch (length <= d matches anything within the length
window — the candidate set is the length-filtered block), which stays
tiny by construction at any scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _seg_bounds_expr(d: int) -> str:
    """array<struct<j,start,len>> of the d+1 even segments of a string of
    length ``ls`` (0-based starts; substring() below is 1-based)."""
    k = d + 1
    return (
        f"transform(sequence(0, {d}), j -> struct("
        f"j AS j, "
        f"CAST(floor(j * ls / {k}) AS INT) AS start, "
        f"CAST(floor((j + 1) * ls / {k}) - floor(j * ls / {k}) AS INT) AS len))"
    )


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    d: int = 2,
) -> DataFrame:
    """All pairs (a_id < b_id) with levenshtein <= ``d`` — exact and
    complete. Returns (a_id, b_id, dist)."""
    s = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(str_col).alias("s"),
        )
        .filter(F.col("s").isNotNull())
        .withColumn("ls", F.length("s").cast("int"))
    )
    from dumpty_spark.operators.util import ensure_parallelism

    s = ensure_parallelism(s).localCheckpoint()  # reused by 3 branches

    long_side = s.filter(F.col("ls") >= d + 1)
    short_side = s.filter(F.col("ls") <= d)

    # --- index: the d+1 segments of every long string ------------------
    segs = long_side.select(
        F.col("id").alias("a_id"),
        "s",
        "ls",
        F.explode(F.expr(_seg_bounds_expr(d))).alias("g"),
    ).select(
        "a_id",
        F.col("ls").alias("ls_a"),
        F.col("g.j").alias("j"),
        F.expr("substring(s, g.start + 1, g.len)").alias("seg"),
    )

    # --- probe: substrings at the ±d displacement window, for every ----
    # partner length within ±d. Inner transforms build
    # struct(ls2, j, sub) rows; two flattens unnest the nesting.
    # sequence(lo, hi) DESCENDS when lo > hi (it would fabricate invalid
    # probe positions), so the empty-window case gets an explicit
    # array() guard. Segment lengths are >= 1 because ls2 >= d+1.
    k = d + 1
    pj = f"CAST(floor(j * ls2 / {k}) AS INT)"
    seglen = f"(CAST(floor((j + 1) * ls2 / {k}) AS INT) - {pj})"
    lo = f"greatest({pj} - {d}, 0)"
    hi = f"least({pj} + {d}, ls - {seglen})"
    probe_expr = f"""
    flatten(flatten(
      transform(sequence(greatest({k}, ls - {d}), ls + {d}), ls2 ->
        transform(sequence(0, {d}), j ->
          transform(
            CASE WHEN {lo} <= {hi} THEN sequence({lo}, {hi})
                 ELSE CAST(array() AS array<int>) END,
            p -> struct(
              ls2 AS ls2, j AS j,
              substring(s, p + 1, {seglen}) AS sub)
          )
        )
      )
    ))
    """
    probes = long_side.select(
        F.col("id").alias("b_id"),
        F.explode(F.expr(probe_expr)).alias("p"),
    ).select(
        "b_id",
        F.col("p.ls2").alias("ls_a"),
        F.col("p.j").alias("j"),
        F.col("p.sub").alias("seg"),
    )

    cand = (
        segs.join(probes, ["ls_a", "j", "seg"])
        .filter(F.col("a_id") != F.col("b_id"))
        .select(
            F.least("a_id", "b_id").alias("a_id"),
            F.greatest("a_id", "b_id").alias("b_id"),
        )
        .distinct()
    )

    # --- short strings: length <= d can lose every segment to edits, so
    # no pigeonhole guarantee — but any partner within distance d is
    # within the length window, so the candidate block is the (tiny)
    # short set × the length-filtered strings, broadcast.
    short_cand = (
        short_side.select(
            F.col("id").alias("x_id"), F.col("ls").alias("lx")
        )
        .join(
            s.select(F.col("id").alias("y_id"), F.col("ls").alias("ly")),
            F.expr(f"abs(lx - ly) <= {d} AND x_id != y_id"),
        )
        .select(
            F.least("x_id", "y_id").alias("a_id"),
            F.greatest("x_id", "y_id").alias("b_id"),
        )
        .distinct()
    )

    all_cand = cand.unionAll(short_cand).distinct()

    # --- exact verify on the (candidate-sized) pair set -----------------
    sa = s.select(F.col("id").alias("a_id"), F.col("s").alias("s_a"))
    sb = s.select(F.col("id").alias("b_id"), F.col("s").alias("s_b"))
    return (
        all_cand.join(sa, "a_id")
        .join(sb, "b_id")
        .select(
            "a_id", "b_id",
            F.levenshtein("s_a", "s_b").alias("dist"),
        )
        .filter(F.col("dist") <= d)
    )


# ---------------------------------------------------------------------------
# Jaro-Winkler similarity (EXT E206) — the record-linkage scorer
# ---------------------------------------------------------------------------
# Standard Jaro similarity (match window max(|a|,|b|)/2 - 1,
# transpositions halved) with the Winkler common-prefix bonus
# (p = 0.1, prefix capped at 4, boost threshold 0.7) — the exact
# definition DuckDB's jaro_winkler_similarity implements, verified
# bit-identical on the fixture corpus, which is what lets a blocked
# JW matching query carry a full value-level oracle. Levenshtein has
# a JVM built-in; JW does not, so this is one of the repo's few
# Python kernels: an Arrow-batched pandas UDF (never BatchEvalPython),
# pure function of its two arguments. At production scale the same
# plan slots a C-backed kernel (e.g. rapidfuzz) behind the identical
# UDF signature.


def _jaro_winkler_py(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i in range(l1):
        lo, hi = max(0, i - window), min(i + window + 1, l2)
        for j in range(lo, hi):
            if not m2[j] and s1[i] == s2[j]:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    jaro = (matches / l1 + matches / l2 + (matches - t) / matches) / 3
    if jaro > 0.7:
        prefix = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            prefix += 1
        jaro += prefix * 0.1 * (1.0 - jaro)
    return jaro


def jaro_winkler(a, b):
    """Arrow-batched Jaro-Winkler similarity Column (doubles in [0, 1]).

    NULL in either argument propagates NULL, matching SQL string
    builtins (and DuckDB's jaro_winkler_similarity).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _jw(s1: pd.Series, s2: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if x is None or y is None else _jaro_winkler_py(x, y)
                for x, y in zip(s1, s2)
            ],
            dtype="float64",
        )

    return _jw(a, b)
