"""Distributed BPE merge learning (EXT E56).

Byte-pair encoding (Sennrich, Haddow, Birch, "Neural Machine
Translation of Rare Words with Subword Units", ACL 2016 — public
literature) is THE tokenizer-training step of an LLM data pipeline: the
learned merge table defines the subword vocabulary every downstream
token count, packing decision (E13) and token-budget mixture (E49)
depends on.

Spark-first shape — the key observation is that BPE trains on the
WORD-FREQUENCY table, not the corpus:

- one corpus scan reduces text to (word, freq) — vocab-sized (Heaps'
  law: ~10^6-10^7 distinct words at 100 TB, a small DataFrame);
- each merge iteration runs entirely on the vocab table: adjacent-pair
  counts weighted by freq (partial-aggregated explode), the argmax pair
  (ONE row collected — 16 bytes per iteration, never data), then a
  map-side leftmost-greedy fold rewrites the symbol arrays;
- ``localCheckpoint`` every few rounds bounds lineage exactly like the
  other iterative operators (graph.py, kcore.py).

Determinism: ties on pair count break lexicographically, so the merge
list is a pure function of the corpus — reproducible across runs,
partitionings, and cluster sizes, which is what lets the registry query
audit the distributed result against an independent single-node
reference (queries/text4.py) as an exact boolean contract.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "▁"  # end-of-word sentinel (U+2581, the sentencepiece marker)


def word_freq_table(df: DataFrame, text_col: str) -> DataFrame:
    """One corpus scan → (word, freq): lowercase word split on
    non-alphanumerics, the same normalization as functions.text.words."""
    from dumpty_spark.functions.text import words
    from dumpty_spark.operators.util import ensure_parallelism

    return (
        ensure_parallelism(df.select(F.col(text_col).alias("t")))
        .select(F.explode(words("t")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _to_symbols(vocab: DataFrame) -> DataFrame:
    """(word, freq) → (syms: array<string>, freq): characters plus the
    end-of-word sentinel appended to the final character."""
    return vocab.select(
        F.concat(
            F.expr("slice(split(word, ''), 1, length(word) - 1)"),
            F.array(F.concat(F.expr("substring(word, -1, 1)"), F.lit(END))),
        ).alias("syms"),
        "freq",
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word freq: explode the zip of
    syms with its own tail — partial-aggregated, pairs-sized output."""
    return (
        syms.select(
            F.explode(
                F.arrays_zip(
                    F.expr("slice(syms, 1, size(syms) - 1)"),
                    F.expr("slice(syms, 2, size(syms) - 1)"),
                )
            ).alias("p"),
            "freq",
        )
        .select(
            F.col("p").getItem("0").alias("a"),
            F.col("p").getItem("1").alias("b"),
            "freq",
        )
        .groupBy("a", "b")
        .agg(F.sum("freq").alias("cnt"))
    )


def _merge_expr(a: str, b: str):
    """Leftmost-greedy non-overlapping merge of the adjacent pair (a, b)
    inside ``syms`` as a pure Column fold — no Python in the hot path."""
    la, lb = F.lit(a), F.lit(b)
    return F.aggregate(
        F.col("syms"),
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == la)
            & (x == lb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(la, lb)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int = 12,
    checkpoint_every: int = 4,
    vocab: DataFrame | None = None,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from a text column. Returns the
    ordered merge table [(left, right, weighted_count), ...] — driver
    payload is n_merges rows, never corpus- or vocab-sized.

    ``vocab``: pass a precomputed ``word_freq_table`` result to skip the
    corpus scan (callers that also need the vocab for other work)."""
    if vocab is None:
        vocab = word_freq_table(df, text_col)
    syms = _to_symbols(vocab).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for i in range(n_merges):
        top = (
            _pair_counts(syms)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((a, b, cnt))
        syms = syms.select(_merge_expr(a, b).alias("syms"), "freq")
        if (i + 1) % checkpoint_every == 0:
            syms = syms.localCheckpoint()
    return merges


def reference_bpe(
    word_freqs: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str, int]]:
    """Independent single-node BPE (the audit baseline): the classic
    dict-of-pairs loop from the ACL'16 paper, same normalization, same
    lexicographic tie-break. Used on vocab-sized collected input only."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, f in word_freqs:
        if not w:
            continue
        syms = tuple(list(w[:-1]) + [w[-1] + END])
        vocab[syms] = vocab.get(syms, 0) + f
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for x, y in zip(syms, syms[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + f
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, cnt))
        out: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            new: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            t = tuple(new)
            out[t] = out.get(t, 0) + f
        vocab = out
    return merges


def encode_col(text_name: str, merges: list[tuple[str, str, int]]):
    """array<string> subword tokens Column: apply the learned merge
    table to each document — the tokenizer APPLICATION step.

    Arrow-batched pandas UDF (the sanctioned Python path — this is a
    per-word iterative rewrite no Column fold can express for an
    arbitrary merge table): each word is encoded with the classic
    lowest-rank-adjacent-pair loop against a broadcast rank dict, then
    doc tokens are the concatenation over words. Deterministic given
    the merge table."""
    import re

    from pyspark.sql.functions import pandas_udf

    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    word_re = re.compile(r"[^a-z0-9]+")

    def enc_word(w: str, cache: dict) -> list[str]:
        got = cache.get(w)
        if got is not None:
            return got
        syms = list(w[:-1]) + [w[-1] + END]
        while len(syms) > 1:
            best_i, best_r = -1, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_i, best_r = i, r
            if best_r is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        cache[w] = syms
        return syms

    @pandas_udf("array<string>")
    def enc(col: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for t in col:
            toks: list[str] = []
            for w in word_re.split((t or "").lower()):
                if w:
                    toks.extend(enc_word(w, cache))
            out.append(toks)
        return pd.Series(out)

    return enc(text_name)
