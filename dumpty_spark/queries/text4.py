"""Tokenizer-training queries (EXT E56): distributed BPE merge learning
and its audit contract.

The merge table itself is a function of xor-free exact counts, fully
deterministic, but not SQL-expressible (iterative argmax + rewrite), so
the oracle contract is the E37-style audit boolean: the distributed
merge list must EQUAL the independent single-node reference
implementation run on the same word-frequency table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

_N_MERGES = 12

# Absolute caps on the audit-side materializations (round-3 verdict #2):
# no registered query may collect corpus-proportional data to the driver.
# The top-K-by-frequency vocab slice is standard tokenizer-training
# practice (real BPE trainers frequency-cap their word table), and the
# hash-ordered doc sample is a fixed absolute count, not a fraction.
# Tests monkeypatch these to prove the O(1)-in-corpus-size property.
_AUDIT_VOCAB_K = 50_000
_AUDIT_DOCS = 200

_BPE_ORACLE = f"""
SELECT i AS merge_rank, TRUE AS matches_reference
FROM UNNEST(generate_series(1, {_N_MERGES})) AS t(i)
ORDER BY merge_rank
"""


@register(
    "q_bpe_merges",
    oracle=_BPE_ORACLE,
    doc=f"distributed BPE merge learning (E56): {_N_MERGES} merges "
    "learned over the top-50k-by-frequency word table (corpus scanned "
    "once; every iteration is vocab-sized with a 1-row collect), "
    "audited merge-by-merge against an independent single-node "
    "reference implementation — the oracle checks the per-rank "
    "equality booleans EXACTLY, which is sound because the merge list "
    "is deterministic (lexicographic tie-break) and BOTH sides consume "
    "the identical frequency-capped vocab slice",
)
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators import bpe as B

    docs = load_table(spark, sf_dir, "documents")
    # frequency-cap the word table to an ABSOLUTE size before anything
    # touches the driver: top-K by freq, word tie-break (deterministic).
    # Real tokenizer trainers do exactly this cap; at the test SFs the
    # vocab is under K so the slice is the whole table. The distributed
    # learner and the single-node reference both consume THIS slice, so
    # the merge-by-merge equality audit stays exact while the driver
    # payload is O(K) regardless of corpus size.
    vocab = (
        B.word_freq_table(docs, "text")
        .orderBy(F.desc("freq"), "word")
        .limit(_AUDIT_VOCAB_K)
        .localCheckpoint()
    )
    dist = B.learn_bpe(docs, "text", n_merges=_N_MERGES, vocab=vocab)
    # audit baseline: O(K) collect, then the classic dict loop — a
    # genuinely independent second implementation
    wf = [(r["word"], int(r["freq"])) for r in vocab.collect()]
    ref = B.reference_bpe(wf, _N_MERGES)
    rows = [
        (i + 1, dist[i] == ref[i] if i < len(dist) else False)
        for i in range(_N_MERGES)
    ]
    return spark.createDataFrame(
        rows, "merge_rank int, matches_reference boolean"
    ).orderBy("merge_rank")


# ---------------------------------------------------------------------------
# E57: S-stemmer term frequencies — portable suffix stripping
# ---------------------------------------------------------------------------
# Harman's S-stemmer ("How effective is suffixing?", JASIS 1991 — public
# literature): three ordered plural rules, deliberately chosen over
# Porter because every rule is expressible identically in both engines
# (suffix tests + substring), so the oracle match is exact rather than
# approximate. Conflation quality is within a few percent of Porter for
# English IR (Harman's own result) at zero dependency cost.

_STEM_SQL = """
CASE
  WHEN len(w) > 4 AND w LIKE '%ies'
       AND w NOT LIKE '%eies' AND w NOT LIKE '%aies'
    THEN substr(w, 1, len(w) - 3) || 'y'
  WHEN len(w) > 3 AND w LIKE '%es'
       AND w NOT LIKE '%aes' AND w NOT LIKE '%ees' AND w NOT LIKE '%oes'
    THEN substr(w, 1, len(w) - 1)
  WHEN len(w) > 2 AND w LIKE '%s'
       AND w NOT LIKE '%us' AND w NOT LIKE '%ss'
    THEN substr(w, 1, len(w) - 1)
  ELSE w
END
"""

_STEMMED_TF_ORACLE = f"""
WITH words AS (
  SELECT UNNEST(list_filter(
           string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != ''
         )) AS w
  FROM documents
),
stemmed AS (SELECT {_STEM_SQL} AS stem FROM words)
SELECT stem, COUNT(*)::BIGINT AS n
FROM stemmed
GROUP BY stem
ORDER BY n DESC, stem
LIMIT 25
"""


@register(
    "q_stemmed_term_freq",
    oracle=_STEMMED_TF_ORACLE,
    doc="S-stemmer top-25 term frequencies (E57): Harman's three plural "
    "rules as pure CASE/substring Columns (no UDF, identical semantics "
    "in both engines) over the corpus word stream — the vocabulary "
    "conflation step before TF-IDF/BM25 when a real stemmer dependency "
    "is unavailable; map-side stem, one partial-aggregated count",
)
def q_stemmed_term_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.functions.text import words as words_col

    docs = load_table(spark, sf_dir, "documents")
    w = F.col("w")
    stem = (
        F.when(
            (F.length(w) > 4)
            & w.endswith("ies")
            & ~w.endswith("eies")
            & ~w.endswith("aies"),
            F.concat(F.expr("substr(w, 1, length(w) - 3)"), F.lit("y")),
        )
        .when(
            (F.length(w) > 3)
            & w.endswith("es")
            & ~w.endswith("aes")
            & ~w.endswith("ees")
            & ~w.endswith("oes"),
            F.expr("substr(w, 1, length(w) - 1)"),
        )
        .when(
            (F.length(w) > 2)
            & w.endswith("s")
            & ~w.endswith("us")
            & ~w.endswith("ss"),
            F.expr("substr(w, 1, length(w) - 1)"),
        )
        .otherwise(w)
    )
    return (
        docs.select(F.explode(words_col("text")).alias("w"))
        .select(stem.alias("stem"))
        .groupBy("stem")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("stem"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# E56': BPE tokenizer application — encode the corpus with learned merges
# ---------------------------------------------------------------------------
_BPE_ENCODE_ORACLE = """
WITH words AS (
  SELECT doc_id, UNNEST(list_filter(
           string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != ''
         )) AS w
  FROM documents
)
SELECT COUNT(DISTINCT doc_id)::BIGINT AS n_docs,
       COUNT(*)::BIGINT AS n_words,
       TRUE AS sample_matches_reference
FROM words
"""


@register(
    "q_bpe_encode_stats",
    oracle=_BPE_ENCODE_ORACLE,
    doc="BPE tokenizer application (E56'): encode every document with "
    "the learned 12-merge table (Arrow-batched per-word lowest-rank "
    "loop), then audit — subword sequences of a deterministic "
    "hash-ordered 200-doc sample (absolute cap, O(1) in corpus size) "
    "must equal the driver-side reference encoding exactly; "
    "word mass (n_docs, n_words) is oracle-checked directly since "
    "subword concatenation preserves words",
)
def q_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators import bpe as B

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    vocab = B.word_freq_table(docs, "text").localCheckpoint()
    merges = B.learn_bpe(docs, "text", n_merges=_N_MERGES, vocab=vocab)
    enc = docs.select(
        "doc_id", B.encode_col("text", merges).alias("toks")
    ).localCheckpoint()  # encode ONCE; reused by both the stats and the audit

    # stats over the full corpus: every subword stream still spells its
    # words, so word counts are recoverable (and oracle-checkable) from
    # the END sentinel count. n_docs counts docs WITH at least one word —
    # the oracle's words CTE has no row for a word-less doc, so counting
    # every input doc would diverge on NULL/punctuation-only texts
    stats = enc.agg(
        F.sum((F.size("toks") > 0).cast("int")).alias("n_docs"),
        F.sum(
            F.size(F.filter("toks", lambda t: t.endswith(B.END)))
        ).alias("n_words"),
    )

    # audit: deterministic ABSOLUTE-size sample (hash-ordered top-200
    # doc_ids — a fractional sample would grow with the corpus; 2% of
    # 100 TB is 2 TB of text on the driver) re-encoded on the driver by
    # the same per-word algorithm running OUTSIDE Spark — proves the
    # distributed Arrow path transports text/tokens faithfully
    sample_ids = (
        docs.select("doc_id")
        .orderBy(F.xxhash64("doc_id"), "doc_id")
        .limit(_AUDIT_DOCS)
    )
    sample = enc.join(F.broadcast(sample_ids), "doc_id").join(
        docs, "doc_id"
    )
    import re

    rows = sample.select("doc_id", "text", "toks").collect()
    assert len(rows) <= _AUDIT_DOCS  # audit payload is O(1) in corpus size
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    wre = re.compile("[^a-z0-9]+")

    def ref_encode(t: str) -> list[str]:
        out: list[str] = []
        for w in wre.split((t or "").lower()):
            if not w:
                continue
            syms = list(w[:-1]) + [w[-1] + B.END]
            while len(syms) > 1:
                cand = [
                    (ranks[(syms[i], syms[i + 1])], i)
                    for i in range(len(syms) - 1)
                    if (syms[i], syms[i + 1]) in ranks
                ]
                if not cand:
                    break
                _, i = min(cand)
                syms[i : i + 2] = [syms[i] + syms[i + 1]]
            out.extend(syms)
        return out

    ok = all(list(r["toks"]) == ref_encode(r["text"]) for r in rows) and rows
    return stats.select(
        "n_docs", "n_words", F.lit(bool(ok)).alias("sample_matches_reference")
    )


# ---------------------------------------------------------------------------
# E66: inverted index at rest — BM25 from postings, oracle = direct calc
# ---------------------------------------------------------------------------


def _inverted_oracle() -> str:
    # the SAME SQL as the in-flight BM25 query: index-based search must
    # reproduce the direct computation bit-for-bit
    from dumpty_spark.queries.text3 import _BM25_ORACLE

    return _BM25_ORACLE


@register(
    "q_inverted_bm25",
    oracle=_inverted_oracle(),
    doc="inverted index at rest (E66): postings partitioned by term-hash "
    "bucket, df aggregated from the (hits-sized) pruned postings at "
    "search time — which is what keeps the layout append-only; the BM25 "
    "top-15 search reads ONLY the query terms' buckets (partition "
    "pruning + pushed term filter) and must reproduce the in-flight "
    "computation exactly — the oracle is verbatim the direct-calc SQL",
)
def q_inverted_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from dumpty_spark.operators.inverted import (
        inverted_index_build,
        inverted_search,
    )
    from dumpty_spark.queries.text3 import _QUERY_TERMS, _TOP_K
    from dumpty_spark.session import warehouse_scratch

    docs = load_table(spark, sf_dir, "documents")
    tmp = warehouse_scratch(spark, "inverted")
    try:
        inverted_index_build(docs, tmp)
        return inverted_search(
            spark, tmp, list(_QUERY_TERMS), topk=_TOP_K
        ).localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# E67: distributional atypicality — Jensen-Shannon vs the corpus
# ---------------------------------------------------------------------------
# Which source's unigram distribution diverges most from the corpus?
# The mixing/QC diagnostic behind data-recipe weighting (E47): a source
# with high JSD is stylistically/topically atypical. JSD(p‖c) with
# m=(p+c)/2 is computed SPARSELY: terms absent from the source
# contribute 0.5·c·ln(c/(c/2)) = 0.5·ln2·c, so
#   JSD = Σ_present [0.5·p·ln(p/m) + 0.5·c·ln(c/m)] + 0.5·ln2·(1 − C_present)
# where C_present is the corpus mass of the source's terms — no dense
# source×vocab expansion, everything rides the sparse (source, term)
# count table. Exact oracle, same identity in SQL.

_JSD_ORACLE = """
WITH tok AS (
  SELECT source, UNNEST(list_filter(
           string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != ''
         )) AS term
  FROM documents
),
sc AS (SELECT source, term, COUNT(*)::DOUBLE AS n FROM tok GROUP BY 1, 2),
stot AS (SELECT source, SUM(n) AS tot FROM sc GROUP BY 1),
ct AS (SELECT term, SUM(n) AS cn FROM sc GROUP BY 1),
ctot AS (SELECT SUM(cn) AS ctot FROM ct),
terms AS (
  SELECT sc.source, sc.n / stot.tot AS p, ct.cn / ctot.ctot AS c
  FROM sc
  JOIN stot USING (source)
  JOIN ct USING (term), ctot
),
agg AS (
  SELECT source,
         SUM(0.5 * p * ln(p / ((p + c) / 2))
             + 0.5 * c * ln(c / ((p + c) / 2))) AS present,
         SUM(c) AS c_present
  FROM terms GROUP BY source
)
SELECT source,
       ROUND(present + 0.5 * ln(2) * (1 - c_present), 4) AS jsd
FROM agg
ORDER BY jsd DESC, source
"""


@register(
    "q_source_divergence",
    oracle=_JSD_ORACLE,
    doc="per-source Jensen-Shannon divergence vs the corpus unigram "
    "distribution (E67): the distributional-atypicality ranking behind "
    "data-recipe weighting — computed sparsely (absent-term mass folds "
    "to a closed form, no source×vocab expansion), one token scan + "
    "vocab-sized aggregates",
)
def q_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.functions.text import words

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(words("text")).alias("term"))
    sc = tok.groupBy("source", "term").agg(
        F.count("*").cast("double").alias("n")
    )
    stot = sc.groupBy("source").agg(F.sum("n").alias("tot"))
    ct = sc.groupBy("term").agg(F.sum("n").alias("cn"))
    ctot = ct.agg(F.sum("cn").alias("ctot"))
    terms = (
        sc.join(F.broadcast(stot), "source")
        .join(ct, "term")
        .crossJoin(F.broadcast(ctot))
        .select(
            "source",
            (F.col("n") / F.col("tot")).alias("p"),
            (F.col("cn") / F.col("ctot")).alias("c"),
        )
    )
    m = (F.col("p") + F.col("c")) / 2
    agg = terms.groupBy("source").agg(
        F.sum(
            0.5 * F.col("p") * F.log(F.col("p") / m)
            + 0.5 * F.col("c") * F.log(F.col("c") / m)
        ).alias("present"),
        F.sum("c").alias("c_present"),
    )
    import math

    return agg.select(
        "source",
        F.round(
            F.col("present")
            + 0.5 * math.log(2.0) * (1 - F.col("c_present")),
            4,
        ).alias("jsd"),
    ).orderBy(F.desc("jsd"), F.asc("source"))
