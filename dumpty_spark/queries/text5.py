"""Round-4 text/dedup extensions: complete edit-distance join (E78),
PMI collocations (E79), tf-weighted Jaccard verification (E80),
cross-source contamination matrix (E89), Zipf's-law fit (E94)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E78: complete edit-distance similarity join — PassJoin segment filter
# ---------------------------------------------------------------------------
# The oracle is the NAIVE length-filtered self-join with levenshtein —
# hash-matching against it proves the segment-filtered candidate
# generation is COMPLETE (missed pair => missing row => mismatch), the
# same proof shape as q_prefix_filter_pairs for Jaccard.

_EDIT_D = 2

_EDIT_ORACLE = f"""
WITH p AS (
  SELECT doc_id, substr(text, 1, 40) AS s
  FROM documents WHERE text IS NOT NULL
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       levenshtein(a.s, b.s)::INTEGER AS dist
FROM p a JOIN p b
  ON a.doc_id < b.doc_id
 AND abs(length(a.s) - length(b.s)) <= {_EDIT_D}
 AND levenshtein(a.s, b.s) <= {_EDIT_D}
ORDER BY a_id, b_id
"""


@register(
    "q_edit_distance_pairs",
    oracle=_EDIT_ORACLE,
    doc=f"complete edit-distance join (E78): all pairs with "
    f"levenshtein <= {_EDIT_D} over 40-char document prefixes via "
    "PassJoin pigeonhole segment filtering (d+1 segments, ±d "
    "displacement probes, exact verify — no all-pairs stage anywhere); "
    "oracle is the naive quadratic join, so the hash match PROVES the "
    "candidate generation misses nothing",
)
def q_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators.editdist import edit_distance_pairs

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.substring("text", 1, 40).alias("prefix"))
    )
    return edit_distance_pairs(docs, "doc_id", "prefix", d=_EDIT_D).orderBy(
        "a_id", "b_id"
    )


# ---------------------------------------------------------------------------
# E79: PMI collocations — statistically-bound word pairs
# ---------------------------------------------------------------------------
# Pointwise mutual information over ADJACENT word pairs (Church & Hanks
# 1990, public literature): pmi = log2( p(a,b) / (p(a) p(b)) ). The
# collocation extractor every tokenizer/phrase-mining pass wants; a
# min-count floor keeps the estimator out of its high-variance tail.
# All partial-aggregable: one corpus scan for bigrams, one for unigrams.

_PMI_MIN = 25

_PMI_ORACLE = f"""
WITH words AS (
  SELECT doc_id, w, idx
  FROM (
    SELECT doc_id,
           UNNEST(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                              x -> x != '')) AS w,
           UNNEST(generate_series(1, len(list_filter(
             string_split_regex(lower(text), '[^a-z0-9]+'),
             x -> x != '')))) AS idx
    FROM documents
  )
),
bigrams AS (
  SELECT a.w AS wa, b.w AS wb, COUNT(*) AS nab
  FROM words a JOIN words b
    ON a.doc_id = b.doc_id AND b.idx = a.idx + 1
  GROUP BY a.w, b.w
),
uni AS (SELECT w, COUNT(*) AS n FROM words GROUP BY w),
tot AS (
  SELECT (SELECT SUM(nab) FROM bigrams)::DOUBLE AS nb,
         (SELECT SUM(n) FROM uni)::DOUBLE AS nw
)
SELECT wa, wb, nab,
       ROUND(log2((nab / t.nb) / ((ua.n / t.nw) * (ub.n / t.nw))), 4) AS pmi
FROM bigrams
JOIN uni ua ON ua.w = wa
JOIN uni ub ON ub.w = wb
CROSS JOIN tot t
WHERE nab >= {_PMI_MIN}
ORDER BY pmi DESC, wa, wb
LIMIT 20
"""


@register(
    "q_pmi_collocations",
    oracle=_PMI_ORACLE,
    doc=f"PMI collocations (E79): top-20 adjacent word pairs by "
    "pointwise mutual information (log2 p(a,b)/(p(a)p(b)), min count "
    f"{_PMI_MIN}) — the phrase-mining signal for tokenizer/vocab "
    "curation; two partial-aggregated corpus scans (bigrams via "
    "posexplode + self-zip, unigrams), counts joined groups-sized",
)
def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.functions.text import words as words_col

    docs = load_table(spark, sf_dir, "documents")
    ws = docs.select(words_col("text").alias("ws"))
    # bigrams map-side: zip words with their own tail, then one groupBy.
    # The size(ws) >= 2 guard matters: slice(ws, 1, size-1) on an empty
    # words array asks for length -1 and THROWS (wordless docs — empty
    # text, punctuation-only — are legal input); the oracle side simply
    # generates no bigrams for them, so filtering only this branch keeps
    # parity. Unigrams below stay UNfiltered to match the oracle's
    # corpus-wide counts.
    bigrams = (
        ws.filter(F.size("ws") >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.expr("slice(ws, 1, size(ws) - 1)"),
                    F.expr("slice(ws, 2, size(ws) - 1)"),
                )
            ).alias("p")
        )
        .select(
            F.col("p").getItem("0").alias("wa"),
            F.col("p").getItem("1").alias("wb"),
        )
        .groupBy("wa", "wb")
        .agg(F.count("*").alias("nab"))
    )
    uni = (
        ws.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    nb = bigrams.agg(F.sum("nab").cast("double").alias("nb"))
    nw = uni.agg(F.sum("n").cast("double").alias("nw"))
    ua = uni.select(F.col("w").alias("wa"), F.col("n").alias("na"))
    ub = uni.select(F.col("w").alias("wb"), F.col("n").alias("nb_"))
    return (
        bigrams.filter(F.col("nab") >= _PMI_MIN)
        .join(ua, "wa")
        .join(ub, "wb")
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nw))
        .select(
            "wa", "wb", "nab",
            F.round(
                F.log2(
                    (F.col("nab") / F.col("nb"))
                    / ((F.col("na") / F.col("nw")) * (F.col("nb_") / F.col("nw")))
                ),
                4,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "wa", "wb")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# E80: tf-weighted Jaccard over near-dup candidates
# ---------------------------------------------------------------------------
# Set Jaccard treats a shingle seen 40 times like one seen once;
# weighted Jaccard ( sum_min(tf) / sum_max(tf) ) is the standard
# repetition-aware refinement. Computed only on the CANDIDATE pairs the
# set-Jaccard join already surfaced (>= 0.5 here), so the cost is
# candidates × their shingle multisets — never all-pairs.

_WJACCARD_ORACLE = """
WITH tf AS (
  SELECT doc_id, sh, COUNT(*) AS tf
  FROM (
    SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
    FROM (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x != '') AS w
      FROM documents
    ), UNNEST(generate_series(1, len(w) - 2)) AS t(i)
  )
  GROUP BY doc_id, sh
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM tf GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS c
  FROM tf a JOIN tf b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
cand AS (
  SELECT a_id, b_id FROM inter
  JOIN sizes sa ON sa.doc_id = a_id
  JOIN sizes sb ON sb.doc_id = b_id
  WHERE ROUND(c::DOUBLE / (sa.n + sb.n - c), 4) >= 0.5
),
pairsh AS (
  SELECT c.a_id, c.b_id, s.sh FROM cand c JOIN tf s ON s.doc_id = c.a_id
  UNION
  SELECT c.a_id, c.b_id, s.sh FROM cand c JOIN tf s ON s.doc_id = c.b_id
),
m AS (
  SELECT p.a_id, p.b_id,
         COALESCE(ta.tf, 0) AS tf_a, COALESCE(tb.tf, 0) AS tf_b
  FROM pairsh p
  LEFT JOIN tf ta ON ta.doc_id = p.a_id AND ta.sh = p.sh
  LEFT JOIN tf tb ON tb.doc_id = p.b_id AND tb.sh = p.sh
)
SELECT a_id, b_id,
       ROUND(SUM(LEAST(tf_a, tf_b))::DOUBLE
             / SUM(GREATEST(tf_a, tf_b)), 4) AS weighted_jac
FROM m GROUP BY a_id, b_id
ORDER BY a_id, b_id
"""


@register(
    "q_weighted_jaccard",
    oracle=_WJACCARD_ORACLE,
    doc="tf-weighted Jaccard (E80): sum-min/sum-max over shingle "
    "term frequencies, computed ONLY on the candidate pairs the set-"
    "Jaccard join surfaced (threshold 0.5) — the repetition-aware "
    "refinement pass of a dedup pipeline; candidates-sized joins, "
    "never all-pairs",
)
def q_weighted_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators import dedup as D

    from dumpty_spark.functions.text import words as words_col
    from dumpty_spark.operators.util import ensure_parallelism

    from dumpty_spark.queries.shared_graph import jaccard_pair_graph

    docs = load_table(spark, sf_dir, "documents")
    cand = jaccard_pair_graph(spark, sf_dir, threshold=0.5).select(
        "a_id", "b_id"
    )
    # RAW shingle multiset (shingle_sets dedups per doc — set semantics
    # is exactly what weighted Jaccard exists to refine, so re-derive
    # with multiplicities kept; the n>=3 guard avoids sequence(1,0)
    # descending on short docs)
    ws = ensure_parallelism(
        docs.select(F.col("doc_id").alias("id"), words_col("text").alias("w"))
    )
    raw = ws.select(
        "id",
        F.explode(
            F.when(
                F.size("w") >= 3,
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - 2),
                    lambda p: F.array_join(F.slice("w", p, 3), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("shingle"),
    )
    sh = raw.groupBy("id", "shingle").agg(F.count("*").alias("tf"))
    a = sh.select(
        F.col("id").alias("a_id"), "shingle", F.col("tf").alias("tf_a")
    )
    b = sh.select(
        F.col("id").alias("b_id"), "shingle", F.col("tf").alias("tf_b")
    )
    # full multiset union per pair: join each side's shingles onto the
    # candidate list, then merge on (pair, shingle) with outer semantics
    ua = cand.join(a, "a_id").select("a_id", "b_id", "shingle", "tf_a")
    ub = cand.join(b, "b_id").select("a_id", "b_id", "shingle", "tf_b")
    merged = ua.join(ub, ["a_id", "b_id", "shingle"], "full").select(
        "a_id", "b_id",
        F.coalesce("tf_a", F.lit(0)).alias("tf_a"),
        F.coalesce("tf_b", F.lit(0)).alias("tf_b"),
    )
    return (
        merged.groupBy("a_id", "b_id")
        .agg(
            F.round(
                F.sum(F.least("tf_a", "tf_b"))
                / F.sum(F.greatest("tf_a", "tf_b")),
                4,
            ).alias("weighted_jac")
        )
        .orderBy("a_id", "b_id")
    )


# ---------------------------------------------------------------------------
# E89: cross-source contamination matrix — pairwise 8-gram overlap
# ---------------------------------------------------------------------------
# E4'''s sweep answers "which TEST docs touch the train split";
# the matrix answers the corpus-level question "which SOURCES share
# passages with which" — the number that prices a new acquisition
# against everything already ingested. Join is on the distinct gram
# (fan-out only on genuinely shared passages; sources-per-gram is
# bounded by the source count), never doc x doc.

from dumpty_spark.functions import text as X  # noqa: E402
from dumpty_spark.queries.text import _WORDS_SQL  # noqa: E402

_OVERLAP_ORACLE = f"""
WITH w AS (
  SELECT doc_id, source, {_WORDS_SQL} AS w FROM documents
),
sh AS (
  SELECT DISTINCT source, array_to_string(w[p:p+7], ' ') AS g
  FROM w, UNNEST(generate_series(1, GREATEST(len(w) - 7, 0))) AS t(p)
),
sz AS (SELECT source, COUNT(*)::DOUBLE AS n FROM sh GROUP BY source),
ov AS (
  SELECT a.source AS src_a, b.source AS src_b, COUNT(*)::DOUBLE AS common
  FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
  GROUP BY 1, 2
)
SELECT ov.src_a, ov.src_b,
       za.n::BIGINT AS grams_a, zb.n::BIGINT AS grams_b,
       ov.common::BIGINT AS common_grams,
       ROUND(ov.common / LEAST(za.n, zb.n), 4) AS containment,
       ROUND(ov.common / (za.n + zb.n - ov.common), 4) AS jaccard
FROM ov
JOIN sz za ON za.source = ov.src_a
JOIN sz zb ON zb.source = ov.src_b
ORDER BY src_a, src_b
"""


@register(
    "q_source_overlap_matrix",
    oracle=_OVERLAP_ORACLE,
    doc="cross-source contamination matrix (E89): pairwise 8-gram "
    "overlap between SOURCES (containment + Jaccard per pair) — the "
    "corpus-level complement of E4'''s per-doc train/test sweep; the "
    "pair stage joins on the distinct gram (fan-out only on genuinely "
    "shared passages, sources-per-gram bounded by the source count), "
    "never doc x doc",
)
def q_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = (
        docs.select("source", X.words("text").alias("__w"))
        .select(
            "source",
            F.explode(X.shingles_from_words(F.col("__w"), 8)).alias("g"),
        )
        .distinct()
    )
    sz = sh.groupBy("source").agg(F.count(F.lit(1)).cast("double").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    ov = (
        a.join(b, (F.col("a.g") == F.col("b.g"))
               & (F.col("a.source") < F.col("b.source")))
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("common"))
    )
    za = sz.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
    zb = sz.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
    return (
        ov.join(F.broadcast(za), "src_a")
        .join(F.broadcast(zb), "src_b")
        .select(
            "src_a", "src_b",
            F.col("na").cast("long").alias("grams_a"),
            F.col("nb").cast("long").alias("grams_b"),
            F.col("common").cast("long").alias("common_grams"),
            F.round(F.col("common") / F.least("na", "nb"), 4).alias(
                "containment"
            ),
            F.round(
                F.col("common") / (F.col("na") + F.col("nb") - F.col("common")),
                4,
            ).alias("jaccard"),
        )
        .orderBy("src_a", "src_b")
    )

# ---------------------------------------------------------------------------
# E94: Zipf fit — is this corpus shaped like natural language?
# ---------------------------------------------------------------------------
# Log-log OLS over the top-1000 token frequencies: natural corpora fit
# ln(freq) ≈ a + s·ln(rank) with s ≈ -1; machine-generated or
# boilerplate-heavy corpora bend away from it, so (slope, R²) is a
# cheap corpus-health fingerprint. The top-K cut is TakeOrderedAndProject
# (per-partition top-k then merge — never a global sort), the fit runs
# on the K-row frame. Deterministic rank tie-break by token.

_ZIPF_K = 1000

_ZIPF_ORACLE = f"""
WITH tok AS (
  SELECT UNNEST({_WORDS_SQL}) AS token FROM documents
),
freq AS (SELECT token, COUNT(*)::DOUBLE AS f FROM tok GROUP BY token),
top AS (
  SELECT token, f,
         ROW_NUMBER() OVER (ORDER BY f DESC, token) AS rnk
  FROM freq
  QUALIFY rnk <= {_ZIPF_K}
),
xy AS (SELECT LN(rnk::DOUBLE) AS x, LN(f) AS y FROM top),
s AS (
  SELECT COUNT(*)::DOUBLE AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
  FROM xy
)
SELECT n::BIGINT AS n_tokens,
       ROUND((n*sxy - sx*sy) / (n*sxx - sx*sx), 4) AS zipf_slope,
       ROUND((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n, 4)
         AS zipf_intercept,
       ROUND(POW(n*sxy - sx*sy, 2) / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 4)
         AS r2
FROM s
"""


@register(
    "q_zipf_fit",
    oracle=_ZIPF_ORACLE,
    doc="Zipf's-law fit (E94): log-log OLS of the top-1000 token "
    "frequencies (slope ≈ -1 and high R² on natural language; "
    "boilerplate bends away) — the top-K cut is per-partition top-k "
    "merge, the moment-sum fit runs on the K-row frame; corpus-health "
    "fingerprint next to E4's quality scores",
)
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(X.words("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("double").alias("f"))
    )
    top = (
        freq.orderBy(F.desc("f"), F.asc("token"))
        .limit(_ZIPF_K)
        .withColumn(
            "rnk", F.row_number().over(W.orderBy(F.desc("f"), F.asc("token")))
        )
    )
    xy = top.select(
        F.log(F.col("rnk").cast("double")).alias("x"), F.log("f").alias("y")
    )
    s = xy.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").cast("long").alias("n_tokens"),
        F.round(slope, 4).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 4).alias(
            "zipf_intercept"
        ),
        F.round(
            F.pow(F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"), 2)
            / (
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            4,
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# E95: n-gram novelty — how much of each source is unique text?
# ---------------------------------------------------------------------------
# The inverse view of E89's overlap matrix: per document, the share of
# its distinct 8-grams that occur NOWHERE else in the corpus (df = 1),
# rolled up to a per-source mean. High novelty = fresh text worth
# keeping; low novelty = boilerplate/templates the dedup family will
# collapse. Gram df is one partial-aggregated count on the distinct
# (doc, gram) pairs; everything joins on the gram key.

_NOVELTY_ORACLE = f"""
WITH w AS (
  SELECT doc_id, source, {_WORDS_SQL} AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, source, array_to_string(w[p:p+7], ' ') AS g
  FROM w, UNNEST(generate_series(1, GREATEST(len(w) - 7, 0))) AS t(p)
),
df AS (SELECT g, COUNT(*) AS df FROM sh GROUP BY g),
per_doc AS (
  SELECT sh.doc_id, sh.source,
         COUNT(*)::DOUBLE AS n_grams,
         COUNT(*) FILTER (WHERE df.df = 1)::DOUBLE AS n_unique
  FROM sh JOIN df USING (g)
  GROUP BY sh.doc_id, sh.source
)
SELECT source,
       COUNT(*)::BIGINT AS n_docs,
       ROUND(AVG(n_unique / n_grams), 4) AS avg_novelty,
       ROUND(SUM(n_unique) / SUM(n_grams), 4) AS gram_novelty
FROM per_doc
GROUP BY source
ORDER BY source
"""


@register(
    "q_ngram_novelty",
    oracle=_NOVELTY_ORACLE,
    doc="n-gram novelty (E95): per-source mean share of each doc's "
    "distinct 8-grams that occur nowhere else in the corpus (df=1) — "
    "the inverse view of E89's overlap matrix; high novelty = fresh "
    "text, low = boilerplate the dedup family collapses. One "
    "partial-agg df count on distinct (doc, gram), joins on the gram "
    "key only",
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r11 optimization note (negative result, kept on record): a
    # map-side array_distinct + owner-doc rewrite that cut the plan to
    # one gram-keyed exchange measured 5x SLOWER (2.6s -> 12.6s solo) —
    # array_distinct over the long 8-gram string arrays is quadratic
    # per row and dwarfs the exchange it saved. The distinct-exchange
    # formulation below is the fast shape; Spark reuses the distinct's
    # exchange for both the df rollup and the join-back.
    docs = load_table(spark, sf_dir, "documents")
    sh = (
        docs.select("doc_id", "source", X.words("text").alias("__w"))
        .select(
            "doc_id",
            "source",
            F.explode(X.shingles_from_words(F.col("__w"), 8)).alias("g"),
        )
        .distinct()
    )
    dfc = sh.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        sh.join(dfc, "g")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_grams"),
            F.count(F.when(F.col("df") == 1, 1)).cast("double").alias(
                "n_unique"
            ),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(F.col("n_unique") / F.col("n_grams")), 4).alias(
                "avg_novelty"
            ),
            F.round(F.sum("n_unique") / F.sum("n_grams"), 4).alias(
                "gram_novelty"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# E96: Heaps'-law fit — vocabulary growth V(n) ≈ K·n^β
# ---------------------------------------------------------------------------
# The companion of the E94 Zipf fit: how fast does the vocabulary grow
# as the corpus streams in? β far from ~0.5 flags template text (slow
# growth) or OCR noise (runaway growth). Needs a TOTAL order over all
# corpus tokens — built with the E9 scalable global row number (slice
# boundaries + per-slice windows + broadcast offsets), never a
# single-partition ROW_NUMBER. First-occurrence index per token is one
# partial-agg min; V(n) at 9 deterministic fractional checkpoints of
# the total token count; log-log OLS on the 9-row frame.

_HEAPS_FRACS = (0.005, 0.01, 0.02, 0.05, 0.1, 0.2, 0.4, 0.7, 1.0)

_HEAPS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, UNNEST(w) AS token, generate_subscripts(w, 1) AS idx
  FROM (SELECT doc_id, {_WORDS_SQL} AS w FROM documents)
),
rn AS (
  SELECT token, ROW_NUMBER() OVER (ORDER BY doc_id, idx) AS gidx FROM tok
),
first AS (SELECT token, MIN(gidx) AS fidx FROM rn GROUP BY token),
nn AS (SELECT COUNT(*)::DOUBLE AS nt FROM tok),
cps AS (
  SELECT DISTINCT GREATEST(1, CAST(FLOOR(f * nt) AS BIGINT)) AS n
  FROM UNNEST([{', '.join(str(f) for f in _HEAPS_FRACS)}]) AS t(f)
  CROSS JOIN nn
),
v AS (
  SELECT c.n, COUNT(*)::DOUBLE AS vn
  FROM cps c JOIN first f ON f.fidx <= c.n
  GROUP BY c.n
),
xy AS (SELECT LN(n::DOUBLE) AS x, LN(vn) AS y FROM v),
s AS (
  SELECT COUNT(*)::DOUBLE AS k, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
  FROM xy
)
SELECT k::BIGINT AS n_checkpoints,
       ROUND((k*sxy - sx*sy) / (k*sxx - sx*sx), 4) AS heaps_beta,
       ROUND(EXP((sy - (k*sxy - sx*sy) / (k*sxx - sx*sx) * sx) / k), 4)
         AS heaps_k,
       ROUND(POW(k*sxy - sx*sy, 2) / ((k*sxx - sx*sx) * (k*syy - sy*sy)), 4)
         AS r2
FROM s
"""


@register(
    "q_heaps_fit",
    oracle=_HEAPS_ORACLE,
    doc="Heaps'-law fit (E96): vocabulary growth V(n) = K·n^β over 9 "
    "fractional checkpoints of the token stream — the total token order "
    "comes from the E9 scalable global row number (slice windows + "
    "broadcast offsets, never one partition), first occurrences are a "
    "partial-agg min, the fit is a moment-sum OLS on the 9-row frame; "
    "the growth-side companion of E94's Zipf fit",
)
def q_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators.rownum import global_row_number

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(X.words("text")).alias("idx", "token")
    )
    rn = global_row_number(tok, ["doc_id", "idx"], out_col="gidx")
    first = rn.groupBy("token").agg(F.min("gidx").alias("fidx"))
    nn = tok.agg(F.count(F.lit(1)).cast("double").alias("nt"))
    fr = docs.sparkSession.createDataFrame(
        [(f,) for f in _HEAPS_FRACS], "f double"
    )
    cps = (
        fr.crossJoin(F.broadcast(nn))
        .select(
            F.greatest(
                F.lit(1), F.floor(F.col("f") * F.col("nt")).cast("long")
            ).alias("n")
        )
        .distinct()
    )
    v = (
        first.crossJoin(F.broadcast(cps))
        .filter(F.col("fidx") <= F.col("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("double").alias("vn"))
    )
    xy = v.select(
        F.log(F.col("n").cast("double")).alias("x"), F.log("vn").alias("y")
    )
    s = xy.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    slope = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("k").cast("long").alias("n_checkpoints"),
        F.round(slope, 4).alias("heaps_beta"),
        F.round(
            F.exp((F.col("sy") - slope * F.col("sx")) / F.col("k")), 4
        ).alias("heaps_k"),
        F.round(
            F.pow(F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"), 2)
            / (
                (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("k") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            4,
        ).alias("r2"),
    )
