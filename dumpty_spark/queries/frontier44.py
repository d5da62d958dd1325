"""Round-10 engine extensions (EXT E232-E235): isotonic calibration via
the minimax formulation, one-way ANOVA, Krippendorff's alpha, and
ROUGE-1/2 — four concept gaps the r1-r9 surface did not cover
(calibration FIT next to E141's calibration AUDIT, the k-group
extension of E103's Welch t-test, the multi-rater generalization of
E231's Cohen kappa, and the recall-oriented sibling of E196's BLEU).

Born under the r10 oracle-independence discipline (ORACLE_AUDIT.md
maintenance rule): each query's oracle replays a shared closed form, so
each ships WITH an independent anchor in tests/test_frontier44.py —
a genuinely different algorithm (stack-based PAV vs the minimax
formula), a variance-partition identity, a coincidence-matrix
recomputation, and cross-metric integer equalities.

Portability disciplines (memory: oracle-portability-traps): float sums
over unordered streams are avoided by integerizing per term (ANOVA's
fixed 1e3 value grid -> exact BIGINT moments), every ratio is a single
division of exact integers, and the isotonic fit is built from prefix
sums of BIGINT counts so both engines derive identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E232: isotonic calibration fit (pool-adjacent-violators, minimax form)
# ---------------------------------------------------------------------------
# E141 AUDITS calibration (per-bin gap, ECE); this FITS the monotone
# correction map every production scorer ships with. Instead of the
# sequential PAV pooling loop (driver-side, order-dependent), the fit is
# computed by PAV's closed-form characterization
#     iso_i = max_{j<=i} min_{k>=i} wmean(y, j..k)
# over the decile bins — a BINS-CUBED relational expression (10 bins ->
# ~220 interval rows) built from prefix sums of exact BIGINT (n, pos)
# counts, so it is pure declarative SQL on BOTH engines and trivially
# metadata-sized at any corpus scale (scale lives in the one binning
# scan; the fit is O(B^3) on B=10 rows). The oracle replays the same
# minimax expression; the INDEPENDENT anchor is a stack-based PAV
# implementation in tests/test_frontier44.py — a genuinely different
# algorithm that must produce the identical fit (plus monotonicity and
# the ECE-improvement guarantee on the fit data).

_ISO_ORACLE = """
WITH st AS (
  SELECT ROUND(AVG(n_chars), 6) AS mu,
         ROUND(STDDEV_POP(n_chars), 6) AS sd
  FROM documents
),
scored AS (
  SELECT 1.0 / (1.0 + EXP(-ROUND((d.n_chars - st.mu) / st.sd, 6))) AS p,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents d, st
),
binned AS (
  SELECT LEAST(FLOOR(p * 10), 9)::BIGINT AS bin, p, y FROM scored
),
b AS (
  SELECT bin, COUNT(*)::BIGINT AS n, SUM(y)::BIGINT AS pos,
         AVG(p) AS mean_p
  FROM binned GROUP BY bin
),
c AS (
  SELECT bin, n, pos, mean_p,
         SUM(n) OVER (ORDER BY bin) AS cn,
         SUM(pos) OVER (ORDER BY bin) AS cp
  FROM b
),
iv AS (
  SELECT j.bin AS j, k.bin AS k,
         (k.cp - (j.cp - j.pos)) / CAST(k.cn - (j.cn - j.n) AS DOUBLE) AS wm
  FROM c j JOIN c k ON j.bin <= k.bin
),
inner_min AS (
  SELECT i.bin AS bin, iv.j, MIN(iv.wm) AS mn
  FROM c i JOIN iv ON iv.j <= i.bin AND iv.k >= i.bin
  GROUP BY i.bin, iv.j
),
iso AS (SELECT bin, MAX(mn) AS fit FROM inner_min GROUP BY bin),
ece AS (
  SELECT SUM(b.n * ABS(b.mean_p - b.pos / CAST(b.n AS DOUBLE))) / SUM(b.n)
           AS raw,
         SUM(b.n * ABS(b.mean_p - iso.fit)) / SUM(b.n) AS fitted
  FROM b JOIN iso USING (bin)
)
SELECT b.bin, b.n,
       ROUND(b.pos / CAST(b.n AS DOUBLE), 6) AS frac_pos,
       ROUND(iso.fit, 6) AS iso_fit,
       ROUND(ece.raw, 4) AS ece_raw,
       ROUND(ece.fitted, 4) AS ece_iso
FROM b JOIN iso USING (bin), ece
ORDER BY b.bin
"""


@register(
    "q_isotonic_calibration",
    oracle=_ISO_ORACLE,
    doc="isotonic calibration fit (E232): PAV via its minimax closed "
    "form iso_i = max_{j<=i} min_{k>=i} wmean(j..k) over decile bins — "
    "a bins-cubed relational expression from BIGINT prefix sums (pure "
    "SQL both engines, metadata-sized at any scale); reports the "
    "monotone fit per bin plus ECE before/after; independently anchored "
    "by a stack-based PAV in tests/test_frontier44.py",
)
def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    st = docs.agg(
        F.round(F.avg("n_chars"), 6).alias("mu"),
        F.round(F.stddev_pop("n_chars"), 6).alias("sd"),
    )
    scored = docs.crossJoin(F.broadcast(st)).select(
        (
            F.lit(1.0)
            / (
                F.lit(1.0)
                + F.exp(
                    -F.round((F.col("n_chars") - F.col("mu")) / F.col("sd"), 6)
                )
            )
        ).alias("p"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    b = (
        scored.select(
            F.least(F.floor(F.col("p") * 10), F.lit(9)).cast("long").alias("bin"),
            "p",
            "y",
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.sum("y").cast("long").alias("pos"),
            F.avg("p").alias("mean_p"),
        )
        .localCheckpoint()  # bins-sized; reused by intervals + ECE
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    c = b.select(
        "bin", "n", "pos", "mean_p",
        F.sum("n").over(w).alias("cn"),
        F.sum("pos").over(w).alias("cp"),
    )
    j = c.select(
        F.col("bin").alias("j"),
        (F.col("cp") - F.col("pos")).alias("cp0"),
        (F.col("cn") - F.col("n")).alias("cn0"),
    )
    k = c.select(
        F.col("bin").alias("k"), F.col("cp").alias("cpk"), F.col("cn").alias("cnk")
    )
    iv = (
        j.crossJoin(k)
        .filter(F.col("j") <= F.col("k"))
        .select(
            "j",
            "k",
            (
                (F.col("cpk") - F.col("cp0"))
                / (F.col("cnk") - F.col("cn0")).cast("double")
            ).alias("wm"),
        )
    )
    i = c.select(F.col("bin").alias("i"))
    inner = (
        i.crossJoin(iv)
        .filter((F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")))
        .groupBy("i", "j")
        .agg(F.min("wm").alias("mn"))
    )
    iso = inner.groupBy("i").agg(F.max("mn").alias("fit")).withColumnRenamed(
        "i", "bin"
    )
    joined = b.join(iso, "bin")
    ece = joined.agg(
        (
            F.sum(
                F.col("n")
                * F.abs(F.col("mean_p") - F.col("pos") / F.col("n").cast("double"))
            )
            / F.sum("n")
        ).alias("raw"),
        (
            F.sum(F.col("n") * F.abs(F.col("mean_p") - F.col("fit")))
            / F.sum("n")
        ).alias("fitted"),
    )
    return (
        joined.crossJoin(F.broadcast(ece))
        .select(
            "bin",
            "n",
            F.round(F.col("pos") / F.col("n").cast("double"), 6).alias(
                "frac_pos"
            ),
            F.round("fit", 6).alias("iso_fit"),
            F.round("raw", 4).alias("ece_raw"),
            F.round("fitted", 4).alias("ece_iso"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# E233: one-way ANOVA (F statistic + eta-squared)
# ---------------------------------------------------------------------------
# The k-group extension of the Welch t-test (E103): does event value
# differ BY TYPE at all? Values are integerized to a fixed 1e3 grid per
# term (v_mu = ROUND(value*1000) as BIGINT — one IEEE op each), so the
# per-group moments (n, SUM vm, SUM vm*vm) are EXACT integers; the
# per-term square stays < 2^63 through x100 of sf0.1. The group-sum
# square s*s does NOT (s ~ rows*grid — its BIGINT square overflows past
# ~1e6 rows; the x10 sweep caught exactly that), so s is CAST to DOUBLE
# before squaring, identically on both engines — exact-integer inputs
# through one fixed double expression tree still give bit-equal
# results. SST = SSB + SSW holds to double precision — an identity the
# independence anchor asserts, alongside a full numpy recomputation.
# One partial-agg scan; the group frame is k-sized at any scale.

_ANOVA_ORACLE = """
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 1000, 0) AS BIGINT) AS vm
  FROM events
),
g AS (
  -- ss stays HUGEINT (no ::BIGINT cast): the SUMMED squares can exceed
  -- 2^63 on a large enough store even when each per-term square fits;
  -- Spark mirrors with a DECIMAL(38,0) sum so neither engine wraps
  SELECT event_type, COUNT(*)::BIGINT AS n, SUM(vm)::BIGINT AS s,
         SUM(vm * vm) AS ss
  FROM v GROUP BY event_type
),
t AS (
  SELECT COUNT(*)::BIGINT AS k, SUM(n)::BIGINT AS n, SUM(s)::BIGINT AS s,
         SUM(ss) AS ss,
         -- s*s must square in DOUBLE: the group sum itself is ~rows*grid
         -- and its BIGINT square overflows past ~1e6 rows (the x10 sweep
         -- caught exactly this); CAST first, identically on both engines
         SUM(CAST(s AS DOUBLE) * s / CAST(n AS DOUBLE)) AS grp_sq
  FROM g
)
SELECT k, n,
       ROUND((ss - CAST(s AS DOUBLE) * s / n) / 1000000.0, 4) AS ss_total,
       ROUND((grp_sq - CAST(s AS DOUBLE) * s / n) / 1000000.0, 4)
         AS ss_between,
       ROUND((ss - grp_sq) / 1000000.0, 4) AS ss_within,
       ROUND(((grp_sq - CAST(s AS DOUBLE) * s / n) / (k - 1))
             / ((ss - grp_sq) / (n - k)), 4) AS f_stat,
       ROUND((grp_sq - CAST(s AS DOUBLE) * s / n)
             / (ss - CAST(s AS DOUBLE) * s / n), 6) AS eta_sq
FROM t
"""


@register(
    "q_anova_oneway",
    oracle=_ANOVA_ORACLE,
    doc="one-way ANOVA (E233): F statistic and eta-squared for event "
    "value by type — per-term 1e3-grid integerization gives exact "
    "BIGINT moments (no float sum over an unordered stream), SST/SSB/"
    "SSW closed forms of exact integers with the variance partition "
    "holding exactly; one partial-agg scan, k-sized group frame, 1-row "
    "result; numpy-anchored in tests/test_frontier44.py",
)
def q_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.round(F.col("value") * 1000, 0).cast("long").alias("vm"),
    )
    g = v.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("vm").alias("s"),
        # per-term square fits a BIGINT (|vm| <= ~1e7 on this grid), but
        # the SUM of squares can pass 2^63 on a large enough store —
        # Spark's non-ANSI long sum wraps SILENTLY while the DuckDB
        # oracle's HUGEINT raises on a ::BIGINT cast, so a big store
        # would diverge instead of failing loudly.  Sum in DECIMAL(38,0)
        # (exact to 1e38; overflow -> NULL -> loud hash mismatch, never
        # a silent wrap); the oracle keeps its native HUGEINT sum.
        F.sum((F.col("vm") * F.col("vm")).cast("decimal(38,0)")).alias(
            "ss"
        ),
    )
    t = g.agg(
        F.count("*").alias("k"),
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.sum("ss").alias("ss"),
        # square in DOUBLE — a BIGINT s*s overflows past ~1e6 rows (the
        # x10 sweep caught this); the oracle casts identically
        F.sum(
            F.col("s").cast("double") * F.col("s") / F.col("n").cast("double")
        ).alias("grp_sq"),
    )
    sq = F.col("s").cast("double") * F.col("s") / F.col("n").cast("double")
    sst = F.col("ss") - sq
    ssb = F.col("grp_sq") - sq
    ssw = F.col("ss") - F.col("grp_sq")
    return t.select(
        "k",
        "n",
        F.round(sst / 1e6, 4).alias("ss_total"),
        F.round(ssb / 1e6, 4).alias("ss_between"),
        F.round(ssw / 1e6, 4).alias("ss_within"),
        F.round((ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))), 4)
        .alias("f_stat"),
        F.round(ssb / sst, 6).alias("eta_sq"),
    )


# ---------------------------------------------------------------------------
# E234: Krippendorff's alpha (3 raters, nominal, complete data)
# ---------------------------------------------------------------------------
# E231's Cohen kappa handles exactly TWO raters; annotation pipelines
# routinely run 3+ (two models + a heuristic, or annotator triples).
# Krippendorff's alpha generalizes: with m=3 binary raters per unit and
# complete data, the coincidence-matrix machinery collapses to exact
# integers — per unit the pairwise-disagreement mass is n0*n1 (n1 =
# positive votes), and
#     alpha = 1 - (n-1) * sum_u(n0_u*n1_u) / (2 * N0 * N1)
# with n = 3*units, N0/N1 the global vote totals. Raters: R1 = n_chars
# above corpus median (E231), R2 = distinct-word ratio > 0.5 (E231),
# R3 = word count above corpus median. One scan to a 1-row integer
# contingency; the independence anchor recomputes alpha through the
# full D_o/D_e coincidence formulation in numpy.

_KRIPP_ORACLE = """
WITH med AS (
  SELECT quantile_cont(n_chars, 0.5) AS mc,
         quantile_cont(len(list_filter(
           string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')), 0.5)
           AS mw
  FROM documents
),
lab AS (
  SELECT COALESCE(d.n_chars > med.mc, FALSE)::INT AS r1,
         COALESCE(LENGTH(TRIM(d.text)) > 0 AND
          CAST(LENGTH(list_distinct(list_filter(
              string_split_regex(lower(d.text), '[^a-z0-9]+'),
              x -> x != ''))) AS DOUBLE)
          / GREATEST(LENGTH(list_filter(
              string_split_regex(lower(d.text), '[^a-z0-9]+'),
              x -> x != '')), 1) > 0.5, FALSE)::INT AS r2,
         COALESCE(LENGTH(list_filter(
           string_split_regex(lower(d.text), '[^a-z0-9]+'),
           x -> x != '')) > med.mw, FALSE)::INT AS r3
  FROM documents d, med
),
u AS (
  SELECT (r1 + r2 + r3)::BIGINT AS n1, (3 - r1 - r2 - r3)::BIGINT AS n0
  FROM lab
),
ct AS (
  SELECT COUNT(*)::BIGINT AS units,
         SUM(n1)::BIGINT AS pos_votes,
         SUM(n0)::BIGINT AS neg_votes,
         SUM(n0 * n1)::BIGINT AS pair_disagreements
  FROM u
)
SELECT units, 3 * units AS n_values, neg_votes, pos_votes,
       pair_disagreements,
       ROUND(pair_disagreements / CAST(3 * units AS DOUBLE), 6) AS d_o,
       ROUND(2.0 * neg_votes * pos_votes
             / (CAST(3 * units AS DOUBLE) * (3 * units - 1)), 6) AS d_e,
       ROUND(1.0 - (3 * units - 1) * pair_disagreements
             / (2.0 * neg_votes * pos_votes), 6) AS alpha
FROM ct
"""


@register(
    "q_krippendorff_alpha",
    oracle=_KRIPP_ORACLE,
    doc="Krippendorff's alpha (E234): chance-corrected agreement of "
    "THREE deterministic binary raters (length, lexical density, word "
    "count) — the multi-rater generalization of E231's kappa; with "
    "complete nominal data the coincidence machinery collapses to "
    "alpha = 1 - (n-1)*S/(2*N0*N1) over exact integers, one scan, "
    "1-row result; D_o/D_e-anchored in tests/test_frontier44.py",
)
def q_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    med = docs.agg(
        F.expr("percentile(n_chars, 0.5)").alias("mc"),
        F.expr(
            "percentile(size(array_remove(split(lower(text), "
            "'[^a-z0-9]+'), '')), 0.5)"
        ).alias("mw"),
    )
    wordsarr = F.filter(
        F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != ""
    )
    lab = docs.crossJoin(F.broadcast(med)).select(
        F.coalesce(F.col("n_chars") > F.col("mc"), F.lit(False))
        .cast("int")
        .alias("r1"),
        F.coalesce(
            (F.length(F.trim("text")) > 0)
            & (
                F.size(F.array_distinct(wordsarr)).cast("double")
                / F.greatest(F.size(wordsarr), F.lit(1))
                > 0.5
            ),
            F.lit(False),
        )
        .cast("int")
        .alias("r2"),
        F.coalesce(F.size(wordsarr) > F.col("mw"), F.lit(False))
        .cast("int")
        .alias("r3"),
    )
    u = lab.select(
        (F.col("r1") + F.col("r2") + F.col("r3")).cast("long").alias("n1"),
        (F.lit(3) - F.col("r1") - F.col("r2") - F.col("r3"))
        .cast("long")
        .alias("n0"),
    )
    ct = u.agg(
        F.count("*").alias("units"),
        F.sum("n1").alias("pos_votes"),
        F.sum("n0").alias("neg_votes"),
        F.sum(F.col("n0") * F.col("n1")).alias("pair_disagreements"),
    )
    n = 3 * F.col("units")
    return ct.select(
        "units",
        n.alias("n_values"),
        "neg_votes",
        "pos_votes",
        "pair_disagreements",
        F.round(F.col("pair_disagreements") / n.cast("double"), 6).alias("d_o"),
        F.round(
            2.0
            * F.col("neg_votes")
            * F.col("pos_votes")
            / (n.cast("double") * (n - 1)),
            6,
        ).alias("d_e"),
        F.round(
            1.0
            - (n - 1)
            * F.col("pair_disagreements")
            / (2.0 * F.col("neg_votes") * F.col("pos_votes")),
            6,
        ).alias("alpha"),
    )


# ---------------------------------------------------------------------------
# E235: corpus ROUGE-1/2 (recall + F1) over the BLEU pair fixture
# ---------------------------------------------------------------------------
# E196's BLEU is precision-oriented (hits over CANDIDATE totals with a
# brevity penalty); summarization eval reports ROUGE — the same clipped
# n-gram hits over REFERENCE totals (recall) plus the F1 combination.
# Because min(c,r) is symmetric, the clipped hit integers are EXACTLY
# BLEU's (tests/test_frontier44.py pins the cross-metric equality);
# only the denominators and combination differ. Same deterministic
# pairing (doc 2k candidate, 2k+1 reference, 200 pairs), same integer
# relational machinery; recall/precision are single divisions of exact
# BIGINTs and F1 one closed form of them.

_ROUGE_MAX_DOC = 400

_ROUGE_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x != '') AS t
  FROM documents WHERE doc_id < {_ROUGE_MAX_DOC}
),
pairs AS (
  SELECT c.doc_id // 2 AS pair_id, c.t AS ct, r.t AS rt
  FROM d c JOIN d r ON r.doc_id = c.doc_id + 1
  WHERE c.doc_id % 2 = 0
),
u1c AS (
  SELECT pair_id, g, COUNT(*)::BIGINT AS n
  FROM (SELECT pair_id, UNNEST(ct) AS g FROM pairs) GROUP BY 1, 2
),
u1r AS (
  SELECT pair_id, g, COUNT(*)::BIGINT AS n
  FROM (SELECT pair_id, UNNEST(rt) AS g FROM pairs) GROUP BY 1, 2
),
u2c AS (
  SELECT pair_id, g, COUNT(*)::BIGINT AS n
  FROM (SELECT pair_id,
               UNNEST(list_transform(list_zip(ct[1:len(ct)-1], ct[2:len(ct)]),
                                     z -> z[1] || ' ' || z[2])) AS g
        FROM pairs WHERE len(ct) >= 2) GROUP BY 1, 2
),
u2r AS (
  SELECT pair_id, g, COUNT(*)::BIGINT AS n
  FROM (SELECT pair_id,
               UNNEST(list_transform(list_zip(rt[1:len(rt)-1], rt[2:len(rt)]),
                                     z -> z[1] || ' ' || z[2])) AS g
        FROM pairs WHERE len(rt) >= 2) GROUP BY 1, 2
),
h1 AS (
  -- COALESCE: an empty hit join must yield 0 hits, not NULL (degenerate
  -- corpora with no shared n-grams); Spark mirrors
  SELECT COALESCE(SUM(LEAST(c.n, r.n)), 0)::BIGINT AS hits
  FROM u1c c JOIN u1r r ON r.pair_id = c.pair_id AND r.g = c.g
),
h2 AS (
  SELECT COALESCE(SUM(LEAST(c.n, r.n)), 0)::BIGINT AS hits
  FROM u2c c JOIN u2r r ON r.pair_id = c.pair_id AND r.g = c.g
),
tot AS (
  SELECT COUNT(*)::BIGINT AS n_pairs,
         SUM(len(ct))::BIGINT AS c1, SUM(len(rt))::BIGINT AS r1,
         SUM(CASE WHEN len(ct) >= 2 THEN len(ct) - 1 ELSE 0 END)::BIGINT AS c2,
         SUM(CASE WHEN len(rt) >= 2 THEN len(rt) - 1 ELSE 0 END)::BIGINT AS r2
  FROM pairs
)
SELECT tot.n_pairs,
       h1.hits AS r1_hits, tot.r1 AS r1_ref_total, tot.c1 AS r1_cand_total,
       h2.hits AS r2_hits, tot.r2 AS r2_ref_total, tot.c2 AS r2_cand_total,
       CASE WHEN tot.r1 > 0
            THEN ROUND(CAST(h1.hits AS DOUBLE) / tot.r1, 6) END
         AS rouge1_recall,
       CASE WHEN tot.r2 > 0
            THEN ROUND(CAST(h2.hits AS DOUBLE) / tot.r2, 6) END
         AS rouge2_recall,
       CASE WHEN tot.r1 + tot.c1 > 0
            THEN ROUND(2.0 * h1.hits / (tot.r1 + tot.c1), 6) END
         AS rouge1_f1,
       CASE WHEN tot.r2 + tot.c2 > 0
            THEN ROUND(2.0 * h2.hits / (tot.r2 + tot.c2), 6) END
         AS rouge2_f1
FROM tot, h1, h2
"""


@register(
    "q_rouge_pairs",
    oracle=_ROUGE_ORACLE,
    doc="corpus ROUGE-1/2 (E235): clipped n-gram hits over REFERENCE "
    "totals (recall) + F1, on the same deterministic candidate/"
    "reference pairs as BLEU (E196) — min(c,r) is symmetric so the hit "
    "integers equal BLEU's exactly (cross-metric pin); F1 = 2h/(r+c) "
    "is one closed form of exact BIGINTs (the micro-average form)",
)
def q_rouge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.functions import text as X
    from dumpty_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _ROUGE_MAX_DOC)
        .select("doc_id", "text")
    ).select("doc_id", X.words("text").alias("t"))
    cand = docs.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") / 2).cast("long").alias("pair_id"),
        F.col("t").alias("ct"),
    )
    ref = docs.filter(F.col("doc_id") % 2 == 1).select(
        ((F.col("doc_id") - 1) / 2).cast("long").alias("pair_id"),
        F.col("t").alias("rt"),
    )
    pairs = cand.join(ref, "pair_id").localCheckpoint()

    def grams(col: str, n: int):
        if n == 1:
            return F.explode(F.col(col))
        return F.explode(
            F.expr(
                f"transform(arrays_zip(slice({col}, 1, size({col}) - 1), "
                f"slice({col}, 2, size({col}) - 1)), "
                f"z -> concat(z['0'], ' ', z['1']))"
            )
        )

    def gram_counts(col: str, n: int) -> DataFrame:
        base = pairs if n == 1 else pairs.filter(F.size(col) >= 2)
        return (
            base.select("pair_id", grams(col, n).alias("g"))
            .groupBy("pair_id", "g")
            .agg(F.count("*").alias("n"))
        )

    def clipped(n: int) -> int:
        c = gram_counts("ct", n)
        r = gram_counts("rt", n).withColumnRenamed("n", "rn")
        # coalesce: an empty hit join is 0 hits, not None (degenerate
        # corpora with no shared n-grams); the oracle COALESCEs too
        return (
            c.join(r, ["pair_id", "g"])
            .agg(F.coalesce(F.sum(F.least("n", "rn")), F.lit(0)))
            .first()[0]
        )

    tot = pairs.agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.size("ct")).alias("c1"),
        F.sum(F.size("rt")).alias("r1"),
        F.sum(
            F.when(F.size("ct") >= 2, F.size("ct") - 1).otherwise(0)
        ).alias("c2"),
        F.sum(
            F.when(F.size("rt") >= 2, F.size("rt") - 1).otherwise(0)
        ).alias("r2"),
    ).first()
    h1, h2 = clipped(1), clipped(2)
    c1, r1, c2, r2 = tot["c1"], tot["r1"], tot["c2"], tot["r2"]

    # zero denominators (every doc shorter than n tokens) emit NULL,
    # mirroring the oracle's CASE guards, instead of raising on the
    # driver while the oracle emits a row
    def ratio(num: float, den: int):
        return round(num / den, 6) if den else None

    return spark.createDataFrame(
        [
            (
                tot["n_pairs"],
                h1, r1, c1,
                h2, r2, c2,
                ratio(float(h1), r1),
                ratio(float(h2), r2),
                ratio(2.0 * h1, r1 + c1),
                ratio(2.0 * h2, r2 + c2),
            )
        ],
        "n_pairs long, r1_hits long, r1_ref_total long, r1_cand_total long, "
        "r2_hits long, r2_ref_total long, r2_cand_total long, "
        "rouge1_recall double, rouge2_recall double, "
        "rouge1_f1 double, rouge2_f1 double",
    )
