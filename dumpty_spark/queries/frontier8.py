"""Round-6 engine extensions, third batch (EXT E137-E142): personalized
PageRank, Adamic-Adar link prediction, Holt linear-trend smoothing,
interpolated Kneser-Ney bigram LM, calibration/reliability report, and
position-based multi-touch attribution.

Design rules shared by the batch (same as every E-series query): pure-
Column / partial-agg plans, windows only over per-key or metadata-sized
frames, broadcast for anything node-/series-/vocabulary-sized, and an
exact DuckDB oracle recomputing the identical math from the raw tables.
Float portability notes per query where a recursion or libm call is
involved (the engine-parity disciplines established in E112/E126: 6dp
pre-rounding before recursions, binary-exact constants, identical
operation ORDER on both engines for sequential folds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E137: personalized PageRank (random walk with restart) from hub seeds
# ---------------------------------------------------------------------------
# q_pagerank_parts ranks GLOBAL centrality; recommendation surfaces need
# the seed-biased view: restart mass (1-d) returns to the seed set every
# round, so rank concentrates in the seeds' neighborhoods — the classic
# related-items walk. Seeds = the 5 highest-degree parts (ties smallest
# id), a deterministic driver-known literal set. damping = 0.75 so BOTH
# engine-side constants (0.75 and 1-0.75 = 0.25) are binary-exact — no
# decimal-vs-double literal drift in the unrolled oracle. The co-purchase
# graph is symmetric (no dangling nodes), so each unrolled oracle round
# is exactly rank' = 0.25*reset + 0.75*contrib.


def _ppr_oracle(n_iter: int = 6, damping: float = 0.75, n_seeds: int = 5) -> str:
    head = f"""
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
deg AS (SELECT src AS id, COUNT(*)::DOUBLE AS deg FROM edges GROUP BY 1),
seeds AS (
  SELECT id FROM deg ORDER BY deg DESC, id LIMIT {n_seeds}
),
r0 AS (
  SELECT d.id, d.deg,
         CASE WHEN s.id IS NULL THEN 0.0::DOUBLE
              ELSE 1.0::DOUBLE / {n_seeds} END AS rank,
         CASE WHEN s.id IS NULL THEN 0.0::DOUBLE
              ELSE 1.0::DOUBLE / {n_seeds} END AS reset
  FROM deg d LEFT JOIN seeds s ON s.id = d.id
)"""
    steps = []
    for k in range(1, n_iter + 1):
        steps.append(
            f""",
r{k} AS (
  SELECT p0.id, p0.deg, p0.reset,
         {1.0 - damping} * p0.reset + {damping} * COALESCE(c.c, 0) AS rank
  FROM r0 p0 LEFT JOIN (
    SELECT e.dst AS id, SUM(p.rank / p.deg) AS c
    FROM edges e JOIN r{k - 1} p ON p.id = e.src
    GROUP BY e.dst
  ) c ON c.id = p0.id
)"""
        )
    tail = f"""
SELECT id AS part, ROUND(rank, 8) AS ppr,
       (reset > 0) AS is_seed
FROM r{n_iter}
ORDER BY ROUND(rank, 8) DESC, part
LIMIT 30"""
    return head + "".join(steps) + tail


@register(
    "q_personalized_pagerank",
    oracle=_ppr_oracle(),
    doc="personalized PageRank / random walk with restart (E137): restart "
    "mass returns to the 5 highest-degree seed parts each round, ranking "
    "the seeds' co-purchase neighborhoods — 6 fixed iterations, two-regime "
    "like pagerank (numpy driver-side below the 5M-edge gate, one "
    "rank-vector shuffle per round above it), unrolled 6-step CTE oracle",
)
def q_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators.graph import personalized_pagerank
    from dumpty_spark.queries.shared_graph import copurchase_symmetric

    edges = copurchase_symmetric(spark, sf_dir).select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    )
    deg = edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    seeds = deg.orderBy(F.desc("d"), F.asc("id")).limit(5).select("id")
    ppr = personalized_pagerank(edges, seeds, damping=0.75, n_iter=6)
    seed_ids = [r[0] for r in seeds.collect()]
    return (
        ppr.select(
            F.col("id").alias("part"),
            F.round("rank", 8).alias("ppr"),
            F.col("id").isin(seed_ids).alias("is_seed"),
        )
        .orderBy(F.desc("ppr"), "part")
        .limit(30)
    )


# ---------------------------------------------------------------------------
# E138: Adamic-Adar link prediction over the co-purchase graph
# ---------------------------------------------------------------------------
# Predict MISSING links: for every non-adjacent pair (u,v) sharing at
# least one neighbor w, score = sum over common neighbors of 1/ln(deg w)
# (Adamic & Adar 2003) — rare shared neighbors count more. Wedge
# enumeration fans out quadratically in the CENTER degree, so centers
# are hub-capped at deg <= 64 (the df-cap discipline of the shingle
# joins: a 10k-degree hub contributes ~0.1 per pair and 5*10^7 wedges —
# standard practice drops it). The cap bounds per-center fanout at
# 64^2/2 and makes the whole wedge join linear in edges; the oracle
# applies the identical cap. Scores are sums of <=cap 1/ln(deg) terms;
# ROUND(.,6) output with tie-break on (u,v) absorbs ulp-order noise.

_AA_MAXDEG = 64

_AA_ORACLE = f"""
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS (SELECT u AS w, v AS nb FROM pairs UNION ALL SELECT v, u FROM pairs),
deg AS (SELECT w AS node, COUNT(*)::BIGINT AS d FROM edges GROUP BY 1),
centers AS (SELECT node, d FROM deg WHERE d >= 2 AND d <= {_AA_MAXDEG}),
adj AS (
  SELECT e.w, e.nb, c.d FROM edges e JOIN centers c ON c.node = e.w
),
wedges AS (
  SELECT a.nb AS u, b.nb AS v, a.d
  FROM adj a JOIN adj b ON a.w = b.w AND a.nb < b.nb
),
sc AS (
  SELECT u, v, SUM(1.0 / LN(d)) AS s, COUNT(*)::BIGINT AS n_common
  FROM wedges GROUP BY u, v
),
ne AS (
  SELECT sc.u, sc.v, sc.s, sc.n_common
  FROM sc LEFT JOIN pairs p ON p.u = sc.u AND p.v = sc.v
  WHERE p.u IS NULL
)
SELECT u, v, ROUND(s, 6) AS aa_score, n_common
FROM ne
ORDER BY ROUND(s, 6) DESC, u, v
LIMIT 20
"""


@register(
    "q_adamic_adar",
    oracle=_AA_ORACLE,
    doc="Adamic-Adar link prediction (E138): top-20 NON-adjacent part "
    "pairs by sum of 1/ln(deg) over common neighbors — hub-capped wedge "
    "centers (deg <= 64, the df-cap discipline) bound the fanout at "
    "cap^2 per center so the wedge self-join stays linear in edges; "
    "existing edges removed with an anti-join",
)
def q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.queries.shared_graph import (
        copurchase_pairs,
        copurchase_symmetric,
    )

    pairs = copurchase_pairs(spark, sf_dir)
    sym = copurchase_symmetric(spark, sf_dir).select(
        F.col("u").alias("w"), F.col("v").alias("nb")
    )
    deg = sym.groupBy(F.col("w").alias("node")).agg(F.count("*").alias("d"))
    centers = deg.filter((F.col("d") >= 2) & (F.col("d") <= _AA_MAXDEG))
    # centers is node-sized (and hub-capped); broadcast it onto the edges
    adj = sym.join(
        F.broadcast(centers.withColumnRenamed("node", "w")), "w"
    ).localCheckpoint()  # reused by both sides of the wedge self-join
    a = adj.select("w", F.col("nb").alias("u"), "d")
    b = adj.select("w", F.col("nb").alias("v"))
    wedges = a.join(b, "w").filter(F.col("u") < F.col("v"))
    sc = wedges.groupBy("u", "v").agg(
        F.sum(F.lit(1.0) / F.log("d")).alias("s"),
        F.count("*").alias("n_common"),
    )
    ne = sc.join(pairs, ["u", "v"], "left_anti")
    return (
        ne.select("u", "v", F.round("s", 6).alias("aa_score"), "n_common")
        .orderBy(F.desc("aa_score"), "u", "v")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# E139: Holt linear-trend (double exponential) smoothing per series
# ---------------------------------------------------------------------------
# q_ewma_smoothing tracks LEVEL only; trending series need Holt's second
# equation: l_t = a*y_t + (1-a)*(l + b); b_t = g*(l_t - l) + (1-g)*b,
# initialized l=y1, b=y2-y1, with one-step-ahead forecast errors
# accumulated for RMSE. The recursion is inherently sequential PER
# SERIES but series are independent: Spark folds each series' calendar-
# sized (<=120 day) array with F.aggregate — one groupBy shuffle, zero
# Python, unlimited series parallelism. The oracle runs the identical
# recursion as a recursive CTE. Float parity: daily means pre-rounded
# to 6dp (sum-order-free inputs), smoothing constants written as
# EXPLICIT double literals on both engines (0.3/0.7, 0.1/0.9 — never
# 1-0.3, whose double differs from 0.7), and the fold performs the
# operations in the identical order, so the doubles match bit-for-bit
# before the final 4dp rounding.

_HOLT_ORACLE = """
WITH RECURSIVE daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         ROUND(AVG(value), 6) AS y
  FROM events GROUP BY 1, 2
),
ser AS (
  SELECT event_type, y,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t
  FROM daily
),
nn AS (SELECT event_type, MAX(t) AS n FROM ser GROUP BY 1),
hw AS (
  SELECT s1.event_type, 1::BIGINT AS t,
         s1.y::DOUBLE AS l, (s2.y - s1.y)::DOUBLE AS b, 0.0::DOUBLE AS sse
  FROM ser s1 JOIN ser s2
    ON s2.event_type = s1.event_type AND s2.t = 2
  WHERE s1.t = 1
  UNION ALL
  SELECT h.event_type, h.t + 1,
         0.3::DOUBLE * s.y + 0.7::DOUBLE * (h.l + h.b),
         0.1::DOUBLE * ((0.3::DOUBLE * s.y + 0.7::DOUBLE * (h.l + h.b)) - h.l)
           + 0.9::DOUBLE * h.b,
         h.sse + (s.y - (h.l + h.b)) * (s.y - (h.l + h.b))
  FROM hw h JOIN ser s ON s.event_type = h.event_type AND s.t = h.t + 1
)
SELECT h.event_type, n.n AS n_days,
       ROUND(h.l, 4) AS level,
       ROUND(h.b, 4) AS trend,
       ROUND(h.l + 7 * h.b, 4) AS forecast_7d,
       ROUND(SQRT(h.sse / (n.n - 1)), 4) AS rmse
FROM hw h JOIN nn n ON n.event_type = h.event_type AND h.t = n.n
ORDER BY h.event_type
"""


@register(
    "q_holt_trend",
    oracle=_HOLT_ORACLE,
    doc="Holt linear-trend smoothing (E139): per event type, double "
    "exponential smoothing (alpha .3, beta .1) over the 6dp-pre-rounded "
    "daily mean series — final level/trend, 7-day-ahead forecast and "
    "one-step RMSE; per-series calendar-sized F.aggregate fold (zero "
    "Python, one shuffle), recursive-CTE oracle running the identical "
    "operation sequence",
)
def q_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.round(F.avg("value"), 6).alias("y"))
    ser = daily.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "y"))), lambda s: s["y"]
        ).alias("ys")
    )
    # fold y[2..n] (1-indexed) with acc (l=y1, b=y2-y1, sse=0): the first
    # step's forecast l+b = y2 exactly, so it contributes 0 error and
    # reproduces the oracle recursion's t=2 row — identical op order
    fold = F.aggregate(
        F.slice(F.col("ys"), 2, F.size("ys") - 1),
        F.struct(
            F.element_at("ys", 1).cast("double").alias("l"),
            (F.element_at("ys", 2) - F.element_at("ys", 1))
            .cast("double")
            .alias("b"),
            F.lit(0.0).alias("sse"),
        ),
        lambda acc, y: F.struct(
            (F.lit(0.3) * y + F.lit(0.7) * (acc["l"] + acc["b"])).alias("l"),
            (
                F.lit(0.1)
                * (
                    (F.lit(0.3) * y + F.lit(0.7) * (acc["l"] + acc["b"]))
                    - acc["l"]
                )
                + F.lit(0.9) * acc["b"]
            ).alias("b"),
            (
                acc["sse"]
                + (y - (acc["l"] + acc["b"])) * (y - (acc["l"] + acc["b"]))
            ).alias("sse"),
        ),
    )
    return (
        ser.filter(F.size("ys") >= 2)
        .select("event_type", F.size("ys").alias("n_days"), fold.alias("h"))
        .select(
            "event_type",
            F.col("n_days").cast("long").alias("n_days"),
            F.round(F.col("h")["l"], 4).alias("level"),
            F.round(F.col("h")["b"], 4).alias("trend"),
            F.round(F.col("h")["l"] + 7 * F.col("h")["b"], 4).alias(
                "forecast_7d"
            ),
            F.round(
                F.sqrt(F.col("h")["sse"] / (F.col("n_days") - 1)), 4
            ).alias("rmse"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# E140: interpolated Kneser-Ney bigram language model
# ---------------------------------------------------------------------------
# The production upgrade of q_bigram_lm's raw conditional counts: KN
# smoothing (Kneser & Ney 1995, interpolated form, fixed discount
# D=0.75 — binary-exact) scores every bigram as
#   P(w2|w1) = (c(w1,w2)-D)/c(w1) + D*N1+(w1,.)/c(w1) * N1+(.,w2)/B
# where the continuation counts N1+ are DISTINCT-context counts and B
# the number of distinct bigram types — the "how many contexts" novelty
# correction that plain MLE lacks. The model is fit on the whole corpus
# in one vocabulary-sized rollup chain; evaluation reports per-language
# token-weighted mean log2 P and perplexity 2^(-mean). All model
# quantities are exact integers; the only floats are the final per-type
# log2/divisions, aggregated then rounded at 4dp (the ulp budget of the
# unigram-surprisal precedent).

_KN_WORDS_SQL = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')"
)

_KN_ORACLE = f"""
WITH toks AS (SELECT lang, {_KN_WORDS_SQL} AS t FROM documents),
bg AS (
  SELECT lang, unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS z
  FROM toks WHERE len(t) >= 2
),
cl AS (
  SELECT lang, z[1] AS w1, z[2] AS w2, COUNT(*)::BIGINT AS n_lw
  FROM bg GROUP BY 1, 2, 3
),
cg AS (SELECT w1, w2, SUM(n_lw)::BIGINT AS n FROM cl GROUP BY 1, 2),
c1 AS (
  SELECT w1, SUM(n)::BIGINT AS c_w1, COUNT(*)::BIGINT AS n1p_fwd
  FROM cg GROUP BY 1
),
cont AS (SELECT w2, COUNT(*)::BIGINT AS n1p_bwd FROM cg GROUP BY 1),
bt AS (SELECT COUNT(*)::DOUBLE AS b FROM cg),
prob AS (
  SELECT cg.w1, cg.w2,
         LOG2(
           (cg.n - 0.75::DOUBLE) / c1.c_w1
           + 0.75::DOUBLE * c1.n1p_fwd / c1.c_w1 * (cont.n1p_bwd / bt.b)
         ) AS lp
  FROM cg JOIN c1 USING (w1) JOIN cont USING (w2), bt
)
SELECT cl.lang,
       SUM(cl.n_lw)::BIGINT AS n_bigrams,
       COUNT(*)::BIGINT AS n_types,
       ROUND(SUM(cl.n_lw * p.lp) / SUM(cl.n_lw), 4) AS avg_log2p,
       ROUND(POWER(2.0::DOUBLE, -(SUM(cl.n_lw * p.lp) / SUM(cl.n_lw))), 4)
         AS perplexity
FROM cl JOIN prob p ON p.w1 = cl.w1 AND p.w2 = cl.w2
GROUP BY cl.lang
ORDER BY cl.lang
"""


@register(
    "q_kneser_ney",
    oracle=_KN_ORACLE,
    doc="interpolated Kneser-Ney bigram LM (E140): fixed discount 0.75, "
    "distinct-context continuation probabilities, per-language token-"
    "weighted mean log2 P and perplexity — the model is three exact "
    "vocabulary-sized rollups off one bigram-count frame (broadcast-"
    "joined back), the classic perplexity-filter scorer with real "
    "smoothing",
)
def q_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.functions import text as X
    from dumpty_spark.operators.util import ensure_parallelism

    docs = load_table(spark, sf_dir, "documents")
    toks = ensure_parallelism(docs.select("lang", "text")).select(
        "lang", X.words("text").alias("t")
    ).filter(F.size("t") >= 2)
    bg = toks.select(
        "lang",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("t"), 1, F.size("t") - 1),
                F.slice(F.col("t"), 2, F.size("t") - 1),
            )
        ).alias("z"),
    ).select("lang", F.col("z")["0"].alias("w1"), F.col("z")["1"].alias("w2"))
    cl = bg.groupBy("lang", "w1", "w2").agg(F.count("*").alias("n_lw"))
    cg = cl.groupBy("w1", "w2").agg(F.sum("n_lw").alias("n")).localCheckpoint()
    c1 = cg.groupBy("w1").agg(
        F.sum("n").alias("c_w1"), F.count("*").alias("n1p_fwd")
    )
    cont = cg.groupBy("w2").agg(F.count("*").alias("n1p_bwd"))
    bt = cg.agg(F.count("*").cast("double").alias("b"))
    prob = (
        cg.join(c1, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(bt))
        .select(
            "w1",
            "w2",
            F.log2(
                (F.col("n") - F.lit(0.75)) / F.col("c_w1")
                + F.lit(0.75)
                * F.col("n1p_fwd")
                / F.col("c_w1")
                * (F.col("n1p_bwd") / F.col("b"))
            ).alias("lp"),
        )
    )
    return (
        cl.join(prob, ["w1", "w2"])
        .groupBy("lang")
        .agg(
            F.sum("n_lw").alias("n_bigrams"),
            F.count("*").alias("n_types"),
            (F.sum(F.col("n_lw") * F.col("lp")) / F.sum("n_lw")).alias("m"),
        )
        .select(
            "lang",
            "n_bigrams",
            "n_types",
            F.round("m", 4).alias("avg_log2p"),
            F.round(F.pow(F.lit(2.0), -F.col("m")), 4).alias("perplexity"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# E141: calibration / reliability report (ECE + Brier)
# ---------------------------------------------------------------------------
# Every learned quality filter needs a calibration audit before its
# scores gate data: bucket predictions into deciles, compare mean
# predicted probability to the empirical positive rate per bin, and
# report the expected calibration error and Brier score. The "model"
# here is deterministic so both engines reproduce it exactly: p =
# logistic(z) of the 6dp-pre-rounded n_chars z-score (population
# mu/sigma themselves 6dp-pre-rounded — sum-order-free), label =
# (lang = 'en'). The report shape — decile bins, per-bin gap, ECE,
# Brier — is the operator; swap p for any real model's score column.

_CALIB_ORACLE = """
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
per_bin AS (
  SELECT bin, COUNT(*)::BIGINT AS n, AVG(p) AS mean_p,
         SUM(y)::DOUBLE / COUNT(*) AS frac_pos
  FROM binned GROUP BY bin
),
gl AS (
  SELECT SUM(n * ABS(mean_p - frac_pos)) / SUM(n) AS ece FROM per_bin
),
br AS (SELECT AVG((p - y) * (p - y)) AS brier FROM binned)
SELECT b.bin, b.n, ROUND(b.mean_p, 4) AS mean_p,
       ROUND(b.frac_pos, 4) AS frac_pos,
       ROUND(ABS(b.mean_p - b.frac_pos), 4) AS abs_gap,
       ROUND(gl.ece, 4) AS ece, ROUND(br.brier, 4) AS brier
FROM per_bin b, gl, br
ORDER BY b.bin
"""


@register(
    "q_calibration_bins",
    oracle=_CALIB_ORACLE,
    doc="calibration / reliability report (E141): decile-binned mean "
    "predicted probability vs empirical positive rate, per-bin gap plus "
    "global ECE and Brier score — the audit every learned quality filter "
    "needs before its scores gate data; deterministic logistic scorer "
    "over 6dp-pre-rounded z-scores so both engines bin identically",
)
def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
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
                + F.exp(-F.round((F.col("n_chars") - F.col("mu")) / F.col("sd"), 6))
            )
        ).alias("p"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    binned = scored.select(
        F.least(F.floor(F.col("p") * 10), F.lit(9)).cast("long").alias("bin"),
        "p",
        "y",
    )
    per_bin = binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.avg("p").alias("mean_p"),
        (F.sum("y").cast("double") / F.count("*")).alias("frac_pos"),
    )
    gl = per_bin.agg(
        (
            F.sum(F.col("n") * F.abs(F.col("mean_p") - F.col("frac_pos")))
            / F.sum("n")
        ).alias("ece")
    )
    br = binned.agg(
        F.avg((F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))).alias(
            "brier"
        )
    )
    return (
        per_bin.crossJoin(F.broadcast(gl))
        .crossJoin(F.broadcast(br))
        .select(
            "bin",
            "n",
            F.round("mean_p", 4).alias("mean_p"),
            F.round("frac_pos", 4).alias("frac_pos"),
            F.round(F.abs(F.col("mean_p") - F.col("frac_pos")), 4).alias(
                "abs_gap"
            ),
            F.round("ece", 4).alias("ece"),
            F.round("brier", 4).alias("brier"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# E142: position-based (U-shaped) multi-touch attribution
# ---------------------------------------------------------------------------
# q_last_touch_attribution gives the final click 100% of the credit;
# the position-based model splits it 40% first touch / 40% last touch /
# 20% across the middle — the standard U-shaped curve. Touches are a
# user's non-purchase events since their previous purchase; the
# conversion is the purchase they precede. Every window is partitioned
# by user (user-sized state, shuffle on user_id only); conversion
# segments come from a reverse cumulative purchase count, so one window
# pass segments the whole stream with no self-join. Credits are exact
# rationals of binary doubles (1, .5, .4, .2/(k-2)) summed then rounded
# at 4dp.

_ATTR_ORACLE = """
WITH ev AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
  FROM events
),
seg AS (
  SELECT *,
         SUM(is_p) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
         ) AS g
  FROM ev
),
touches AS (
  SELECT user_id, event_type, g,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, g ORDER BY ts, event_id
         ) AS pos,
         COUNT(*) OVER (PARTITION BY user_id, g) AS k
  FROM seg WHERE is_p = 0 AND g >= 1
),
credited AS (
  SELECT event_type,
         CASE
           WHEN k = 1 THEN 1.0::DOUBLE
           WHEN k = 2 THEN 0.5::DOUBLE
           WHEN pos = 1 OR pos = k THEN 0.4::DOUBLE
           ELSE 0.2::DOUBLE / (k - 2)
         END AS credit
  FROM touches
)
SELECT event_type,
       ROUND(SUM(credit), 4) AS total_credit,
       COUNT(*)::BIGINT AS n_touches
FROM credited
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q_position_attribution",
    oracle=_ATTR_ORACLE,
    doc="position-based multi-touch attribution (E142): 40/20/40 U-shaped "
    "credit over each user's touches between purchases (1-touch gets "
    "all, 2-touch splits evenly) — one reverse-cumulative window "
    "segments the stream per user, one partitioned ranking window "
    "assigns positions; all state user-sized, no self-join",
)
def q_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_p"),
    )
    w_rev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    seg = ev.withColumn("g", F.sum("is_p").over(w_rev))
    w_pos = Window.partitionBy("user_id", "g").orderBy("ts", "event_id")
    w_k = Window.partitionBy("user_id", "g")
    touches = (
        seg.filter((F.col("is_p") == 0) & (F.col("g") >= 1))
        .withColumn("pos", F.row_number().over(w_pos))
        .withColumn("k", F.count("*").over(w_k))
    )
    credit = (
        F.when(F.col("k") == 1, F.lit(1.0))
        .when(F.col("k") == 2, F.lit(0.5))
        .when((F.col("pos") == 1) | (F.col("pos") == F.col("k")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("k") - 2))
    )
    return (
        touches.select("event_type", credit.alias("credit"))
        .groupBy("event_type")
        .agg(
            F.round(F.sum("credit"), 4).alias("total_credit"),
            F.count("*").alias("n_touches"),
        )
        .orderBy("event_type")
    )
