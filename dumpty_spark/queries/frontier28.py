"""Round-8 engine extensions, third batch (EXT E195-E198): community
modularity, corpus BLEU, Theil-Sen robust trend, and bigram-LM held-out
perplexity.

Portability disciplines (memory: oracle-portability-traps): every
multi-term float SUM is integerized per term FIRST (micro-units via one
division + one round each — single IEEE ops on identical inputs agree
across engines) and summed as BIGINT; every final ratio is one division
of exact integers; ln/exp appear only in single final expressions whose
4dp rounding absorbs last-ulp libm differences (the q_dp_release
precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

_WORDS_SQL = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')"

# ---------------------------------------------------------------------------
# E195: modularity of the LPA communities
# ---------------------------------------------------------------------------
# LPA (E121) finds communities; modularity (Newman-Girvan) is the
# number that says whether they MEAN anything: Q = sum_c [m_c/m -
# (d_c/2m)^2] over the undirected co-purchase graph. All inputs are
# integers (within-community edge count, per-community degree masses),
# so Q reduces to ONE division of exact BIGINTs:
#   Q = (4m * sum_c m_c  -  sum_c d_c^2) / (4 m^2)
# (magnitudes <= 4m^2 ~ 1.6e13 at sf0.1, ~1.6e17 at x100 — inside
# BIGINT). The oracle replays the identical 4 LPA rounds via the shared
# chained-CTE builder and computes the identical integer moments.

_MOD_TAIL = """,
deg AS (SELECT u AS node, COUNT(*)::BIGINT AS d FROM edges GROUP BY u),
m_cte AS (SELECT COUNT(*)::BIGINT AS m FROM pairs),
within AS (
  SELECT COUNT(*)::BIGINT AS w
  FROM pairs p
  JOIN l4 lu ON lu.id = p.u
  JOIN l4 lv ON lv.id = p.v
  WHERE lu.label = lv.label
),
dc AS (
  SELECT l.label, SUM(deg.d)::BIGINT AS d_c
  FROM l4 l JOIN deg ON deg.node = l.id
  GROUP BY l.label
),
sq AS (SELECT COUNT(*)::BIGINT AS n_comm, SUM(d_c * d_c)::BIGINT AS sdc FROM dc)
SELECT sq.n_comm AS n_communities, m_cte.m AS m_edges,
       within.w AS within_edges, sq.sdc AS sum_deg_sq,
       ROUND(CAST(4 * m_cte.m * within.w - sq.sdc AS DOUBLE)
             / (4.0 * m_cte.m * m_cte.m), 4) AS modularity
FROM sq, m_cte, within
"""


def _mod_oracle() -> str:
    from dumpty_spark.queries.frontier4 import _lpa_oracle

    return _lpa_oracle(tail=_MOD_TAIL)


@register(
    "q_modularity_score",
    oracle=_mod_oracle(),
    doc="Newman-Girvan modularity of the LPA communities (E195): "
    "Q = sum_c [m_c/m - (d_c/2m)^2] over the co-purchase graph, "
    "reduced to ONE division of exact BIGINT moments (within-community "
    "edge count via two label joins on the canonical pairs, degree "
    "masses via one broadcast label join) — the quality number that "
    "makes E121's labels auditable; oracle replays the identical LPA "
    "rounds through the shared chained-CTE builder",
)
def q_modularity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators.graph import label_propagation
    from dumpty_spark.queries.frontier4 import _LPA_ROUNDS
    from dumpty_spark.queries.shared_graph import (
        copurchase_pairs,
        copurchase_symmetric,
    )

    pairs = copurchase_pairs(spark, sf_dir)
    edges = copurchase_symmetric(spark, sf_dir)
    labels = label_propagation(
        edges, src="u", dst="v", n_rounds=_LPA_ROUNDS
    ).localCheckpoint()
    m = pairs.count()
    # labels is NODE-scaled: broadcast it only under the graph family's
    # 5M-node guard (r12, guide §3.1 — the same class the ×10 leg blew
    # up in sampled_betweenness); above the bound the label joins
    # shuffle, which is the correct large-graph plan
    hint = (
        F.broadcast if labels.count() < 5_000_000 else (lambda df: df)
    )
    within = (
        pairs.join(
            hint(labels.select(F.col("id").alias("u"),
                               F.col("label").alias("lu"))), "u"
        )
        .join(
            hint(labels.select(F.col("id").alias("v"),
                               F.col("label").alias("lv"))), "v"
        )
        .filter(F.col("lu") == F.col("lv"))
        .count()
    )
    deg = edges.groupBy(F.col("u").alias("node")).agg(F.count("*").alias("d"))
    dc = (
        deg.join(hint(labels.select(F.col("id").alias("node"), "label")),
                 "node")
        .groupBy("label")
        .agg(F.sum("d").alias("d_c"))
    )
    row = dc.agg(
        F.count("*").alias("n_comm"),
        F.sum(F.col("d_c") * F.col("d_c")).alias("sdc"),
    ).first()
    q = float(4 * m * within - row["sdc"]) / (4.0 * m * m)
    return spark.createDataFrame(
        [(row["n_comm"], m, within, row["sdc"], round(q, 4))],
        "n_communities long, m_edges long, within_edges long, "
        "sum_deg_sq long, modularity double",
    )


# ---------------------------------------------------------------------------
# E196: corpus BLEU-2 between paired documents
# ---------------------------------------------------------------------------
# The generation-eval metric every LLM pipeline reports: modified
# n-gram precision with per-gram CLIPPING (min of candidate/reference
# counts per pair) plus the brevity penalty, corpus-level (Papineni
# 2002). Pairing is deterministic: doc 2k is the candidate, doc 2k+1
# its reference, for 200 pairs. The clipped-hit machinery is pure
# integer relational work (per-pair gram counts joined cand<->ref,
# LEAST, summed BIGITs); BLEU itself is one closed-form expression of
# the six integer totals (ln/exp absorbed by 4dp rounding).

_BLEU_MAX_DOC = 400

_BLEU_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_WORDS_SQL} AS t FROM documents WHERE doc_id < {_BLEU_MAX_DOC}
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
  SELECT SUM(LEAST(c.n, r.n))::BIGINT AS hits
  FROM u1c c JOIN u1r r ON r.pair_id = c.pair_id AND r.g = c.g
),
h2 AS (
  SELECT SUM(LEAST(c.n, r.n))::BIGINT AS hits
  FROM u2c c JOIN u2r r ON r.pair_id = c.pair_id AND r.g = c.g
),
tot AS (
  SELECT COUNT(*)::BIGINT AS n_pairs,
         SUM(len(ct))::BIGINT AS c_len, SUM(len(rt))::BIGINT AS r_len,
         SUM(len(ct))::BIGINT AS t1,
         SUM(CASE WHEN len(ct) >= 2 THEN len(ct) - 1 ELSE 0 END)::BIGINT AS t2
  FROM pairs
)
SELECT tot.n_pairs, tot.c_len, tot.r_len,
       h1.hits AS p1_hits, tot.t1 AS p1_total,
       h2.hits AS p2_hits, tot.t2 AS p2_total,
       ROUND(CASE WHEN tot.c_len < tot.r_len
                  THEN EXP(1.0 - CAST(tot.r_len AS DOUBLE) / tot.c_len)
                  ELSE 1.0 END
             * EXP(0.5 * (LN(CAST(h1.hits AS DOUBLE) / tot.t1)
                          + LN(CAST(h2.hits AS DOUBLE) / tot.t2))),
             4) AS bleu2
FROM tot, h1, h2
"""


@register(
    "q_bleu_pairs",
    oracle=_BLEU_ORACLE,
    doc="corpus BLEU-2 over deterministic candidate/reference doc "
    "pairs (E196, Papineni): per-pair clipped unigram/bigram hits "
    "(gram-count joins + LEAST — pure integer relational work, the "
    "map-side array-slice bigram shape of E34), brevity penalty, BLEU "
    "as one closed-form expression of six BIGINT totals — the "
    "generation-eval readout next to nDCG (E164) and contamination "
    "(E4'')",
)
def q_bleu_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.functions import text as X
    from dumpty_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _BLEU_MAX_DOC)
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
                f"slice({col}, 2, size({col}) - 1)), z -> concat(z['0'], ' ', z['1']))"
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
        return (
            c.join(r, ["pair_id", "g"])
            .agg(F.sum(F.least("n", "rn")))
            .first()[0]
        )

    tot = pairs.agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.size("ct")).alias("c_len"),
        F.sum(F.size("rt")).alias("r_len"),
        F.sum(
            F.when(F.size("ct") >= 2, F.size("ct") - 1).otherwise(0)
        ).alias("t2"),
    ).first()
    h1, h2 = clipped(1), clipped(2)
    import math

    c_len, r_len, t1, t2 = tot["c_len"], tot["r_len"], tot["c_len"], tot["t2"]
    bp = math.exp(1.0 - float(r_len) / c_len) if c_len < r_len else 1.0
    bleu = bp * math.exp(
        0.5 * (math.log(float(h1) / t1) + math.log(float(h2) / t2))
    )
    return spark.createDataFrame(
        [(tot["n_pairs"], c_len, r_len, h1, t1, h2, t2, round(bleu, 4))],
        "n_pairs long, c_len long, r_len long, p1_hits long, p1_total long, "
        "p2_hits long, p2_total long, bleu2 double",
    )


# ---------------------------------------------------------------------------
# E197: Theil-Sen robust trend + Kendall tau over the daily series
# ---------------------------------------------------------------------------
# The outlier-immune answer to "is traffic trending up?": the median of
# all pairwise slopes (Theil-Sen; 29% breakdown point vs OLS's zero)
# with Kendall tau-a as the significance companion. The daily series is
# calendar-densified (missing day = 0), day-count bounded, so the pair
# frame is ~C(n_days, 2) rows — metadata-sized at ANY corpus scale
# (scale lives in the upstream count rollup, one grouped scan). Slopes
# integerize to micro-units per pair (single division each); the median
# is an exact BIGINT picked by row_number — no float sums anywhere.

_TS_ORACLE = """
WITH bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS mn, MAX(CAST(ts AS DATE)) AS mx FROM events
),
days AS (
  SELECT CAST(UNNEST(generate_series(mn::TIMESTAMP, mx::TIMESTAMP,
                                     INTERVAL 1 DAY)) AS DATE) AS d
  FROM bounds
),
counts AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(*)::BIGINT AS n FROM events GROUP BY 1
),
series AS (
  SELECT DATEDIFF('day', b.mn, days.d) AS off, COALESCE(c.n, 0)::BIGINT AS n
  FROM days LEFT JOIN counts c ON c.d = days.d CROSS JOIN bounds b
),
slopes AS (
  SELECT CAST(ROUND(1000000.0 * (b.n - a.n) / (b.off - a.off), 0) AS BIGINT)
           AS sm
  FROM series a JOIN series b ON b.off > a.off
),
ranked AS (
  SELECT sm, ROW_NUMBER() OVER (ORDER BY sm) AS rn, COUNT(*) OVER () AS np
  FROM slopes
)
SELECT (SELECT COUNT(*)::BIGINT FROM series) AS n_days,
       np::BIGINT AS n_pairs,
       (SELECT COUNT(*)::BIGINT FROM slopes WHERE sm > 0) AS n_up,
       (SELECT COUNT(*)::BIGINT FROM slopes WHERE sm < 0) AS n_down,
       (SELECT COUNT(*)::BIGINT FROM slopes WHERE sm = 0) AS n_flat,
       ROUND(CAST((SELECT COUNT(*) FROM slopes WHERE sm > 0)
                  - (SELECT COUNT(*) FROM slopes WHERE sm < 0) AS DOUBLE)
             / np, 4) AS kendall_tau,
       sm AS median_slope_micro,
       ROUND(sm / 1000000.0, 6) AS slope_per_day
FROM ranked WHERE rn = (np + 1) // 2
"""


@register(
    "q_theilsen_trend",
    oracle=_TS_ORACLE,
    doc="Theil-Sen robust trend + Kendall tau-a (E197): median of all "
    "pairwise daily-total slopes over the calendar-densified event "
    "series (29% breakdown vs OLS's zero) — the pair frame is "
    "C(n_days,2), metadata-sized at any corpus scale; slopes "
    "integerized to micro-units per pair, median picked exactly by "
    "row_number, tau one division of pair counts",
)
def q_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("d")
    )
    # calendar grid from one broadcast stats row (__mn <= __mx by
    # construction: MIN/MAX of the same non-empty column)
    bounds = ev.agg(F.min("d").alias("__mn"), F.max("d").alias("__mx"))
    days = bounds.select(F.explode(F.sequence("__mn", "__mx")).alias("d"), "__mn")
    counts = ev.groupBy("d").agg(F.count("*").alias("n"))
    series = (
        days.join(counts, "d", "left")
        .select(
            F.datediff("d", "__mn").alias("off"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
        .localCheckpoint()  # day-count-sized
    )
    a = series.select(F.col("off").alias("oa"), F.col("n").alias("na"))
    b = series.select(F.col("off").alias("ob"), F.col("n").alias("nb"))
    slopes = (
        a.join(b, F.col("ob") > F.col("oa"))
        .select(
            F.round(
                1000000.0 * (F.col("nb") - F.col("na"))
                / (F.col("ob") - F.col("oa")),
                0,
            )
            .cast("long")
            .alias("sm")
        )
        .localCheckpoint()
    )
    n_days = series.count()
    stats = slopes.agg(
        F.count("*").alias("np"),
        F.sum(F.when(F.col("sm") > 0, 1).otherwise(0)).alias("up"),
        F.sum(F.when(F.col("sm") < 0, 1).otherwise(0)).alias("down"),
        F.sum(F.when(F.col("sm") == 0, 1).otherwise(0)).alias("flat"),
    ).first()
    np_, up, down, flat = stats["np"], stats["up"], stats["down"], stats["flat"]
    med = (
        slopes.orderBy("sm")
        .limit((np_ + 1) // 2)
        .agg(F.max("sm"))
        .first()[0]
    )
    return spark.createDataFrame(
        [
            (
                n_days, np_, up, down, flat,
                round(float(up - down) / np_, 4),
                med,
                round(med / 1000000.0, 6),
            )
        ],
        "n_days long, n_pairs long, n_up long, n_down long, n_flat long, "
        "kendall_tau double, median_slope_micro long, slope_per_day double",
    )


# ---------------------------------------------------------------------------
# E198: bigram-LM held-out perplexity (add-one smoothing)
# ---------------------------------------------------------------------------
# The eval half the E34/E140 language models were missing: fit add-one
# bigram probabilities on the even-doc_id half, score the odd half,
# report per-language perplexity. Unseen heads/grams fall through the
# LEFT joins to the add-one floor 1/(c1 + V). Per-bigram log-probs are
# integerized to micro-nats (one ln + one round each — last-ulp libm
# noise cannot move a value 1e-9 of a midpoint away, q_dp_release
# precedent) and summed as BIGINTs; perplexity is one closed-form
# expression of (sum, count).

_PPL_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, {_WORDS_SQL} AS t FROM documents
),
train_bg AS (
  SELECT z[1] AS w1, z[2] AS w2, COUNT(*)::BIGINT AS c12
  FROM (
    SELECT UNNEST(list_zip(t[1:len(t)-1], t[2:len(t)])) AS z
    FROM toks WHERE doc_id % 2 = 0 AND len(t) >= 2
  ) GROUP BY 1, 2
),
train_c1 AS (SELECT w1, SUM(c12)::BIGINT AS c1 FROM train_bg GROUP BY w1),
vocab AS (
  SELECT COUNT(DISTINCT g)::BIGINT + 1 AS v
  FROM (SELECT UNNEST(t) AS g FROM toks WHERE doc_id % 2 = 0)
),
held AS (
  SELECT lang, z[1] AS w1, z[2] AS w2
  FROM (
    SELECT lang, UNNEST(list_zip(t[1:len(t)-1], t[2:len(t)])) AS z
    FROM toks WHERE doc_id % 2 = 1 AND len(t) >= 2
  )
),
scored AS (
  SELECT h.lang,
         CAST(ROUND(1000000.0 * LN(
           CAST(COALESCE(bg.c12, 0) + 1 AS DOUBLE)
           / (COALESCE(c1.c1, 0) + vocab.v)), 0) AS BIGINT) AS lp_micro
  FROM held h
  LEFT JOIN train_bg bg ON bg.w1 = h.w1 AND bg.w2 = h.w2
  LEFT JOIN train_c1 c1 ON c1.w1 = h.w1
  CROSS JOIN vocab
)
SELECT lang, COUNT(*)::BIGINT AS n_bigrams,
       SUM(lp_micro)::BIGINT AS sum_lp_micro,
       ROUND(CAST(SUM(lp_micro) AS DOUBLE) / (1000000.0 * COUNT(*)), 4)
         AS avg_logprob,
       ROUND(EXP(-(CAST(SUM(lp_micro) AS DOUBLE) / (1000000.0 * COUNT(*)))), 4)
         AS perplexity
FROM scored
GROUP BY lang
ORDER BY lang
"""


@register(
    "q_bigram_perplexity",
    oracle=_PPL_ORACLE,
    doc="bigram-LM held-out perplexity (E198): add-one model fit on "
    "even doc_ids, odd half scored per language — unseen grams fall "
    "through LEFT joins to the 1/(c1+V) floor; per-bigram log-probs "
    "integerized to micro-nats and summed as BIGINTs (no multi-term "
    "float sum), perplexity one closed-form of (sum, count); the "
    "quality-eval companion to E34/E140 and the surprisal filter E4''",
)
def q_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.functions import text as X
    from dumpty_spark.operators.util import ensure_parallelism

    toks = ensure_parallelism(
        load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    ).select("doc_id", "lang", X.words("text").alias("t"))

    def bigrams(df: DataFrame, extra: list[str]) -> DataFrame:
        return (
            df.filter(F.size("t") >= 2)
            .select(
                *extra,
                F.explode(
                    F.arrays_zip(
                        F.slice(F.col("t"), 1, F.size("t") - 1),
                        F.slice(F.col("t"), 2, F.size("t") - 1),
                    )
                ).alias("z"),
            )
            .select(*extra, F.col("z")["0"].alias("w1"), F.col("z")["1"].alias("w2"))
        )

    train = toks.filter(F.col("doc_id") % 2 == 0)
    train_bg = (
        bigrams(train, [])
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
    )
    train_c1 = train_bg.groupBy("w1").agg(F.sum("c12").alias("c1"))
    v = (
        train.select(F.explode("t").alias("g")).distinct().count() + 1
    )
    held = bigrams(toks.filter(F.col("doc_id") % 2 == 1), ["lang"])
    scored = (
        held.join(train_bg, ["w1", "w2"], "left")
        .join(train_c1, "w1", "left")
        .select(
            "lang",
            F.round(
                1000000.0
                * F.log(
                    (F.coalesce("c12", F.lit(0)) + 1).cast("double")
                    / (F.coalesce("c1", F.lit(0)) + F.lit(v))
                ),
                0,
            )
            .cast("long")
            .alias("lp_micro"),
        )
    )
    avg_ln = F.sum("lp_micro").cast("double") / (1000000.0 * F.count("*"))
    return (
        scored.groupBy("lang")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("lp_micro").alias("sum_lp_micro"),
            F.round(avg_ln, 4).alias("avg_logprob"),
            F.round(F.exp(-avg_ln), 4).alias("perplexity"),
        )
        .orderBy("lang")
    )
