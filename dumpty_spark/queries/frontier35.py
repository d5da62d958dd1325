"""Round-8 engine extensions, tenth batch (EXT E214-E216): tokenizer
fertility report, distributed decision-stump split finding, and exact
Shapley-value channel attribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dumpty_spark.functions.text import token_count_bpe_ish, word_count
from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E214: tokenizer fertility / compression report
# ---------------------------------------------------------------------------
# The per-language readout behind mixture and vocab decisions: fertility
# (tokens per word) and bytes per token say how EXPENSIVE a language is
# to a fixed tokenizer — high-fertility languages consume budget faster
# and under-train per byte (the multilingual-vocab sizing argument).
# One corpus scan, exact BIGINT sums, each statistic a single division.

_FERTILITY_ORACLE = """
WITH d AS (
  SELECT lang,
         len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x != ''))::BIGINT AS n_words,
         (len(regexp_extract_all(lower(text), '[a-z]+'))
          + len(regexp_extract_all(text, '[0-9]'))
          + len(regexp_extract_all(text, '[^a-zA-Z0-9 \\t\\n]')))::BIGINT
           AS n_tokens,
         len(text)::BIGINT AS n_chars
  FROM documents
)
SELECT lang,
       COUNT(*)::BIGINT AS n_docs,
       SUM(n_words)::BIGINT AS words,
       SUM(n_tokens)::BIGINT AS tokens,
       SUM(n_chars)::BIGINT AS chars,
       ROUND(SUM(n_tokens) / CAST(NULLIF(SUM(n_words), 0) AS DOUBLE), 6)
         AS fertility,
       ROUND(SUM(n_chars) / CAST(NULLIF(SUM(n_tokens), 0) AS DOUBLE), 6)
         AS chars_per_token
FROM d GROUP BY lang ORDER BY lang
"""


@register(
    "q_tokenizer_fertility",
    oracle=_FERTILITY_ORACLE,
    doc="tokenizer fertility report (E214): per language, tokens-per-"
    "word and chars-per-token under the BPE-ish token estimate — the "
    "cost readout behind multilingual mixture/vocab sizing; one scan, "
    "exact BIGINT sums, single divisions",
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        word_count("text").cast("long").alias("n_words"),
        token_count_bpe_ish("text").cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("words"),
            F.sum("n_tokens").alias("tokens"),
            F.sum("n_chars").alias("chars"),
        )
        .select(
            "lang", "n_docs", "words", "tokens", "chars",
            F.round(
                F.col("tokens")
                / F.nullif("words", F.lit(0)).cast("double"),
                6,
            ).alias("fertility"),
            F.round(
                F.col("chars")
                / F.nullif("tokens", F.lit(0)).cast("double"),
                6,
            ).alias("chars_per_token"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# E215: distributed decision-stump split finder
# ---------------------------------------------------------------------------
# The inner loop of every distributed GBDT/random-forest trainer
# (XGBoost/LightGBM histogram method): bin the feature ONCE into B
# equi-width bins with a single partial-agg scan, then evaluate ALL
# B-1 candidate thresholds from the bin histogram's prefix sums — the
# full-data pass is O(rows), the split search is O(B) metadata work,
# never a per-threshold rescan. Label = purchase vs not, feature =
# event value; gain = parent entropy − size-weighted child entropies,
# every count exact BIGINT, every entropy a fixed closed form of two
# ratios (6dp) evaluated identically by both engines.

_STUMP_BINS = 64
_STUMP_TOPK = 5

# binary entropy of a (pos, tot) pair in closed form; 0·log0 → 0
_H = (
    "(CASE WHEN {p} = 0 OR {p} = {t} THEN 0.0 ELSE "
    "-(({p} / CAST({t} AS DOUBLE)) * LOG2({p} / CAST({t} AS DOUBLE)) "
    "+ (({t} - {p}) / CAST({t} AS DOUBLE)) "
    "* LOG2(({t} - {p}) / CAST({t} AS DOUBLE))) END)"
)


def _stump_oracle() -> str:
    hp = _H.format(p="pp", t="tt")
    hl = _H.format(p="lp", t="lt")
    hr = _H.format(p="(pp - lp)", t="(tt - lt)")
    return f"""
WITH stats AS (
  SELECT MIN(value) AS mn, MAX(value) AS mx FROM events
),
binned AS (
  SELECT LEAST({_STUMP_BINS - 1},
               CAST(FLOOR((value - s.mn) / ((s.mx - s.mn) / {_STUMP_BINS}))
                    AS INT)) AS bin,
         (event_type = 'purchase')::INT AS y
  FROM events, stats s
),
hist AS (
  SELECT bin, COUNT(*)::BIGINT AS n, SUM(y)::BIGINT AS p
  FROM binned GROUP BY bin
),
grid AS (
  SELECT g.b AS bin, COALESCE(h.n, 0) AS n, COALESCE(h.p, 0) AS p
  FROM (SELECT UNNEST(generate_series(0, {_STUMP_BINS - 1})) AS b) g
  LEFT JOIN hist h ON h.bin = g.b
),
cum AS (
  SELECT bin,
         SUM(n) OVER (ORDER BY bin) AS lt,
         SUM(p) OVER (ORDER BY bin) AS lp,
         SUM(n) OVER () AS tt,
         SUM(p) OVER () AS pp
  FROM grid
),
gains AS (
  SELECT bin + 1 AS split_bin, lt, lp, tt, pp,
         ROUND({hp}
               - (lt / CAST(tt AS DOUBLE)) * {hl}
               - ((tt - lt) / CAST(tt AS DOUBLE)) * {hr}, 6) AS gain
  FROM cum WHERE bin < {_STUMP_BINS - 1} AND lt > 0 AND lt < tt
)
SELECT split_bin::INT AS split_bin,
       ROUND((SELECT mn FROM stats)
             + split_bin * (((SELECT mx FROM stats)
                             - (SELECT mn FROM stats)) / {_STUMP_BINS}),
             4) AS threshold,
       lt::BIGINT AS n_left, (tt - lt)::BIGINT AS n_right,
       lp::BIGINT AS pos_left, gain
FROM gains
ORDER BY gain DESC, split_bin
LIMIT {_STUMP_TOPK}
"""


@register(
    "q_split_finder",
    oracle=_stump_oracle(),
    doc="distributed decision-stump split finder (E215, the GBDT "
    "histogram method): one partial-agg binning scan, all 63 candidate "
    "thresholds evaluated from bin prefix sums (O(B) metadata work, "
    "never a per-threshold rescan), information gain in closed form "
    "over exact BIGINT counts; top-5 splits",
)
def q_split_finder(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    stats = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    binned = ev.crossJoin(F.broadcast(stats)).select(
        F.least(
            F.lit(_STUMP_BINS - 1),
            F.floor(
                (F.col("value") - F.col("mn"))
                / ((F.col("mx") - F.col("mn")) / _STUMP_BINS)
            ).cast("int"),
        ).alias("bin"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    hist = binned.groupBy("bin").agg(
        F.count("*").alias("n"), F.sum("y").alias("p")
    )
    grid = (
        spark.range(_STUMP_BINS)
        .select(F.col("id").cast("int").alias("bin"))
        .join(hist, "bin", "left")
        .select(
            "bin",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("p", F.lit(0)).alias("p"),
        )
    )
    wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = grid.select(
        "bin",
        F.sum("n").over(wc).alias("lt"),
        F.sum("p").over(wc).alias("lp"),
        F.sum("n").over(wall).alias("tt"),
        F.sum("p").over(wall).alias("pp"),
    )
    hp = _H.format(p="pp", t="tt")
    hl = _H.format(p="lp", t="lt")
    hr = _H.format(p="(pp - lp)", t="(tt - lt)")
    gains = cum.filter(
        (F.col("bin") < _STUMP_BINS - 1)
        & (F.col("lt") > 0)
        & (F.col("lt") < F.col("tt"))
    ).select(
        (F.col("bin") + 1).cast("int").alias("split_bin"),
        "lt", "lp", "tt", "pp",
        F.round(
            F.expr(hp)
            - (F.col("lt") / F.col("tt").cast("double")) * F.expr(hl)
            - ((F.col("tt") - F.col("lt")) / F.col("tt").cast("double"))
            * F.expr(hr),
            6,
        ).alias("gain"),
    )
    thr = stats.first()
    mn, mx = thr["mn"], thr["mx"]
    width = (mx - mn) / _STUMP_BINS
    return (
        gains.select(
            "split_bin",
            F.round(F.lit(mn) + F.col("split_bin") * F.lit(width), 4).alias(
                "threshold"
            ),
            F.col("lt").cast("long").alias("n_left"),
            (F.col("tt") - F.col("lt")).cast("long").alias("n_right"),
            F.col("lp").cast("long").alias("pos_left"),
            "gain",
        )
        .orderBy(F.desc("gain"), "split_bin")
        .limit(_STUMP_TOPK)
    )


# ---------------------------------------------------------------------------
# E216: exact Shapley-value channel attribution
# ---------------------------------------------------------------------------
# Completes the attribution family (E142 position, E150 Markov removal
# effect, E161 time-decay, last-touch) with the canonical
# cooperative-game answer (Shapley 1953; Zhao et al. 2018 for the
# marketing formulation). Coalition = the set of channels a user
# touched BEFORE first purchase; value v(S) = observed purchase
# intensity (purchases per user) of exactly-S users, in exact
# micro-units; unobserved coalitions contribute v = 0. With C = 4
# channels the lattice is 16 rows of metadata after ONE user-level
# partial-agg scan, and the Shapley sum  φ_c = Σ_{S ⊆ C∖{c}}
# |S|!(|C|−|S|−1)!/|C|! · (v(S∪{c}) − v(S))  is computed ALL-INTEGER:
# 24·φ in micro-units (4! = 24), one division at the end. The whole
# surface is exact; no sampling, no permutation Monte-Carlo.

_SHAP_BITS = {"click": 1, "error": 2, "signup": 4, "view": 8}
# Shapley weight numerator |S|!(|C|-|S|-1)! for |C| = 4: the per-term
# coefficient is this over 4! = 24, so summing fact*(v(S∪{c})-v(S))
# yields 24·φ exactly.  |S|=0 → 0!·3! = 6, |S|=1 → 1!·2! = 2,
# |S|=2 → 2!·1! = 2, |S|=3 → 3!·0! = 6.
_FACT = {0: 6, 1: 2, 2: 2, 3: 6}


def _shap_oracle() -> str:
    bit_case = (
        "CASE e.event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2 "
        "WHEN 'signup' THEN 4 WHEN 'view' THEN 8 ELSE 0 END"
    )
    fact_case = (
        "CASE bit_count(s.m) "
        + " ".join(f"WHEN {k} THEN {v}" for k, v in sorted(_FACT.items()))
        + " END"
    )
    chan_rows = " UNION ALL ".join(
        f"SELECT '{name}' AS channel, {bit} AS cbit"
        for name, bit in sorted(_SHAP_BITS.items())
    )
    return f"""
WITH fp AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS fpts,
         SUM((event_type = 'purchase')::INT)::BIGINT AS n_purch
  FROM events GROUP BY user_id
),
ch AS (
  SELECT e.user_id, BIT_OR({bit_case}) AS mask
  FROM events e JOIN fp ON fp.user_id = e.user_id
  WHERE e.event_type != 'purchase'
    AND (fp.fpts IS NULL OR e.ts < fp.fpts)
  GROUP BY e.user_id
),
u AS (
  SELECT fp.user_id, COALESCE(ch.mask, 0) AS mask, fp.n_purch
  FROM fp LEFT JOIN ch ON ch.user_id = fp.user_id
),
obs AS (
  SELECT mask, COUNT(*)::BIGINT AS n_users, SUM(n_purch)::BIGINT AS purch
  FROM u GROUP BY mask
),
lattice AS (
  SELECT g.m, COALESCE(CAST(ROUND(1000000.0 * o.purch / o.n_users, 0)
                            AS BIGINT), 0) AS v_micro
  FROM (SELECT UNNEST(generate_series(0, 15)) AS m) g
  LEFT JOIN obs o ON o.mask = g.m
),
chans AS ({chan_rows}),
terms AS (
  SELECT c.channel,
         ({fact_case}) * (w.v_micro - s.v_micro) AS term
  FROM chans c
  JOIN lattice s ON (s.m & c.cbit) = 0
  JOIN lattice w ON w.m = (s.m | c.cbit)
),
phi AS (
  SELECT channel, SUM(term)::BIGINT AS phi24_micro FROM terms
  GROUP BY channel
),
tot AS (SELECT SUM(phi24_micro)::BIGINT AS t FROM phi)
SELECT p.channel,
       ROUND(p.phi24_micro / 24000000.0, 6) AS shapley,
       ROUND(p.phi24_micro / CAST(NULLIF(tot.t, 0) AS DOUBLE), 6) AS share
FROM phi p, tot
ORDER BY p.channel
"""


@register(
    "q_shapley_attribution",
    oracle=_shap_oracle(),
    doc="exact Shapley-value channel attribution (E216): coalition = "
    "channels touched before first purchase, v(S) = purchase intensity "
    "of exactly-S users in micro-units; one user-level partial-agg scan "
    "collapses the corpus to a 16-row lattice, the Shapley sum runs "
    "all-integer (24·phi in micro-units) — exact, no permutation "
    "sampling; completes last-touch/position/time-decay/Markov",
)
def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bit = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "signup", 4)
        .when(F.col("event_type") == "view", 8)
        .otherwise(0)
    )
    fp = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("fpts"),
        F.sum((F.col("event_type") == "purchase").cast("int")).alias(
            "n_purch"
        ),
    )
    ch = (
        ev.join(fp, "user_id")
        .filter(
            (F.col("event_type") != "purchase")
            & (F.col("fpts").isNull() | (F.col("ts") < F.col("fpts")))
        )
        .withColumn("cbit", bit)
        .groupBy("user_id")
        .agg(F.expr("bit_or(cbit)").alias("mask"))
    )
    u = fp.join(ch, "user_id", "left").select(
        F.coalesce("mask", F.lit(0)).alias("mask"), "n_purch"
    )
    obs = u.groupBy("mask").agg(
        F.count("*").alias("n_users"), F.sum("n_purch").alias("purch")
    )
    lattice = (
        spark.range(16)
        .select(F.col("id").cast("int").alias("m"))
        .join(obs, F.col("m") == F.col("mask"), "left")
        .select(
            "m",
            F.coalesce(
                F.round(
                    1000000.0 * F.col("purch") / F.col("n_users"), 0
                ).cast("long"),
                F.lit(0),
            ).alias("v_micro"),
        )
    )
    chans = spark.createDataFrame(
        sorted(_SHAP_BITS.items()), "channel string, cbit int"
    )
    s = lattice.select(F.col("m").alias("sm"), F.col("v_micro").alias("sv"))
    w = lattice.select(F.col("m").alias("wm"), F.col("v_micro").alias("wv"))
    fact = (
        F.when(F.expr("bit_count(sm)") == 0, F.lit(_FACT[0]))
        .when(F.expr("bit_count(sm)") == 1, F.lit(_FACT[1]))
        .when(F.expr("bit_count(sm)") == 2, F.lit(_FACT[2]))
        .otherwise(F.lit(_FACT[3]))
    )
    terms = (
        chans.join(s, F.expr("(sm & cbit) = 0"))
        .join(w, F.expr("wm = (sm | cbit)"))
        .select("channel", (fact * (F.col("wv") - F.col("sv"))).alias("term"))
    )
    phi = terms.groupBy("channel").agg(F.sum("term").alias("phi24_micro"))
    tot = phi.agg(F.sum("phi24_micro").alias("t"))
    return (
        phi.crossJoin(F.broadcast(tot))
        .select(
            "channel",
            F.round(F.col("phi24_micro") / 24000000.0, 6).alias("shapley"),
            F.round(
                F.col("phi24_micro")
                / F.nullif("t", F.lit(0)).cast("double"),
                6,
            ).alias("share"),
        )
        .orderBy("channel")
    )
