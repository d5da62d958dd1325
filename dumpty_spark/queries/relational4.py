"""Relational widening, batch 5: SCD2 point-in-time dimension join,
equi-width histograms, bigram language-model stats, Benford first-digit
audit, and distribution-drift detection.

All EXT surface (the reference delegates analytics to its SQL backends —
SURVEY §2.3/§2.10); each query is a Spark built-in composition with a
full DuckDB oracle.

Scale notes (100 TB):
- q_scd2_point_in_time builds validity intervals with one partitioned
  window pass (shuffle on the entity key), then joins facts to intervals
  on the same key — both sides co-partition on user_id, and AQE handles
  the interval band predicate; no global sort anywhere.
- q_histogram_totalprice is one stats aggregate (1 row, broadcast) plus
  one partial-agg bucketing pass — the two-pass equi-width histogram
  whose shuffle carries one row per bucket.
- q_bigram_lm zips consecutive tokens MAP-SIDE with array slicing (no
  self-join on position), then partial-aggregates; the conditional-
  probability window runs on the vocabulary-sized count frame, not the
  corpus.
- q_benford_digits / q_distribution_drift are single-scan stacked
  aggregates ending in digit-/type-sized frames; the KL/TVD arithmetic
  happens on rows-per-group, never on events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.sources import load_table

# ---------------------------------------------------------------------------
# E32: SCD Type-2 build + point-in-time dimension join
# ---------------------------------------------------------------------------
# The warehouse classic: a change log becomes validity intervals
# [valid_from, valid_to) via LEAD over the entity key, and facts join to
# the interval active at fact time. 'purchase' events act as dimension
# updates (value = the attribute), 'click' events are the facts.

_SCD2_ORACLE = """
WITH upd AS (
  SELECT user_id, ts AS valid_from, MIN(value) AS attr
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, ts
),
scd AS (
  SELECT user_id, attr, valid_from,
         LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
           AS valid_to
  FROM upd
),
fact AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
pit AS (
  SELECT f.event_id, s.attr
  FROM fact f LEFT JOIN scd s
    ON f.user_id = s.user_id
   AND f.ts >= s.valid_from
   AND (s.valid_to IS NULL OR f.ts < s.valid_to)
)
SELECT attr IS NOT NULL AS matched,
       COUNT(*)::BIGINT AS n_facts,
       ROUND(COALESCE(AVG(attr), 0), 4) AS avg_active_attr
FROM pit
GROUP BY 1
ORDER BY matched
"""


@register(
    "q_scd2_point_in_time",
    oracle=_SCD2_ORACLE,
    doc="SCD Type-2 dimension build (change log -> [valid_from, valid_to) "
    "intervals via LEAD) + point-in-time fact join on the interval active "
    "at fact time; one window pass + one co-partitioned band join "
    "(EXT E32)",
)
def q_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # tie-safe: collapse same-(user, ts) updates deterministically BEFORE
    # the window, else which duplicate gets the empty interval is
    # engine-dependent
    upd = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("valid_from"))
        .agg(F.min("value").alias("attr"))
    )
    w = Window.partitionBy("user_id").orderBy("valid_from")
    scd = upd.withColumn("valid_to", F.lead("valid_from").over(w))
    fact = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    pit = fact.join(
        scd,
        (fact.user_id == scd.user_id)
        & (fact.ts >= scd.valid_from)
        & (scd.valid_to.isNull() | (fact.ts < scd.valid_to)),
        "left",
    )
    return (
        pit.groupBy(F.col("attr").isNotNull().alias("matched"))
        .agg(
            F.count("*").alias("n_facts"),
            F.round(F.coalesce(F.avg("attr"), F.lit(0.0)), 4).alias(
                "avg_active_attr"
            ),
        )
        .orderBy("matched")
    )


# ---------------------------------------------------------------------------
# E33: equi-width histogram
# ---------------------------------------------------------------------------

_NB = 20

_HIST_ORACLE = f"""
WITH stats AS (
  SELECT MIN(o_totalprice)::DOUBLE AS mn, MAX(o_totalprice)::DOUBLE AS mx
  FROM orders
),
b AS (
  SELECT LEAST(FLOOR((o_totalprice::DOUBLE - s.mn) / ((s.mx - s.mn) / {_NB})),
               {_NB - 1})::BIGINT AS bucket,
         s.mn, s.mx
  FROM orders, stats s
)
SELECT bucket,
       ROUND(MIN(mn) + bucket * ((MIN(mx) - MIN(mn)) / {_NB}), 2) AS lo,
       ROUND(MIN(mn) + (bucket + 1) * ((MIN(mx) - MIN(mn)) / {_NB}), 2) AS hi,
       COUNT(*)::BIGINT AS n
FROM b
GROUP BY bucket
ORDER BY bucket
"""


@register(
    "q_histogram_totalprice",
    oracle=_HIST_ORACLE,
    doc=f"equi-width {_NB}-bucket histogram of order totals: one 1-row "
    "stats aggregate broadcast into a single bucketing partial-agg pass — "
    "the distribution profile behind the column profiler (EXT E33)",
)
def q_histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").cast("double").alias("p")
    )
    stats = orders.agg(F.min("p").alias("mn"), F.max("p").alias("mx"))
    width = (F.col("mx") - F.col("mn")) / _NB
    bucketed = orders.crossJoin(F.broadcast(stats)).select(
        F.least(F.floor((F.col("p") - F.col("mn")) / width), F.lit(_NB - 1))
        .cast("bigint")
        .alias("bucket"),
        "mn",
        "mx",
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.round(
                F.min("mn") + F.col("bucket") * ((F.min("mx") - F.min("mn")) / _NB),
                2,
            ).alias("lo"),
            F.round(
                F.min("mn")
                + (F.col("bucket") + 1) * ((F.min("mx") - F.min("mn")) / _NB),
                2,
            ).alias("hi"),
            F.count("*").alias("n"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# E34: bigram language-model counts
# ---------------------------------------------------------------------------
# Same tokenizer contract as text2.py (identical regex both engines).

_WORDS_SQL = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')"

_BIGRAM_ORACLE = f"""
WITH toks AS (SELECT {_WORDS_SQL} AS t FROM documents),
bg AS (
  SELECT unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS z
  FROM toks WHERE len(t) >= 2
),
c AS (
  SELECT z[1] AS w1, z[2] AS w2, COUNT(*)::BIGINT AS n
  FROM bg GROUP BY 1, 2
)
SELECT w1, w2, n,
       ROUND(n::DOUBLE / SUM(n) OVER (PARTITION BY w1), 6) AS cond_p
FROM c
ORDER BY n DESC, w1, w2
LIMIT 20
"""


@register(
    "q_bigram_lm",
    oracle=_BIGRAM_ORACLE,
    doc="bigram LM statistics: consecutive-token pairs zipped MAP-SIDE "
    "with array slices (no positional self-join), partial-agg counts, "
    "conditional probability P(w2|w1) via a vocabulary-sized window "
    "(EXT E34)",
)
def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.functions import text as X

    from dumpty_spark.operators.util import ensure_parallelism

    docs = load_table(spark, sf_dir, "documents")
    # tokenization is CPU-heavy per input byte while the doc table's file
    # splits can be few — floor the parallelism before the regex work
    # (the AQE byte-based-coalescing class; see tests/test_aqe_guards.py)
    toks = ensure_parallelism(docs.select("text")).select(
        X.words("text").alias("t")
    ).filter(F.size("t") >= 2)
    pairs = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("t"), 1, F.size("t") - 1),
                F.slice(F.col("t"), 2, F.size("t") - 1),
            )
        ).alias("z")
    ).select(F.col("z")["0"].alias("w1"), F.col("z")["1"].alias("w2"))
    counts = pairs.groupBy("w1", "w2").agg(F.count("*").alias("n"))
    w1tot = Window.partitionBy("w1")
    return (
        counts.select(
            "w1",
            "w2",
            "n",
            F.round(F.col("n") / F.sum("n").over(w1tot), 6).alias("cond_p"),
        )
        .orderBy(F.desc("n"), "w1", "w2")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# E35: Benford first-digit audit
# ---------------------------------------------------------------------------
# First-significant-digit extraction goes through integer/string space
# (floor -> bigint -> first char), never log10 of the value itself, so
# both engines bucket identically even at exact powers of ten.

_BENFORD_ORACLE = """
WITH d AS (
  SELECT SUBSTRING(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
           AS digit
  FROM orders WHERE o_totalprice >= 1
),
c AS (SELECT digit, COUNT(*)::BIGINT AS n FROM d GROUP BY digit)
SELECT digit, n,
       ROUND(n::DOUBLE / SUM(n) OVER (), 4) AS observed,
       ROUND(LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 4) AS expected
FROM c
ORDER BY digit
"""


@register(
    "q_benford_digits",
    oracle=_BENFORD_ORACLE,
    doc="Benford's-law first-digit audit of order totals: single-scan "
    "digit bucketing (via integer/string space, engine-stable), "
    "digit-sized result frame with observed vs expected shares — the "
    "fraud/corruption smoke test over any monetary column (EXT E35)",
)
def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = orders.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        ).alias("digit")
    )
    c = d.groupBy("digit").agg(F.count("*").alias("n"))
    total = c.agg(F.sum("n").alias("tot"))
    return (
        c.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.round(F.col("n") / F.col("tot"), 4).alias("observed"),
            F.round(
                F.log10(1.0 + 1.0 / F.col("digit").cast("double")), 4
            ).alias("expected"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# E36: distribution drift (KL divergence + total variation)
# ---------------------------------------------------------------------------
# The training-pipeline drift detector: compare the event-type
# distribution in the first half of the time range against the second.

_DRIFT_ORACLE = """
WITH bounds AS (
  SELECT epoch_us(MIN(ts)) AS lo, epoch_us(MAX(ts)) AS hi FROM events
),
halves AS (
  SELECT event_type,
         CASE WHEN epoch_us(ts) * 2 < b.lo + b.hi THEN 0 ELSE 1 END AS half
  FROM events, bounds b
),
c AS (
  SELECT event_type,
         SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
         SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b
  FROM halves GROUP BY event_type
)
SELECT event_type, n_a, n_b,
       ROUND(n_a::DOUBLE / SUM(n_a) OVER (), 6) AS p_a,
       ROUND(n_b::DOUBLE / SUM(n_b) OVER (), 6) AS p_b,
       CASE WHEN n_a > 0 AND n_b > 0 THEN
         ROUND((n_a::DOUBLE / SUM(n_a) OVER ())
               * LN((n_a::DOUBLE / SUM(n_a) OVER ())
                    / (n_b::DOUBLE / SUM(n_b) OVER ())), 6)
       END AS kl_term,
       ROUND(ABS(n_a::DOUBLE / SUM(n_a) OVER ()
                 - n_b::DOUBLE / SUM(n_b) OVER ()) / 2, 6) AS tv_term
FROM c
ORDER BY event_type
"""


@register(
    "q_distribution_drift",
    oracle=_DRIFT_ORACLE,
    doc="distribution drift between time halves: per-type counts in one "
    "stacked-aggregate scan, KL-divergence and total-variation terms on "
    "the types-sized frame — the data-drift gate a training pipeline "
    "runs before mixing a new crawl (EXT E36)",
)
def q_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ normalized by load_table; the session is pinned
    # UTC there, so the epoch conversion matches DuckDB's naive epoch_us.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    bounds = ev.agg(F.min(us).alias("lo"), F.max(us).alias("hi"))
    halves = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.when(us * 2 < F.col("lo") + F.col("hi"), F.lit(0))
        .otherwise(F.lit(1))
        .alias("half"),
    )
    c = halves.groupBy("event_type").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
    )
    totals = c.agg(F.sum("n_a").alias("tot_a"), F.sum("n_b").alias("tot_b"))
    p_a = F.col("n_a") / F.col("tot_a")
    p_b = F.col("n_b") / F.col("tot_b")
    return (
        c.crossJoin(F.broadcast(totals))
        .select(
            "event_type",
            "n_a",
            "n_b",
            F.round(p_a, 6).alias("p_a"),
            F.round(p_b, 6).alias("p_b"),
            # zero guard, mirrored exactly in the oracle: a type present in
            # only one half yields NULL (Spark's non-ANSI x/0 would give
            # NULL here but DuckDB would give inf — guard both identically).
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0),
                F.round(p_a * F.log(p_a / p_b), 6),
            ).alias("kl_term"),
            F.round(F.abs(p_a - p_b) / 2, 6).alias("tv_term"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# E39: time-weighted average over irregular samples
# ---------------------------------------------------------------------------
# Sensor/metric semantics: each observation holds until the next one, so
# the mean must weight each value by its holding interval — the plain
# AVG over-weights bursts. One window pass (lead per type), then a
# types-sized aggregate.

_TWA_ORACLE = """
WITH seg AS (
  SELECT event_type, value,
         epoch_us(ts) AS t0,
         LEAD(epoch_us(ts)) OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS t1
  FROM events
)
SELECT event_type,
       COUNT(*)::BIGINT AS n_samples,
       ROUND(AVG(value), 6) AS plain_avg,
       ROUND(SUM(value * (t1 - t0)) / SUM(t1 - t0), 6) AS time_weighted_avg
FROM seg
WHERE t1 IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q_time_weighted_avg",
    oracle=_TWA_ORACLE,
    doc="time-weighted average over irregularly-sampled event values: "
    "each value weighted by its holding interval (lead - ts) — one "
    "partitioned window pass + types-sized aggregate; the correct mean "
    "for burst-prone metrics where plain AVG over-weights dense spans "
    "(EXT E39)",
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seg = ev.select(
        "event_type",
        "value",
        us.alias("t0"),
        F.lead(us).over(w).alias("t1"),
    ).filter(F.col("t1").isNotNull())
    dt = F.col("t1") - F.col("t0")
    return (
        seg.groupBy("event_type")
        .agg(
            F.count("*").alias("n_samples"),
            F.round(F.avg("value"), 6).alias("plain_avg"),
            F.round(F.sum(F.col("value") * dt) / F.sum(dt), 6).alias(
                "time_weighted_avg"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# E40: revenue concentration — Gini coefficient + Pareto share
# ---------------------------------------------------------------------------
# Inequality analytics over customer revenue: exact Gini via the
# rank-sum identity G = (2*Σ(i*x_i) / (n*Σx) - (n+1)/n) on revenue
# sorted ascending, plus the top-10% customer revenue share.

_GINI_ORACLE = """
WITH rev AS (
  SELECT o_custkey, SUM(o_totalprice) AS r
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT r,
         ROW_NUMBER() OVER (ORDER BY r, o_custkey) AS i,
         COUNT(*) OVER () AS n,
         SUM(r) OVER () AS total
  FROM rev
)
SELECT MAX(n)::BIGINT AS n_customers,
       ROUND(MAX(total), 2) AS total_revenue,
       ROUND(2.0 * SUM(i * r) / (MAX(n) * MAX(total))
             - (MAX(n) + 1.0) / MAX(n), 6) AS gini,
       ROUND(SUM(CASE WHEN i > n - CAST(FLOOR(n * 0.1) AS BIGINT)
                      THEN r ELSE 0 END) / MAX(total), 6) AS top10pct_share
FROM ranked
"""


@register(
    "q_gini_revenue",
    oracle=_GINI_ORACLE,
    doc="revenue concentration: exact Gini coefficient via the rank-sum "
    "identity + top-10% customer share — per-customer partial-agg "
    "rollup, then rank over the customers-sized frame (at 100x swap the "
    "global rank for operators/rownum.global_row_number, same identity) "
    "(EXT E40)",
)
def q_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators.rownum import global_row_number

    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("r"))
    # scale-clean global rank: range-partitioned numbering (E9), not a
    # single-task ROW_NUMBER window; totals ride in on a 1-row broadcast
    totals = rev.agg(
        F.count("*").alias("n"), F.sum("r").alias("total")
    )
    ranked = (
        global_row_number(rev, ["r", "o_custkey"], out_col="i")
        .crossJoin(F.broadcast(totals))
        .select("r", "i", "n", "total")
    )
    # per-row n (a constant window value) keeps the cutoff comparison out
    # of nested-aggregate territory
    top_cut = F.col("n") - F.floor(F.col("n") * 0.1).cast("bigint")
    return ranked.agg(
        F.max("n").alias("n_customers"),
        F.round(F.max("total"), 2).alias("total_revenue"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("r")) / (F.max("n") * F.max("total"))
            - (F.max("n") + 1.0) / F.max("n"),
            6,
        ).alias("gini"),
        F.round(
            F.sum(F.when(F.col("i") > top_cut, F.col("r")).otherwise(0.0))
            / F.max("total"),
            6,
        ).alias("top10pct_share"),
    )
