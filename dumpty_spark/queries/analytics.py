"""Round-4 product-analytics batch (E101-E103) + readability (E104):
RFM quintile segmentation, signup-cohort cumulative LTV, last-touch
attribution within a tolerance window, and a Flesch-style readability
profile. All exact-oracle; every window carries a deterministic
tie-break so both engines produce identical buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.queries.relational8 import _DAY_SQL, _day
from dumpty_spark.sources.parquet import load_table


# ---------------------------------------------------------------------------
# E101: RFM quintile segmentation — the classic customer-value grid
# ---------------------------------------------------------------------------
# Recency / Frequency / Monetary quintiles per purchasing user, scored
# 1-5 by ntile over a TOTAL order (metric + user_id tie-break — without
# it the two engines would deal ties into different buckets), rolled up
# per 3-digit segment. Users frame is corpus-aggregated once
# (partial-agg scan); the ntile windows run on the users-sized frame.
# At 100 TB "users" is still ~1e8 rows — if the single-partition ntile
# window ever binds, the E9 rownum + arithmetic bucket assignment is
# the drop-in replacement; at any realistic user count the frame is a
# reduced aggregate, not the corpus.

_RFM_ORACLE = f"""
WITH anchor AS (SELECT MAX({_DAY_SQL.format(col='ts')}) AS today
                FROM events WHERE event_type = 'purchase'),
u AS (
  SELECT user_id,
         MAX({_DAY_SQL.format(col='ts')}) AS last_d,
         COUNT(*)::DOUBLE AS freq,
         SUM(value) AS money
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
scored AS (
  SELECT user_id, money,
         NTILE(5) OVER (ORDER BY (a.today - last_d) DESC, user_id) AS r,
         NTILE(5) OVER (ORDER BY freq, user_id) AS f,
         NTILE(5) OVER (ORDER BY money, user_id) AS m
  FROM u CROSS JOIN anchor a
)
SELECT r * 100 + f * 10 + m AS rfm,
       COUNT(*)::BIGINT AS n_users,
       ROUND(SUM(money), 2) AS segment_revenue
FROM scored
GROUP BY rfm
ORDER BY rfm
"""


@register(
    "q_rfm_segments",
    oracle=_RFM_ORACLE,
    doc="RFM quintile segmentation (E101): recency/frequency/monetary "
    "ntile(5) scores per purchasing user with user_id tie-breaks (ties "
    "would otherwise deal into different buckets per engine), rolled "
    "up per 3-digit segment — the classic customer-value grid; one "
    "partial-agg scan to the users frame, windows on the aggregate",
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    anchor = ev.agg(F.max(_day(F.col("ts"))).alias("today"))
    u = ev.groupBy("user_id").agg(
        F.max(_day(F.col("ts"))).alias("last_d"),
        F.count(F.lit(1)).cast("double").alias("freq"),
        F.sum("value").alias("money"),
    )
    scored = u.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        "money",
        F.ntile(5)
        .over(W.orderBy(F.desc(F.col("today") - F.col("last_d")), "user_id"))
        .alias("r"),
        F.ntile(5).over(W.orderBy("freq", "user_id")).alias("f"),
        F.ntile(5).over(W.orderBy("money", "user_id")).alias("m"),
    )
    return (
        scored.groupBy(
            (F.col("r") * 100 + F.col("f") * 10 + F.col("m")).alias("rfm")
        )
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.sum("money"), 2).alias("segment_revenue"),
        )
        .orderBy("rfm")
    )


# ---------------------------------------------------------------------------
# E102: cohort cumulative LTV — revenue curves by signup week
# ---------------------------------------------------------------------------
# E19's retention grid counts who CAME BACK; the LTV matrix sums what
# each first-seen-week cohort has SPENT by week N — the
# unit-economics curve. First-seen week per user (one partial-agg
# pass), purchase revenue bucketed by whole weeks since first touch,
# running sum per cohort over the weeks-sized frame.

_LTV_ORACLE = f"""
WITH first_seen AS (
  SELECT user_id, MIN({_DAY_SQL.format(col='ts')}) AS d0 FROM events
  GROUP BY user_id
),
rev AS (
  SELECT f.d0 // 7 AS cohort_week,
         ({_DAY_SQL.format(col='e.ts')} - f.d0) // 7 AS week_offset,
         SUM(e.value) AS revenue,
         COUNT(DISTINCT e.user_id)::BIGINT AS n_buyers
  FROM events e JOIN first_seen f USING (user_id)
  WHERE e.event_type = 'purchase'
  GROUP BY 1, 2
)
SELECT r.cohort_week, r.week_offset, s.cohort_users, r.n_buyers,
       ROUND(r.revenue, 2) AS revenue,
       ROUND(SUM(r.revenue) OVER (
         PARTITION BY r.cohort_week ORDER BY r.week_offset), 2) AS cum_ltv
FROM rev r
JOIN (SELECT d0 // 7 AS cohort_week, COUNT(*)::BIGINT AS cohort_users
      FROM first_seen GROUP BY 1) s USING (cohort_week)
ORDER BY r.cohort_week, r.week_offset
"""


@register(
    "q_cohort_ltv",
    oracle=_LTV_ORACLE,
    doc="cohort cumulative LTV (E102): purchase revenue per (first-seen "
    "week cohort, weeks-since-first-touch) with a running per-cohort "
    "sum — the unit-economics curve next to E19's retention grid; "
    "first-touch frame is one partial-agg pass, the running sum runs "
    "on the cohort×week aggregate",
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(_day(F.col("ts"))).alias("d0")
    )
    joined = ev.filter(F.col("event_type") == "purchase").join(
        first_seen, "user_id"
    )
    rev = joined.groupBy(
        F.floor(F.col("d0") / 7).cast("long").alias("cohort_week"),
        F.floor((_day(F.col("ts")) - F.col("d0")) / 7)
        .cast("long")
        .alias("week_offset"),
    ).agg(
        F.sum("value").alias("revenue"),
        F.countDistinct("user_id").alias("n_buyers"),
    )
    sizes = first_seen.groupBy(
        F.floor(F.col("d0") / 7).cast("long").alias("cohort_week")
    ).agg(F.count(F.lit(1)).alias("cohort_users"))
    wcum = W.partitionBy("cohort_week").orderBy("week_offset")
    return (
        rev.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "cohort_users",
            "n_buyers",
            F.round("revenue", 2).alias("revenue"),
            F.round(F.sum("revenue").over(wcum), 2).alias("cum_ltv"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# E103: last-touch attribution — which event gets credit for a purchase?
# ---------------------------------------------------------------------------
# For every purchase, the LAST non-purchase event by the same user
# within the preceding hour takes the credit (last-touch with a
# tolerance window — the standard first model every attribution stack
# ships). One per-user window pass: last(struct) IGNORE NULLS over the
# preceding rows, then the tolerance filter; purchases with no touch
# in the hour report as 'direct'. No joins, no row amplification.

_ATTRIBUTION_ORACLE = """
WITH tagged AS (
  SELECT user_id, ts, event_type, value,
         LAST_VALUE(CASE WHEN event_type != 'purchase'
                         THEN struct_pack(t := epoch_us(ts), e := event_type)
                    END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
  FROM events
),
purch AS (
  SELECT CASE WHEN touch IS NOT NULL
               AND epoch_us(ts) - touch.t <= 3600000000
              THEN touch.e ELSE 'direct' END AS attributed,
         value
  FROM tagged WHERE event_type = 'purchase'
)
SELECT attributed,
       COUNT(*)::BIGINT AS n_purchases,
       ROUND(SUM(value), 2) AS attributed_revenue,
       ROUND(COUNT(*)::DOUBLE / (SELECT COUNT(*) FROM purch), 4) AS share
FROM purch
GROUP BY attributed
ORDER BY attributed
"""


@register(
    "q_last_touch_attribution",
    oracle=_ATTRIBUTION_ORACLE,
    doc="last-touch attribution (E103): each purchase credits the last "
    "non-purchase event by the same user within the preceding hour "
    "(last(struct) IGNORE NULLS over ROWS UNBOUNDED..1 PRECEDING + "
    "tolerance filter; no touch ⇒ 'direct') — one per-user window "
    "pass, zero joins, zero row amplification; the temporal-join "
    "family's attribution face (E6 as-of with tolerance)",
)
def q_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    wl = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(
            F.col("event_type") != "purchase",
            F.struct(us.alias("t"), F.col("event_type").alias("e")),
        ),
        ignorenulls=True,
    ).over(wl)
    tagged = ev.select(
        "event_type", "value", us.alias("pus"), touch.alias("touch")
    )
    purch = tagged.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.col("touch").isNotNull()
            & (F.col("pus") - F.col("touch.t") <= 3_600_000_000),
            F.col("touch.e"),
        )
        .otherwise("direct")
        .alias("attributed"),
        "value",
    )
    tot = purch.agg(F.count(F.lit(1)).cast("double").alias("tot"))
    return (
        purch.groupBy("attributed")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("attributed_revenue"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "attributed",
            "n_purchases",
            "attributed_revenue",
            F.round(F.col("n_purchases") / F.col("tot"), 4).alias("share"),
        )
        .orderBy("attributed")
    )


# ---------------------------------------------------------------------------
# E104: readability profile — Flesch reading ease per source
# ---------------------------------------------------------------------------
# The classic readability screen as pure Column arithmetic: sentences
# from [.!?]+ splits, syllables approximated as vowel-group runs (the
# standard heuristic), Flesch = 206.835 − 1.015·(words/sentences) −
# 84.6·(syllables/words). Identical regexes both engines; one scan.

_READABILITY_ORACLE = """
WITH d AS (
  SELECT source,
         len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x != ''))::DOUBLE AS words,
         GREATEST(len(list_filter(string_split_regex(text, '[.!?]+'),
                                  x -> trim(x) != '')), 1)::DOUBLE AS sents,
         len(regexp_extract_all(lower(text), '[aeiouy]+'))::DOUBLE AS sylls
  FROM documents
)
SELECT source,
       COUNT(*)::BIGINT AS n_docs,
       ROUND(AVG(words / sents), 4) AS avg_words_per_sentence,
       ROUND(AVG(sylls / NULLIF(words, 0)), 4) AS avg_syllables_per_word,
       ROUND(AVG(206.835 - 1.015 * (words / sents)
                 - 84.6 * (sylls / NULLIF(words, 0))), 4) AS avg_flesch
FROM d
GROUP BY source
ORDER BY source
"""


@register(
    "q_readability",
    oracle=_READABILITY_ORACLE,
    doc="Flesch readability profile (E104): words/sentence and vowel-"
    "group syllables/word per source folded into the classic 206.835 "
    "formula — pure Column regex arithmetic, one scan, the curation "
    "screen between E4's quality score and E94's Zipf fingerprint",
)
def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.functions.text import words as words_col

    docs = load_table(spark, sf_dir, "documents")
    words = F.size(words_col("text")).cast("double")
    sents = F.greatest(
        F.size(
            F.filter(
                F.split(F.col("text"), "[.!?]+"),
                lambda x: F.trim(x) != "",
            )
        ),
        F.lit(1),
    ).cast("double")
    sylls = F.size(
        F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")
    ).cast("double")
    d = docs.select(
        "source",
        words.alias("words"),
        sents.alias("sents"),
        sylls.alias("sylls"),
    )
    wps = F.col("words") / F.col("sents")
    spw = F.when(
        F.col("words") > 0, F.col("sylls") / F.col("words")
    )  # NULL when wordless, matching the oracle's NULLIF (AVG skips)
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(wps), 4).alias("avg_words_per_sentence"),
            F.round(F.avg(spw), 4).alias("avg_syllables_per_word"),
            F.round(
                F.avg(206.835 - 1.015 * wps - 84.6 * spw), 4
            ).alias("avg_flesch"),
        )
        .orderBy("source")
    )
