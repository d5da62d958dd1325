"""Round-4 statistics batch (E85-E88, E91-E93, E97-E100): Welch's
unequal-variance t-test, Kendall tau-b over a bounded daily grid,
Theil-Sen robust slope, Benjamini-Hochberg FDR control over a family of
per-series tests, two-sample Kolmogorov-Smirnov, the population
stability index, Cramér's V, the rolling median, the seasonal-baseline
residual screen, mutual information, and the burstiness (Fano +
inter-arrival CV) screen. All exact-oracle: every formula is
pure arithmetic written identically in the Spark Column expressions and
the DuckDB SQL, including a shared Abramowitz-Stegun normal-tail
polynomial where a p-value is needed (neither engine ships erf, so the
approximation IS the contract, hash-checked on both sides — and checked
against stdlib math.erf in tests/test_statistics2.py, which re-derives
every statistic here with an independent pure-Python reference).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# Shared arithmetic: two-sided normal p-value (Abramowitz & Stegun
# 7.1.26, |err| < 7.5e-8 — only |z| enters, so no sign branch) and the
# UTC day index / Monday=0 weekday (1970-01-01 was a Thursday = 3).
# Identical association order in both engines.
# ---------------------------------------------------------------------------

_B1, _B2, _B3, _B4, _B5 = (
    0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429,
)

# {z} and {t} are column expressions; {t} must equal 1/(1+0.2316419*|z|)
_PVAL_SQL = (
    "(2.0 * EXP(-(({z})*({z}))/2.0) / SQRT(2.0*PI()) * ({t}) * "
    f"({_B1} + ({{t}}) * ({_B2} + ({{t}}) * ({_B3} + ({{t}}) * "
    f"({_B4} + ({{t}}) * {_B5})))))"
)
_TINV_SQL = "(1.0 / (1.0 + 0.2316419 * ABS({z})))"


def _pval2(z: Column) -> Column:
    """Two-sided normal p-value, same A&S polynomial as _PVAL_SQL."""
    t = 1.0 / (1.0 + 0.2316419 * F.abs(z))
    poly = t * (_B1 + t * (_B2 + t * (_B3 + t * (_B4 + t * _B5))))
    return 2.0 * F.exp(-(z * z) / 2.0) / math.sqrt(2.0 * math.pi) * poly


_DAY_SQL = "(floor(epoch({col}))::BIGINT // 86400)"
_WEEKEND_SQL = f"((({_DAY_SQL} + 3) % 7) >= 5)"


def _day(col: Column) -> Column:
    return F.floor(F.unix_timestamp(col) / F.lit(86400)).cast("long")


def _weekend(col: Column) -> Column:
    return (_day(col) + 3) % 7 >= 5


# ---------------------------------------------------------------------------
# E85: Welch's t-test — unequal-variance mean comparison per series
# ---------------------------------------------------------------------------
# The parametric complement of the Mann-Whitney rank screen (E74): did
# each event type's mean VALUE shift weekend vs weekday? Welch's
# statistic never assumes equal variances (Student's pooled test
# silently does), df via Welch-Satterthwaite, two-sided p from the
# shared normal tail (exact-t CDFs exist in neither engine; at corpus
# df the normal tail is indistinguishable — and because both sides
# compute the SAME polynomial, the hash match checks it exactly). One
# partial-aggregated scan of conditional moments; output is
# types-sized. At 100 TB nothing changes: the scan is map-side
# combined, the t arithmetic runs on the tiny aggregate.

_WELCH_ORACLE = f"""
WITH we AS (
  SELECT event_type, value, {_WEEKEND_SQL.format(col='ts')} AS w FROM events
),
m AS (
  SELECT event_type,
         COUNT(*) FILTER (WHERE w)::DOUBLE AS n1,
         COUNT(*) FILTER (WHERE NOT w)::DOUBLE AS n2,
         AVG(value) FILTER (WHERE w) AS m1,
         AVG(value) FILTER (WHERE NOT w) AS m2,
         VAR_SAMP(value) FILTER (WHERE w) AS v1,
         VAR_SAMP(value) FILTER (WHERE NOT w) AS v2
  FROM we GROUP BY event_type
),
t AS (
  SELECT event_type, n1, n2,
         (m1 - m2) / SQRT(v1/n1 + v2/n2) AS t_stat,
         POW(v1/n1 + v2/n2, 2)
           / (POW(v1/n1, 2)/(n1-1.0) + POW(v2/n2, 2)/(n2-1.0)) AS df
  FROM m
)
SELECT event_type,
       n1::BIGINT AS n_weekend, n2::BIGINT AS n_weekday,
       ROUND(t_stat, 4) AS t_stat,
       ROUND(df, 2) AS welch_df,
       ROUND({_PVAL_SQL.format(z='t_stat', t=_TINV_SQL.format(z='t_stat'))}, 4)
         AS p_value
FROM t
ORDER BY event_type
"""


@register(
    "q_welch_ttest",
    oracle=_WELCH_ORACLE,
    doc="Welch's unequal-variance t-test (E85): weekend-vs-weekday mean "
    "shift per event series — conditional moments in ONE map-side-"
    "combined scan, Welch-Satterthwaite df, two-sided p via the shared "
    "A&S normal polynomial (identical arithmetic in the oracle, so the "
    "approximation is hash-checked, not hand-waved); the parametric "
    "complement of E74's rank test",
)
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", _weekend(F.col("ts")).alias("w")
    )
    w = F.col("w")
    m = ev.groupBy("event_type").agg(
        F.count(F.when(w, 1)).cast("double").alias("n1"),
        F.count(F.when(~w, 1)).cast("double").alias("n2"),
        F.avg(F.when(w, F.col("value"))).alias("m1"),
        F.avg(F.when(~w, F.col("value"))).alias("m2"),
        F.var_samp(F.when(w, F.col("value"))).alias("v1"),
        F.var_samp(F.when(~w, F.col("value"))).alias("v2"),
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    t_stat = (F.col("m1") - F.col("m2")) / F.sqrt(se2)
    df = F.pow(se2, 2) / (
        F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1.0)
        + F.pow(F.col("v2") / F.col("n2"), 2) / (F.col("n2") - 1.0)
    )
    return m.select(
        "event_type",
        F.col("n1").cast("long").alias("n_weekend"),
        F.col("n2").cast("long").alias("n_weekday"),
        F.round(t_stat, 4).alias("t_stat"),
        F.round(df, 2).alias("welch_df"),
        F.round(_pval2(t_stat), 4).alias("p_value"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# E86: Kendall tau-b — ordinal association between two daily series
# ---------------------------------------------------------------------------
# Spearman (E73) correlates ranks within one series; Kendall asks: of
# all PAIRS of days, how many order click-traffic and purchase-traffic
# the same way? tau-b corrects for ties in both margins (integer daily
# counts tie often). The O(n²) pair enumeration is safe at any corpus
# size because it runs on the DAY GRID, not the events: the grid is
# bounded by the calendar (a month is 30 rows whether the events are
# 10k or 100 TB), produced by one partial-aggregated scan first.

_KENDALL_ORACLE = f"""
WITH daily AS (
  SELECT {_DAY_SQL.format(col='ts')} AS d,
         COUNT(*) FILTER (WHERE event_type = 'click')::DOUBLE AS x,
         COUNT(*) FILTER (WHERE event_type = 'purchase')::DOUBLE AS y
  FROM events GROUP BY 1
),
p AS (
  SELECT
    SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END)::DOUBLE AS c,
    SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END)::DOUBLE AS d,
    SUM(CASE WHEN a.x = b.x THEN 1 ELSE 0 END)::DOUBLE AS tx,
    SUM(CASE WHEN a.y = b.y THEN 1 ELSE 0 END)::DOUBLE AS ty,
    COUNT(*)::DOUBLE AS n0
  FROM daily a JOIN daily b ON a.d < b.d
)
SELECT (SELECT COUNT(*) FROM daily)::BIGINT AS n_days,
       c::BIGINT AS concordant,
       d::BIGINT AS discordant,
       ROUND((c - d) / SQRT((n0 - tx) * (n0 - ty)), 4) AS tau_b
FROM p
"""


@register(
    "q_kendall_daily",
    oracle=_KENDALL_ORACLE,
    doc="Kendall tau-b (E86): pairwise-concordance association between "
    "the daily click and purchase series, tie-corrected in both "
    "margins — the pair join runs on the calendar-bounded daily grid "
    "(one partial-agg scan first), so the quadratic stage never sees "
    "corpus-sized input; completes the E60/E73 association family",
)
def q_kendall_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(_day(F.col("ts")).alias("d"))
        .agg(
            F.count(F.when(F.col("event_type") == "click", 1))
            .cast("double")
            .alias("x"),
            F.count(F.when(F.col("event_type") == "purchase", 1))
            .cast("double")
            .alias("y"),
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    pr = a.join(F.broadcast(b), F.col("a.d") < F.col("b.d"))
    dx = F.col("a.x") - F.col("b.x")
    dy = F.col("a.y") - F.col("b.y")
    p = pr.agg(
        F.sum(F.when(dx * dy > 0, 1).otherwise(0)).cast("double").alias("c"),
        F.sum(F.when(dx * dy < 0, 1).otherwise(0)).cast("double").alias("d"),
        F.sum(F.when(dx == 0, 1).otherwise(0)).cast("double").alias("tx"),
        F.sum(F.when(dy == 0, 1).otherwise(0)).cast("double").alias("ty"),
        F.count(F.lit(1)).cast("double").alias("n0"),
    )
    n_days = daily.agg(F.count(F.lit(1)).alias("n_days"))
    return p.crossJoin(F.broadcast(n_days)).select(
        F.col("n_days").cast("long").alias("n_days"),
        F.col("c").cast("long").alias("concordant"),
        F.col("d").cast("long").alias("discordant"),
        F.round(
            (F.col("c") - F.col("d"))
            / F.sqrt((F.col("n0") - F.col("tx")) * (F.col("n0") - F.col("ty"))),
            4,
        ).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# E87: Theil-Sen estimator — median-of-slopes robust trend
# ---------------------------------------------------------------------------
# E60's OLS slope is dragged arbitrarily far by one corrupted day;
# Theil-Sen (median over all pairwise slopes, 29.3% breakdown point) is
# the standard robust replacement. Same boundedness argument as E86:
# slopes are enumerated over the calendar-bounded daily-revenue grid,
# never the raw events. Exact interpolated medians on both sides
# (Spark percentile == DuckDB quantile_cont).

_THEILSEN_ORACLE = f"""
WITH daily AS (
  SELECT {_DAY_SQL.format(col='ts')} AS d, SUM(value) AS y
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
base AS (
  SELECT (d - (SELECT MIN(d) FROM daily))::DOUBLE AS x, y FROM daily
),
slopes AS (
  SELECT (b.y - a.y) / (b.x - a.x) AS s
  FROM base a JOIN base b ON a.x < b.x
),
sl AS (SELECT quantile_cont(s, 0.5) AS slope, COUNT(*)::BIGINT AS n_pairs
       FROM slopes)
SELECT (SELECT COUNT(*) FROM base)::BIGINT AS n_days,
       sl.n_pairs,
       ROUND(sl.slope, 4) AS sen_slope,
       ROUND((SELECT quantile_cont(y - sl.slope * x, 0.5) FROM base), 4)
         AS sen_intercept
FROM sl
"""


@register(
    "q_theilsen_slope",
    oracle=_THEILSEN_ORACLE,
    doc="Theil-Sen robust trend (E87): median of all pairwise slopes of "
    "daily purchase revenue (29.3% breakdown vs OLS's zero), intercept "
    "= median residual at the fitted slope — pair enumeration on the "
    "calendar-bounded grid after one partial-agg scan; exact "
    "interpolated medians both sides",
)
def q_theilsen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(_day(F.col("ts")).alias("d"))
        .agg(F.sum("value").alias("y"))
    )
    mn = daily.agg(F.min("d").alias("d0"))
    base = daily.crossJoin(F.broadcast(mn)).select(
        (F.col("d") - F.col("d0")).cast("double").alias("x"), "y"
    )
    a, b = base.alias("a"), base.alias("b")
    slopes = a.join(F.broadcast(b), F.col("a.x") < F.col("b.x")).select(
        ((F.col("b.y") - F.col("a.y")) / (F.col("b.x") - F.col("a.x"))).alias(
            "s"
        )
    )
    sl = slopes.agg(
        F.percentile("s", F.lit(0.5)).alias("slope"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    ic = (
        base.crossJoin(F.broadcast(sl))
        .agg(
            F.percentile(
                F.col("y") - F.col("slope") * F.col("x"), F.lit(0.5)
            ).alias("icpt")
        )
    )
    nd = base.agg(F.count(F.lit(1)).alias("n_days"))
    return (
        sl.crossJoin(F.broadcast(ic))
        .crossJoin(F.broadcast(nd))
        .select(
            F.col("n_days").cast("long").alias("n_days"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.round("slope", 4).alias("sen_slope"),
            F.round("icpt", 4).alias("sen_intercept"),
        )
    )


# ---------------------------------------------------------------------------
# E88: Benjamini-Hochberg FDR — multiple-testing control for a family
# ---------------------------------------------------------------------------
# Running E85/E74-style tests across every (series, weekday) cell means
# 35 chances for a false positive; controlling the FAMILY-wise false
# discovery rate is what makes screening honest. Per-cell one-sample
# proportion z (is this weekday's share of the series ≠ 1/7?), then the
# BH step-up at q=0.10: sort p ascending, k = max{i : p_i ≤ i·q/m},
# reject p ≤ p_k — expressed as one window max over the family-sized
# frame. p is pre-rounded to 6dp on BOTH sides before the comparison so
# the step-up decision can never split on a last-ulp libm difference.

_FDR_Q = 0.10


def _fdr_oracle() -> str:
    day = _DAY_SQL.format(col="ts")
    p = _PVAL_SQL.format(z="zs", t=_TINV_SQL.format(z="zs"))
    return f"""
WITH cells AS (
  SELECT event_type, (({day} + 3) % 7)::BIGINT AS dow, COUNT(*)::DOUBLE AS c
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT event_type, SUM(c) AS n FROM cells GROUP BY 1
),
stats AS (
  SELECT c.event_type, c.dow, t.n, c.c / t.n AS share,
         ((c.c / t.n - 1.0/7.0)
            / SQRT((1.0/7.0) * (6.0/7.0) / t.n)) AS zs
  FROM cells c JOIN tot t USING (event_type)
),
pv AS (
  SELECT event_type, dow, n::BIGINT AS n, ROUND(share, 4) AS share,
         ROUND(zs, 4) AS z_stat, ROUND({p}, 6) AS p6
  FROM stats
),
bh AS (
  SELECT *,
         ROW_NUMBER() OVER (ORDER BY p6, event_type, dow) AS i,
         COUNT(*) OVER () AS m
  FROM pv
)
SELECT event_type, dow, n, share, z_stat,
       ROUND(p6, 4) AS p_value,
       (p6 <= COALESCE(MAX(CASE WHEN p6 <= i * {_FDR_Q} / m THEN p6 END)
                         OVER (), -1.0)) AS rejected
FROM bh
ORDER BY event_type, dow
"""


@register(
    "q_fdr_weekday",
    oracle=_fdr_oracle(),
    doc="Benjamini-Hochberg FDR screen (E88): 35 per-(series, weekday) "
    "proportion z-tests against the uniform 1/7 share, then the BH "
    "step-up at q=0.10 as ONE window max over the family-sized frame — "
    "the multiple-testing control that makes mass screening honest; "
    "p pre-rounded 6dp both sides so the step-up can't split on a "
    "last-ulp libm difference",
)
def q_fdr_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", ((_day(F.col("ts")) + 3) % 7).alias("dow")
    )
    cells = ev.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    tot = cells.groupBy("event_type").agg(F.sum("c").alias("n"))
    share = F.col("c") / F.col("n")
    zs = (share - 1.0 / 7.0) / F.sqrt((1.0 / 7.0) * (6.0 / 7.0) / F.col("n"))
    pv = (
        cells.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "dow",
            F.col("n").cast("long").alias("n"),
            F.round(share, 4).alias("share"),
            F.round(zs, 4).alias("z_stat"),
            F.round(_pval2(zs), 6).alias("p6"),
        )
    )
    wall = W.orderBy(F.lit(1)).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    bh = pv.withColumn(
        "i", F.row_number().over(W.orderBy("p6", "event_type", "dow"))
    ).withColumn("m", F.count(F.lit(1)).over(wall))
    cutoff = F.max(
        F.when(F.col("p6") <= F.col("i") * _FDR_Q / F.col("m"), F.col("p6"))
    ).over(wall)
    return (
        bh.select(
            "event_type",
            "dow",
            "n",
            "share",
            "z_stat",
            F.round("p6", 4).alias("p_value"),
            (F.col("p6") <= F.coalesce(cutoff, F.lit(-1.0))).alias("rejected"),
        )
        .orderBy("event_type", "dow")
    )

# ---------------------------------------------------------------------------
# E91: two-sample Kolmogorov-Smirnov — distribution-shape drift
# ---------------------------------------------------------------------------
# Mann-Whitney (E74) detects location shift, PSI-style screens detect
# binned share movement; KS is the binning-free supremum distance
# between the two empirical CDFs — sensitive to ANY shape change. Exact
# D via the collapsed-value trick: group both samples by (series,
# value), one cumulative-sum window over the distinct-value order gives
# both ECDFs, D = max |F1 - F2|. The reject boolean uses the classic
# large-sample critical value c(0.05) = 1.3581 * sqrt((n1+n2)/(n1*n2))
# — pure arithmetic, identical both sides.

_KS_ORACLE = f"""
WITH we AS (
  SELECT event_type, value, {_WEEKEND_SQL.format(col='ts')} AS w FROM events
),
g AS (
  SELECT event_type, value,
         COUNT(*) FILTER (WHERE w)::DOUBLE AS c1,
         COUNT(*) FILTER (WHERE NOT w)::DOUBLE AS c2
  FROM we GROUP BY event_type, value
),
cum AS (
  SELECT event_type,
         SUM(c1) OVER (PARTITION BY event_type ORDER BY value) AS f1,
         SUM(c2) OVER (PARTITION BY event_type ORDER BY value) AS f2,
         SUM(c1) OVER (PARTITION BY event_type) AS n1,
         SUM(c2) OVER (PARTITION BY event_type) AS n2
  FROM g
)
SELECT event_type,
       MAX(n1)::BIGINT AS n_weekend,
       MAX(n2)::BIGINT AS n_weekday,
       ROUND(MAX(ABS(f1 / n1 - f2 / n2)), 4) AS ks_d,
       ROUND(1.3581 * SQRT((MAX(n1) + MAX(n2)) / (MAX(n1) * MAX(n2))), 4)
         AS d_crit,
       (ROUND(MAX(ABS(f1 / n1 - f2 / n2)), 4)
          > ROUND(1.3581 * SQRT((MAX(n1) + MAX(n2)) / (MAX(n1) * MAX(n2))), 4))
         AS reject_95
FROM cum
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q_ks_twosample",
    oracle=_KS_ORACLE,
    doc="two-sample Kolmogorov-Smirnov (E91): binning-free sup distance "
    "between the weekend and weekday value ECDFs per series — both "
    "ECDFs from ONE cumulative window over values collapsed per "
    "(series, value), classic 1.3581-critical-value reject boolean; "
    "the shape-sensitive member of the E74/E92 drift family",
)
def q_ks_twosample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", _weekend(F.col("ts")).alias("w")
    )
    g = ev.groupBy("event_type", "value").agg(
        F.count(F.when(F.col("w"), 1)).cast("double").alias("c1"),
        F.count(F.when(~F.col("w"), 1)).cast("double").alias("c2"),
    )
    wcum = W.partitionBy("event_type").orderBy("value")
    wall = W.partitionBy("event_type")
    cum = g.select(
        "event_type",
        F.sum("c1").over(wcum).alias("f1"),
        F.sum("c2").over(wcum).alias("f2"),
        F.sum("c1").over(wall).alias("n1"),
        F.sum("c2").over(wall).alias("n2"),
    )
    d = F.round(
        F.max(F.abs(F.col("f1") / F.col("n1") - F.col("f2") / F.col("n2"))), 4
    )
    crit = F.round(
        1.3581
        * F.sqrt((F.max("n1") + F.max("n2")) / (F.max("n1") * F.max("n2"))),
        4,
    )
    return (
        cum.groupBy("event_type")
        .agg(
            F.max("n1").cast("long").alias("n_weekend"),
            F.max("n2").cast("long").alias("n_weekday"),
            d.alias("ks_d"),
            crit.alias("d_crit"),
            (d > crit).alias("reject_95"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# E92: population stability index — the scorecard-drift number
# ---------------------------------------------------------------------------
# PSI over first-half-derived decile bins, per series: bins are the
# interpolated deciles of the FIRST time half (boundaries rounded 4dp
# on both sides — values are 2dp, so binning can't split on quantile
# float noise), second-half shares compared bin-by-bin with the
# standard 1e-6 clamp; PSI = sum (p2-p1) ln(p2/p1). One scan for the
# halves split, one quantile pass on the first half (series-sized
# boundary frame broadcast back), one binned count pass.

_PSI_ORACLE = f"""
WITH cut AS (
  SELECT event_type,
         (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS cut_us
  FROM events GROUP BY event_type
),
halves AS (
  SELECT e.event_type, e.value,
         (epoch_us(e.ts) <= c.cut_us) AS first_half
  FROM events e JOIN cut c USING (event_type)
),
bounds AS (
  SELECT event_type,
         list_transform(
           quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
           b -> ROUND(b, 4)) AS bs
  FROM halves WHERE first_half GROUP BY event_type
),
binned AS (
  SELECT h.event_type, h.first_half,
         1 + len(list_filter(b.bs, x -> h.value > x)) AS bin
  FROM halves h JOIN bounds b USING (event_type)
),
shares AS (
  SELECT event_type, bin,
         COUNT(*) FILTER (WHERE first_half)::DOUBLE AS c1,
         COUNT(*) FILTER (WHERE NOT first_half)::DOUBLE AS c2
  FROM binned GROUP BY event_type, bin
),
tot AS (
  SELECT event_type, SUM(c1) AS n1, SUM(c2) AS n2 FROM shares
  GROUP BY event_type
)
SELECT s.event_type,
       t.n1::BIGINT AS n_first, t.n2::BIGINT AS n_second,
       COUNT(*)::BIGINT AS n_bins,
       ROUND(SUM(
         (GREATEST(s.c2 / t.n2, 1e-6) - GREATEST(s.c1 / t.n1, 1e-6))
         * LN(GREATEST(s.c2 / t.n2, 1e-6) / GREATEST(s.c1 / t.n1, 1e-6))
       ), 4) AS psi
FROM shares s JOIN tot t USING (event_type)
GROUP BY s.event_type, t.n1, t.n2
ORDER BY s.event_type
"""


@register(
    "q_psi_value_drift",
    oracle=_PSI_ORACLE,
    doc="population stability index (E92): decile bins learned on the "
    "first time half (boundaries rounded 4dp both sides; values are "
    "2dp so binning can't split on quantile float noise), second-half "
    "shares compared with the standard 1e-6 clamp — the scorecard "
    "drift number; series-sized boundary frame broadcast over one "
    "binned-count pass",
)
def q_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("us"),
    )
    cut = ev.groupBy("event_type").agg(
        F.floor((F.min("us") + F.max("us")) / 2).alias("cut_us")
    )
    halves = ev.join(F.broadcast(cut), "event_type").select(
        "event_type", "value", (F.col("us") <= F.col("cut_us")).alias("fh")
    )
    qs = [i / 10.0 for i in range(1, 10)]
    bounds = (
        halves.filter("fh")
        .groupBy("event_type")
        .agg(
            F.transform(
                F.percentile("value", F.array(*[F.lit(q) for q in qs])),
                lambda b: F.round(b, 4),
            ).alias("bs")
        )
    )
    binned = halves.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "fh",
        (
            1
            + F.size(F.filter("bs", lambda x: F.col("value") > x))
        ).alias("bin"),
    )
    shares = binned.groupBy("event_type", "bin").agg(
        F.count(F.when(F.col("fh"), 1)).cast("double").alias("c1"),
        F.count(F.when(~F.col("fh"), 1)).cast("double").alias("c2"),
    )
    tot = shares.groupBy("event_type").agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    p1 = F.greatest(F.col("c1") / F.col("n1"), F.lit(1e-6))
    p2 = F.greatest(F.col("c2") / F.col("n2"), F.lit(1e-6))
    return (
        shares.join(F.broadcast(tot), "event_type")
        .groupBy(
            "event_type",
            F.col("n1").cast("long").alias("n_first"),
            F.col("n2").cast("long").alias("n_second"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_bins"),
            F.round(F.sum((p2 - p1) * F.log(p2 / p1)), 4).alias("psi"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# E93: Cramér's V — effect size for the categorical association
# ---------------------------------------------------------------------------
# E62's chi-square screen says WHETHER event_type and time-of-week are
# associated; at corpus n, everything is "significant" — V rescales
# chi² to [0,1] so the answer is HOW MUCH. One scan to the 5×7 cell
# table, marginals joined back, one arithmetic reduce.

_CRAMERS_ORACLE = f"""
WITH cells AS (
  SELECT event_type,
         (({_DAY_SQL.format(col='ts')} + 3) % 7)::BIGINT AS dow,
         COUNT(*)::DOUBLE AS o
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT event_type, dow, o,
         SUM(o) OVER (PARTITION BY event_type) AS rt,
         SUM(o) OVER (PARTITION BY dow) AS ct,
         SUM(o) OVER () AS n
  FROM cells
),
agg AS (
  SELECT MAX(n) AS n,
         SUM(POW(o - rt * ct / n, 2) / (rt * ct / n)) AS chi2,
         COUNT(DISTINCT event_type) AS r,
         COUNT(DISTINCT dow) AS c
  FROM m
)
SELECT n::BIGINT AS n,
       ROUND(chi2, 4) AS chi2,
       ((r - 1) * (c - 1))::BIGINT AS df,
       ROUND(SQRT(chi2 / (n * (LEAST(r, c) - 1.0))), 4) AS cramers_v
FROM agg
"""


@register(
    "q_cramers_v",
    oracle=_CRAMERS_ORACLE,
    doc="Cramér's V (E93): effect size of the event-series × weekday "
    "association — chi² over the 5×7 cell table rescaled to [0,1]; at "
    "corpus n everything is 'significant', V says how much. Cells via "
    "one map-side-combined scan; marginals are window sums on the "
    "cells-sized frame",
)
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", ((_day(F.col("ts")) + 3) % 7).alias("dow")
    )
    cells = ev.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("double").alias("o")
    )
    m = cells.select(
        "event_type",
        "dow",
        "o",
        F.sum("o").over(W.partitionBy("event_type")).alias("rt"),
        F.sum("o").over(W.partitionBy("dow")).alias("ct"),
        F.sum("o").over(
            W.partitionBy(F.lit(1)).rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        ).alias("n"),
    )
    e = F.col("rt") * F.col("ct") / F.col("n")
    agg = m.agg(
        F.max("n").alias("n"),
        F.sum(F.pow(F.col("o") - e, 2) / e).alias("chi2"),
        F.countDistinct("event_type").alias("r"),
        F.countDistinct("dow").alias("c"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.round("chi2", 4).alias("chi2"),
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("df"),
        F.round(
            F.sqrt(F.col("chi2") / (F.col("n") * (F.least("r", "c") - 1.0))),
            4,
        ).alias("cramers_v"),
    )

# ---------------------------------------------------------------------------
# E97: rolling median — robust trailing-window smoother
# ---------------------------------------------------------------------------
# E81's Bollinger bands use trailing mean ± 2σ, which one spike drags;
# the rolling MEDIAN is the robust smoother ops dashboards actually
# want. Exact interpolated median over the trailing 25-row frame as a
# true window aggregate (percentile/quantile_cont support window frames
# in both engines — no collect_list, no UDF); per-series sort shuffle
# only, window frame bounded at 25 rows regardless of corpus size.

_ROLLMED_WIN = 25

_ROLLMED_ORACLE = f"""
WITH s AS (
  SELECT event_type, event_id, value,
         quantile_cont(value, 0.5) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
           ROWS BETWEEN {_ROLLMED_WIN - 1} PRECEDING AND CURRENT ROW
         ) AS med,
         COUNT(*) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
           ROWS BETWEEN {_ROLLMED_WIN - 1} PRECEDING AND CURRENT ROW
         ) AS wn
  FROM events
)
SELECT event_type,
       COUNT(*)::BIGINT AS n_full_windows,
       ROUND(AVG(ABS(value - med)), 4) AS mean_abs_dev_from_med,
       ROUND(MAX(ABS(value - med)), 4) AS max_abs_dev_from_med,
       SUM(CASE WHEN ABS(value - med) > 100.0 THEN 1 ELSE 0 END)::BIGINT
         AS n_breaches
FROM s
WHERE wn = {_ROLLMED_WIN}
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q_rolling_median",
    oracle=_ROLLMED_ORACLE,
    doc=f"rolling median (E97): exact interpolated median over the "
    f"trailing {_ROLLMED_WIN}-row frame per series as a TRUE window "
    "aggregate (percentile over ROWS BETWEEN — no collect_list, no "
    "UDF), full-window gated; the spike-proof complement of E81's "
    "mean±2σ bands. One per-series sort shuffle; the frame stays 25 "
    "rows at any corpus size",
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__ev_rollmed")
    return spark.sql(
        f"""
WITH s AS (
  SELECT event_type, event_id, value,
         percentile(value, 0.5) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
           ROWS BETWEEN {_ROLLMED_WIN - 1} PRECEDING AND CURRENT ROW
         ) AS med,
         COUNT(*) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
           ROWS BETWEEN {_ROLLMED_WIN - 1} PRECEDING AND CURRENT ROW
         ) AS wn
  FROM __ev_rollmed
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_full_windows,
       ROUND(AVG(ABS(value - med)), 4) AS mean_abs_dev_from_med,
       ROUND(MAX(ABS(value - med)), 4) AS max_abs_dev_from_med,
       CAST(SUM(CASE WHEN ABS(value - med) > 100.0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_breaches
FROM s
WHERE wn = {_ROLLMED_WIN}
GROUP BY event_type
ORDER BY event_type
"""
    )


# ---------------------------------------------------------------------------
# E98: seasonal-baseline residual screen — hour-of-day decomposition
# ---------------------------------------------------------------------------
# E22's trailing-24h anomaly catches level shifts and E65's CUSUM
# catches drifts, but both confound the DAILY CYCLE with the signal: a
# 9am spike is normal, a 3am spike is not. The STL-lite fix: learn each
# series' hour-of-day seasonal mean in one partial-agg pass (a 24-row
# frame per series), subtract it, and z-score the residuals against the
# series' residual σ. Two scans + one broadcast of the seasonal frame.

_SEASONAL_ORACLE = """
WITH hr AS (
  SELECT event_type, value,
         EXTRACT(hour FROM ts)::BIGINT AS hh
  FROM events
),
seas AS (
  SELECT event_type, hh, AVG(value) AS hmean
  FROM hr GROUP BY event_type, hh
),
resid AS (
  SELECT h.event_type, h.value - s.hmean AS r
  FROM hr h JOIN seas s ON s.event_type = h.event_type AND s.hh = h.hh
),
stats AS (
  SELECT event_type, STDDEV_SAMP(r) AS sd FROM resid GROUP BY event_type
)
SELECT r.event_type,
       COUNT(*)::BIGINT AS n,
       ROUND(st.sd, 4) AS resid_sd,
       ROUND(MAX(ABS(r.r) / st.sd), 4) AS max_abs_z,
       SUM(CASE WHEN ABS(r.r) / st.sd > 3.0 THEN 1 ELSE 0 END)::BIGINT
         AS n_beyond_3sd
FROM resid r JOIN stats st USING (event_type)
GROUP BY r.event_type, st.sd
ORDER BY r.event_type
"""


@register(
    "q_seasonal_residuals",
    oracle=_SEASONAL_ORACLE,
    doc="seasonal-baseline residual screen (E98): hour-of-day seasonal "
    "means per series (24-row frame, one partial-agg pass) subtracted "
    "from each value, residuals z-scored against the series' residual "
    "σ — the STL-lite decomposition that stops the daily cycle from "
    "masquerading as anomaly (E22/E65's blind spot); seasonal frame "
    "broadcast back over one scan",
)
def q_seasonal_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    hr = load_table(spark, sf_dir, "events").select(
        "event_type", "value", F.hour("ts").cast("long").alias("hh")
    )
    seas = hr.groupBy("event_type", "hh").agg(F.avg("value").alias("hmean"))
    resid = hr.join(F.broadcast(seas), ["event_type", "hh"]).select(
        "event_type", (F.col("value") - F.col("hmean")).alias("r")
    )
    stats = resid.groupBy("event_type").agg(F.stddev_samp("r").alias("sd"))
    z = F.abs(F.col("r")) / F.col("sd")
    return (
        resid.join(F.broadcast(stats), "event_type")
        .groupBy("event_type", F.round("sd", 4).alias("resid_sd"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max(z), 4).alias("max_abs_z"),
            F.sum(F.when(z > 3.0, 1).otherwise(0)).alias("n_beyond_3sd"),
        )
        .select(
            "event_type", "n", "resid_sd", "max_abs_z", "n_beyond_3sd"
        )
        .orderBy("event_type")
    )

# ---------------------------------------------------------------------------
# E99: mutual information — how many BITS does the weekday carry?
# ---------------------------------------------------------------------------
# Cramér's V (E93) rescales chi² to [0,1]; mutual information answers
# the same question in information units — MI(series; weekday) in bits
# is directly comparable across feature candidates, which is why MI is
# the standard feature-selection screen. Same cells-sized frame as E93:
# one scan to the 5×7 table, marginal CTEs (never a DISTINCT over
# computed doubles — equal marginals would silently collapse), one
# arithmetic reduce. U = MI/H(series) normalizes to [0,1].

_MI_ORACLE = f"""
WITH cells AS (
  SELECT event_type,
         (({_DAY_SQL.format(col='ts')} + 3) % 7)::BIGINT AS dow,
         COUNT(*)::DOUBLE AS o
  FROM events GROUP BY 1, 2
),
tot AS (SELECT SUM(o) AS n FROM cells),
rowm AS (SELECT event_type, SUM(o) AS rt FROM cells GROUP BY event_type),
colm AS (SELECT dow, SUM(o) AS ct FROM cells GROUP BY dow),
mi AS (
  SELECT SUM((c.o / t.n)
             * LOG2((c.o / t.n) / ((r.rt / t.n) * (cl.ct / t.n)))) AS mi_bits,
         COUNT(*)::BIGINT AS n_cells,
         MAX(t.n)::BIGINT AS n
  FROM cells c
  JOIN rowm r USING (event_type)
  JOIN colm cl USING (dow)
  CROSS JOIN tot t
),
h AS (
  SELECT -SUM((rt / t.n) * LOG2(rt / t.n)) AS h_row
  FROM rowm CROSS JOIN tot t
)
SELECT mi.n, mi.n_cells,
       ROUND(mi.mi_bits, 4) AS mi_bits,
       ROUND(mi.mi_bits / h.h_row, 4) AS uncertainty_coeff
FROM mi CROSS JOIN h
"""


@register(
    "q_mutual_information",
    oracle=_MI_ORACLE,
    doc="mutual information (E99): MI(series; weekday) in bits over the "
    "same cells-sized contingency frame as E93, plus the uncertainty "
    "coefficient U = MI/H(series) — the feature-selection screen whose "
    "units compare across candidate features; one scan, marginal CTEs, "
    "arithmetic reduce",
)
def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", ((_day(F.col("ts")) + 3) % 7).alias("dow")
    )
    cells = ev.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("double").alias("o")
    )
    tot = cells.agg(F.sum("o").alias("n"))
    rowm = cells.groupBy("event_type").agg(F.sum("o").alias("rt"))
    colm = cells.groupBy("dow").agg(F.sum("o").alias("ct"))
    joined = (
        cells.join(F.broadcast(rowm), "event_type")
        .join(F.broadcast(colm), "dow")
        .crossJoin(F.broadcast(tot))
    )
    p = F.col("o") / F.col("n")
    mi = joined.agg(
        F.sum(
            p
            * F.log2(
                p / ((F.col("rt") / F.col("n")) * (F.col("ct") / F.col("n")))
            )
        ).alias("mi_bits"),
        F.count(F.lit(1)).alias("n_cells"),
        F.max("n").cast("long").alias("n"),
    )
    h = (
        rowm.crossJoin(F.broadcast(tot))
        .agg(
            (-F.sum(
                (F.col("rt") / F.col("n")) * F.log2(F.col("rt") / F.col("n"))
            )).alias("h_row")
        )
    )
    return mi.crossJoin(F.broadcast(h)).select(
        "n",
        "n_cells",
        F.round("mi_bits", 4).alias("mi_bits"),
        F.round(F.col("mi_bits") / F.col("h_row"), 4).alias(
            "uncertainty_coeff"
        ),
    )


# ---------------------------------------------------------------------------
# E100: burstiness — Fano factor + inter-arrival CV per series
# ---------------------------------------------------------------------------
# A Poisson process has variance == mean daily counts (Fano factor 1)
# and exponential gaps (CV 1); real traffic bursts. The two classic
# burstiness numbers per series: the Fano factor of the daily-count
# series (calendar-bounded grid) and the coefficient of variation of
# inter-event gaps in MICROSECONDS (epoch_us both sides — Spark's
# unix_timestamp truncates sub-seconds and would shift every gap); one
# LAG window pass, partial-agg moments.

_BURSTINESS_ORACLE = f"""
WITH daily AS (
  SELECT event_type, {_DAY_SQL.format(col='ts')} AS d, COUNT(*)::DOUBLE AS c
  FROM events GROUP BY 1, 2
),
fano AS (
  SELECT event_type, COUNT(*)::BIGINT AS n_days,
         VAR_SAMP(c) / AVG(c) AS fano
  FROM daily GROUP BY event_type
),
gaps AS (
  SELECT event_type,
         (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
            PARTITION BY event_type ORDER BY ts, event_id))::DOUBLE AS gap
  FROM events
),
cv AS (
  SELECT event_type,
         COUNT(gap)::BIGINT AS n_gaps,
         STDDEV_SAMP(gap) / AVG(gap) AS gap_cv
  FROM gaps GROUP BY event_type
)
SELECT f.event_type, f.n_days,
       ROUND(f.fano, 4) AS fano_factor,
       cv.n_gaps,
       ROUND(cv.gap_cv, 4) AS interarrival_cv
FROM fano f JOIN cv USING (event_type)
ORDER BY f.event_type
"""


@register(
    "q_burstiness",
    oracle=_BURSTINESS_ORACLE,
    doc="burstiness screen (E100): Fano factor of the daily-count grid "
    "(Poisson ⇒ 1; >1 = bursty) and the inter-arrival coefficient of "
    "variation per series (one LAG window pass + partial-agg moments, "
    "gaps in µs on both sides) — the dispersion companion of E52's "
    "autocorrelation",
)
def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", _day(F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("double").alias("c"))
    fano = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        (F.var_samp("c") / F.avg("c")).alias("fano"),
    )
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    wl = W.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type", (us - F.lag(us).over(wl)).cast("double").alias("gap")
    )
    cv = gaps.groupBy("event_type").agg(
        F.count("gap").alias("n_gaps"),
        (F.stddev_samp("gap") / F.avg("gap")).alias("gap_cv"),
    )
    return (
        fano.join(cv, "event_type")
        .select(
            "event_type",
            F.col("n_days").cast("long").alias("n_days"),
            F.round("fano", 4).alias("fano_factor"),
            F.col("n_gaps").cast("long").alias("n_gaps"),
            F.round("gap_cv", 4).alias("interarrival_cv"),
        )
        .orderBy("event_type")
    )
