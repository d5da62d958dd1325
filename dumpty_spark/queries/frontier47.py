"""Round-11 engine extensions, part 2 (EXT E245-E247): the model
DIAGNOSTICS family — every test here checks an ASSUMPTION a shipped
model leans on, completing the arc E244 (Durbin-Watson, residual serial
correlation) started:

  E245 Brown-Forsythe/Levene — variance homogeneity across groups, the
       assumption E233's one-way ANOVA quietly makes;
  E246 Jarque-Bera — normality of the value distribution, the
       assumption behind every z/t-based interval in the stats family;
  E247 Poisson overdispersion — equidispersion of daily event counts,
       the assumption behind Poisson rate models (relational6/8).

Portability discipline (the E233 lesson): every heavy sum is an EXACT
integer on a fixed grid — Brown-Forsythe doubles the milli grid so the
interpolated group median (a possible .5 multiple) stays integral;
Jarque-Bera's 3rd/4th raw moments sum in DECIMAL(38,0)/HUGEINT (a
BIGINT wraps at the 4th power); the dispersion test's per-day counts
are BIGINTs by construction. Closed forms of exact integers follow in
doubles, rounded identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E245: Brown-Forsythe (median-centered Levene) test
# ---------------------------------------------------------------------------
# W = ((N-k)/(k-1)) * SSB(z)/SSW(z) with z_ig = |x_ig - med_g| — an
# ANOVA on absolute deviations from the GROUP MEDIAN (the
# Brown-Forsythe robust variant). Exactness: x lives on the 1e3 grid
# (vm), the interpolated median of integers is a multiple of 0.5, so
# zm2 = |2*vm - round(2*med_g)| is an exact BIGINT and all moments are
# exact integer sums; W is one closed form of those integers.

_BF_ORACLE = """
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 1000, 0) AS BIGINT) AS vm
  FROM events
),
med AS (
  SELECT event_type,
         CAST(ROUND(2 * quantile_cont(vm, 0.5), 0) AS BIGINT) AS m2
  FROM v GROUP BY event_type
),
z AS (
  SELECT v.event_type, ABS(2 * v.vm - med.m2) AS zm
  FROM v JOIN med USING (event_type)
),
g AS (
  SELECT event_type, COUNT(*)::BIGINT AS n, SUM(zm) AS s,
         SUM(zm * zm) AS ss
  FROM z GROUP BY event_type
),
t AS (
  SELECT COUNT(*)::BIGINT AS k, SUM(n)::BIGINT AS n, SUM(s) AS s,
         SUM(ss) AS ss,
         SUM(CAST(s AS DOUBLE) * s / CAST(n AS DOUBLE)) AS grp_sq
  FROM g
)
SELECT k, n,
       ROUND(((grp_sq - CAST(s AS DOUBLE) * s / n) / (k - 1))
             / ((ss - grp_sq) / (n - k)), 4) AS w_stat,
       ROUND((grp_sq - CAST(s AS DOUBLE) * s / n) / 4000000.0, 4)
         AS ss_between,
       ROUND((ss - grp_sq) / 4000000.0, 4) AS ss_within
FROM t
"""


@register(
    "q_levene_brown_forsythe",
    oracle=_BF_ORACLE,
    doc="Brown-Forsythe/Levene test (E245): variance homogeneity of "
    "event value across types — the assumption E233's ANOVA makes; "
    "ANOVA-on-|x - group median| with the milli grid DOUBLED so the "
    "interpolated integer median (.5-multiple) stays an exact BIGINT; "
    "one grouped-median pass + one exact-integer moment scan; "
    "numpy-anchored in tests/test_frontier47.py",
)
def q_levene_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.round(F.col("value") * 1000, 0).cast("long").alias("vm"),
    )
    med = v.groupBy("event_type").agg(
        F.round(2 * F.expr("percentile(vm, 0.5)"), 0).cast("long")
        .alias("m2")
    )
    z = v.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(2 * F.col("vm") - F.col("m2")).alias("zm")
    )
    g = z.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("zm").alias("s"),
        # zm <= ~2e6 on this grid -> zm^2 <= 4e12 per term; the SUM in
        # DECIMAL(38,0) like E233 (HUGEINT on the oracle side)
        F.sum((F.col("zm") * F.col("zm")).cast("decimal(38,0)"))
        .alias("ss"),
    )
    t = g.agg(
        F.count("*").alias("k"),
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.sum("ss").alias("ss"),
        F.sum(
            F.col("s").cast("double") * F.col("s") / F.col("n").cast("double")
        ).alias("grp_sq"),
    )
    sq = F.col("s").cast("double") * F.col("s") / F.col("n").cast("double")
    ssb = F.col("grp_sq") - sq
    ssw = F.col("ss") - F.col("grp_sq")
    return t.select(
        "k",
        "n",
        F.round((ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))), 4)
        .alias("w_stat"),
        F.round(ssb / 4e6, 4).alias("ss_between"),
        F.round(ssw / 4e6, 4).alias("ss_within"),
    )


# ---------------------------------------------------------------------------
# E246: Jarque-Bera normality test
# ---------------------------------------------------------------------------
# JB = n/6 * (S^2 + (K-3)^2/4) from the first four RAW moments on the
# milli grid — one partial-agg scan. The 3rd/4th power sums exceed
# BIGINT on a large store (vm^4 ~ 6e22 per term), so they sum in
# DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — the E233/ADVICE-r10
# overflow discipline applied from birth. Central moments derive from
# raw moments in doubles (closed forms of exact integers).

_JB_ORACLE = """
WITH v AS (
  SELECT CAST(ROUND(value * 1000, 0) AS BIGINT) AS vm FROM events
),
m AS (
  -- vm^4 exceeds BIGINT PER TERM (~6e22 at this grid): promote to
  -- HUGEINT before the final multiply; vm^3 (~1.2e17) still fits
  SELECT COUNT(*)::BIGINT AS n, SUM(vm) AS s1, SUM(vm * vm) AS s2,
         SUM(vm * vm * vm) AS s3,
         SUM((vm * vm)::HUGEINT * (vm * vm)) AS s4
  FROM v
),
c AS (
  SELECT n,
         CAST(s1 AS DOUBLE) / n AS m1,
         CAST(s2 AS DOUBLE) / n - POW(CAST(s1 AS DOUBLE) / n, 2) AS mu2,
         CAST(s3 AS DOUBLE) / n
           - 3 * (CAST(s2 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
           + 2 * POW(CAST(s1 AS DOUBLE) / n, 3) AS mu3,
         CAST(s4 AS DOUBLE) / n
           - 4 * (CAST(s3 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
           + 6 * (CAST(s2 AS DOUBLE) / n) * POW(CAST(s1 AS DOUBLE) / n, 2)
           - 3 * POW(CAST(s1 AS DOUBLE) / n, 4) AS mu4
  FROM m
)
SELECT n,
       ROUND(m1 / 1000.0, 4) AS mean,
       ROUND(mu3 / POW(mu2, 1.5), 4) AS skewness,
       ROUND(mu4 / (mu2 * mu2), 4) AS kurtosis,
       ROUND(n / 6.0 * (POW(mu3 / POW(mu2, 1.5), 2)
             + POW(mu4 / (mu2 * mu2) - 3, 2) / 4.0), 2) AS jb_stat
FROM c
"""


@register(
    "q_jarque_bera",
    oracle=_JB_ORACLE,
    doc="Jarque-Bera normality test (E246): skewness, kurtosis and JB "
    "over event value from the first four raw moments on the 1e3 grid "
    "in ONE partial-agg scan — 3rd/4th power sums in DECIMAL(38,0)/"
    "HUGEINT (BIGINT wraps at the 4th power; the E233 overflow "
    "discipline applied from birth); numpy-anchored in "
    "tests/test_frontier47.py",
)
def q_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        F.round(F.col("value") * 1000, 0).cast("long").alias("vm")
    )
    vm = F.col("vm")
    # per-term powers: vm^2 in long (safe), then DECIMAL for the 3rd/4th
    # (vm^3 ~ 1.2e17 fits a long per term but its SUM does not; vm^4
    # does not even fit per term) — promote before multiplying
    vm2 = vm * vm
    vmd = vm.cast("decimal(19,0)")
    m = v.agg(
        F.count("*").alias("n"),
        F.sum(vm).alias("s1"),
        F.sum(vm2.cast("decimal(38,0)")).alias("s2"),
        F.sum((vm2.cast("decimal(19,0)") * vmd).cast("decimal(38,0)"))
        .alias("s3"),
        F.sum(
            (vm2.cast("decimal(19,0)") * vm2.cast("decimal(19,0)"))
            .cast("decimal(38,0)")
        ).alias("s4"),
    )
    n = F.col("n").cast("double")
    m1 = F.col("s1").cast("double") / n
    m2r = F.col("s2").cast("double") / n
    m3r = F.col("s3").cast("double") / n
    m4r = F.col("s4").cast("double") / n
    mu2 = m2r - m1 * m1
    mu3 = m3r - 3 * m2r * m1 + 2 * m1 * m1 * m1
    mu4 = m4r - 4 * m3r * m1 + 6 * m2r * m1 * m1 - 3 * m1 * m1 * m1 * m1
    skew = mu3 / F.pow(mu2, 1.5)
    kurt = mu4 / (mu2 * mu2)
    return m.select(
        "n",
        F.round(m1 / 1000.0, 4).alias("mean"),
        F.round(skew, 4).alias("skewness"),
        F.round(kurt, 4).alias("kurtosis"),
        F.round(
            n / 6.0 * (skew * skew + (kurt - 3) * (kurt - 3) / 4.0), 2
        ).alias("jb_stat"),
    )


# ---------------------------------------------------------------------------
# E247: Poisson overdispersion (dispersion index) test
# ---------------------------------------------------------------------------
# Daily event counts per type: D = var/mean (1 under Poisson),
# chi2 = (n_days - 1) * D, and the one-sided normal z via the
# Wilson-Hilferty-style sqrt transform z = sqrt(2*chi2) -
# sqrt(2*df - 1). Counts are exact BIGINTs; per-type moments are exact
# integer sums over a days-sized frame.

_DISP_ORACLE = """
WITH daily AS (
  SELECT event_type, ts::DATE AS d, COUNT(*)::BIGINT AS c
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT event_type, COUNT(*)::BIGINT AS n_days, SUM(c)::BIGINT AS s,
         SUM(c * c)::BIGINT AS ss
  FROM daily GROUP BY event_type
)
SELECT event_type, n_days, s AS n_events,
       ROUND(CAST(s AS DOUBLE) / n_days, 4) AS mean_daily,
       ROUND((ss - CAST(s AS DOUBLE) * s / n_days) / (n_days - 1)
             / (CAST(s AS DOUBLE) / n_days), 4) AS dispersion,
       ROUND((ss - CAST(s AS DOUBLE) * s / n_days)
             / (CAST(s AS DOUBLE) / n_days), 4) AS chi2,
       ROUND(SQRT(2.0 * (ss - CAST(s AS DOUBLE) * s / n_days)
                  / (CAST(s AS DOUBLE) / n_days))
             - SQRT(2.0 * (n_days - 1) - 1), 4) AS z_stat
FROM m
WHERE n_days > 1 AND s > 0
ORDER BY event_type
"""


@register(
    "q_poisson_dispersion",
    oracle=_DISP_ORACLE,
    doc="Poisson overdispersion test (E247): dispersion index of daily "
    "event counts per type (variance/mean, 1 under Poisson), the "
    "equidispersion check behind Poisson rate models — one per-day "
    "count rollup then exact integer moments on the days-sized frame; "
    "chi2 + sqrt-transform z; numpy-anchored in "
    "tests/test_frontier47.py",
)
def q_poisson_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count("*").alias("c"))
    m = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    ).filter((F.col("n_days") > 1) & (F.col("s") > 0))
    sd = F.col("s").cast("double")
    nd = F.col("n_days").cast("double")
    mean = sd / nd
    sse = F.col("ss") - sd * F.col("s") / nd
    chi2 = sse / mean
    return m.select(
        "event_type",
        "n_days",
        F.col("s").alias("n_events"),
        F.round(mean, 4).alias("mean_daily"),
        F.round(sse / (nd - 1) / mean, 4).alias("dispersion"),
        F.round(chi2, 4).alias("chi2"),
        F.round(
            F.sqrt(2.0 * chi2) - F.sqrt(2.0 * (nd - 1) - 1), 4
        ).alias("z_stat"),
    ).orderBy("event_type")
