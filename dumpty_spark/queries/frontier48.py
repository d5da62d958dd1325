"""Round-11 engine extensions, part 3 (EXT E248-E250): the time-series
inference family — three concepts the temporal surface (Holt /
Holt-Winters / seasonal-naive / ACF / Bollinger / CUSUM / changepoint /
Theil-Sen) did not cover:

  E248 classical seasonal decomposition — additive trend/seasonal/
       remainder via centered 7-day MA + weekday means (the method
       Holt-Winters FITS a model for, done descriptively); pure
       windows + aggregations, so its oracle is Category A —
       independent by construction;
  E249 Granger causality (lag-1) — does yesterday's click volume help
       predict today's purchases beyond purchases' own history? The
       restricted-vs-unrestricted OLS F test, closed forms of exact
       daily-count moments;
  E250 Mann-Kendall trend test — the nonparametric trend TEST next to
       Theil-Sen's trend ESTIMATE: S from pairwise signs on the
       days-sized daily-mean frame, tie-corrected variance, z.

All heavy work is one per-day rollup; everything after runs on the
days-sized frame (<= ~1k rows at any SF). Counts are exact BIGINTs;
daily means are 6dp-quantized before any float sum (the portability
discipline)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E248: classical additive seasonal decomposition (weekly period)
# ---------------------------------------------------------------------------
# value_d = trend_d + seasonal_{dow(d)} + remainder_d, with trend the
# CENTERED 7-day moving average (full windows only), seasonal the
# detrended weekday means recentered to sum 0, remainder what's left.
# Output: one row per weekday (seasonal index + diagnostics) plus the
# variance-explained split — weekday-sized, stable under any SF. The
# oracle is plain window/agg SQL executed by DuckDB's own engine:
# Category A, no shared derivation.

_SD_ORACLE = """
WITH daily AS (
  SELECT date_diff('day', (SELECT MIN(ts::DATE) FROM events),
                   ts::DATE)::BIGINT AS d,
         ROUND(SUM(ROUND(value * 1000)::BIGINT) / COUNT(*) / 1000.0, 6)
           AS m
  FROM events GROUP BY 1
),
tr AS (
  SELECT d, m,
         CASE WHEN COUNT(*) OVER w = 7
              THEN AVG(m) OVER w END AS trend
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
det AS (SELECT d, m, trend, m - trend AS dt FROM tr),
sea AS (
  SELECT d % 7 AS dow, AVG(dt) AS s_raw, COUNT(dt)::BIGINT AS n_days
  FROM det WHERE dt IS NOT NULL GROUP BY 1
),
ctr AS (SELECT AVG(s_raw) AS c FROM sea),
s AS (
  SELECT sea.dow, sea.n_days, sea.s_raw - ctr.c AS seasonal
  FROM sea, ctr
),
rem AS (
  SELECT VAR_POP(det.dt - s.seasonal) AS var_rem,
         VAR_POP(det.m) AS var_total
  FROM det JOIN s ON s.dow = det.d % 7
  WHERE det.dt IS NOT NULL
)
SELECT s.dow, s.n_days,
       ROUND(s.seasonal, 4) AS seasonal,
       ROUND(rem.var_rem, 4) AS var_remainder,
       ROUND(rem.var_total, 4) AS var_total,
       ROUND(1 - rem.var_rem / rem.var_total, 4) AS frac_explained
FROM s, rem
ORDER BY s.dow
"""


@register(
    "q_seasonal_decompose",
    oracle=_SD_ORACLE,
    doc="classical additive seasonal decomposition (E248): daily mean "
    "value -> centered 7-day MA trend (full windows only) + recentered "
    "weekday seasonal indices + remainder, with the variance-explained "
    "split — one per-day rollup, then windows/aggs on the days-sized "
    "frame; weekday-sized output. Pure declarative windows on both "
    "engines (Category A oracle)",
)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t0 = ev.agg(F.min(F.col("ts").cast("date")).alias("d")).first()["d"]
    daily = ev.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit(t0)).cast("long")
        .alias("d")
    ).agg(
        F.round(
            F.sum(F.round(F.col("value") * 1000, 0).cast("long"))
            / F.count("*") / 1000.0,
            6,
        ).alias("m")
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    tr = daily.select(
        "d",
        "m",
        F.when(F.count("m").over(w) == 7, F.avg("m").over(w)).alias("trend"),
    )
    det = tr.select(
        "d", "m", (F.col("m") - F.col("trend")).alias("dt")
    ).localCheckpoint()
    sea = (
        det.filter(F.col("dt").isNotNull())
        .groupBy((F.col("d") % 7).alias("dow"))
        .agg(F.avg("dt").alias("s_raw"), F.count("dt").alias("n_days"))
    )
    ctr = sea.agg(F.avg("s_raw").alias("c"))
    s = sea.crossJoin(F.broadcast(ctr)).select(
        "dow", "n_days", (F.col("s_raw") - F.col("c")).alias("seasonal")
    )
    rem = (
        det.filter(F.col("dt").isNotNull())
        .join(F.broadcast(s), det["d"] % 7 == s["dow"])
        .agg(
            F.var_pop(F.col("dt") - F.col("seasonal")).alias("var_rem"),
            F.var_pop("m").alias("var_total"),
        )
    )
    return (
        s.crossJoin(F.broadcast(rem))
        .select(
            "dow",
            "n_days",
            F.round("seasonal", 4).alias("seasonal"),
            F.round("var_rem", 4).alias("var_remainder"),
            F.round("var_total", 4).alias("var_total"),
            F.round(1 - F.col("var_rem") / F.col("var_total"), 4)
            .alias("frac_explained"),
        )
        .orderBy("dow")
    )


# ---------------------------------------------------------------------------
# E249: Granger causality, lag 1
# ---------------------------------------------------------------------------
# Restricted:   p_t = a + b * p_{t-1}
# Unrestricted: p_t = a + b * p_{t-1} + c * x_{t-1}   (x = clicks)
# F = (SSE_r - SSE_u) / (SSE_u / (n - 3)).  Daily counts are exact
# BIGINTs; both regressions are closed forms of the 9 cross-moments of
# (p_t, p_lag, x_lag) — one LAG window + one moment scan on the
# days-sized frame. The 2-predictor solve is the same Cramer shape as
# E103's multivariate OLS.

_GR_ORACLE = """
WITH cal AS (
  SELECT MIN(ts::DATE) AS d0, date_diff('day', MIN(ts::DATE),
         MAX(ts::DATE))::BIGINT AS span
  FROM events
),
days AS (
  SELECT UNNEST(generate_series(0, (SELECT span FROM cal))) AS d
),
cnt AS (
  SELECT date_diff('day', (SELECT d0 FROM cal), ts::DATE)::BIGINT AS d,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
           AS p,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
           AS x
  FROM events GROUP BY 1
),
grid AS (
  SELECT days.d, COALESCE(cnt.p, 0) AS p, COALESCE(cnt.x, 0) AS x
  FROM days LEFT JOIN cnt ON cnt.d = days.d
),
lagged AS (
  SELECT d, p::DOUBLE AS y,
         LAG(p) OVER (ORDER BY d)::DOUBLE AS pl,
         LAG(x) OVER (ORDER BY d)::DOUBLE AS xl
  FROM grid
),
m AS (
  SELECT COUNT(*)::BIGINT AS n, SUM(y) AS sy, SUM(pl) AS s1,
         SUM(xl) AS s2, SUM(pl * pl) AS s11, SUM(pl * xl) AS s12,
         SUM(xl * xl) AS s22, SUM(y * pl) AS sy1, SUM(y * xl) AS sy2,
         SUM(y * y) AS syy
  FROM lagged WHERE pl IS NOT NULL
),
r AS (
  SELECT n, syy, sy,
         (n * sy1 - s1 * sy) / (n * s11 - s1 * s1) AS br
  FROM m
),
rsse AS (
  SELECT m.n,
         m.syy - m.sy * m.sy / m.n
           - r.br * (m.sy1 - m.s1 * m.sy / m.n) AS sse_r
  FROM m, r
),
u AS (
  SELECT m.n,
         (m.s11 - m.s1 * m.s1 / m.n) AS a11,
         (m.s12 - m.s1 * m.s2 / m.n) AS a12,
         (m.s22 - m.s2 * m.s2 / m.n) AS a22,
         (m.sy1 - m.s1 * m.sy / m.n) AS b1,
         (m.sy2 - m.s2 * m.sy / m.n) AS b2,
         (m.syy - m.sy * m.sy / m.n) AS sst
  FROM m
),
usol AS (
  SELECT n, sst,
         (b1 * a22 - b2 * a12) / (a11 * a22 - a12 * a12) AS bu,
         (b2 * a11 - b1 * a12) / (a11 * a22 - a12 * a12) AS cu,
         b1, b2
  FROM u
),
fin AS (
  SELECT usol.n, rsse.sse_r,
         usol.sst - usol.bu * usol.b1 - usol.cu * usol.b2 AS sse_u
  FROM usol, rsse
)
SELECT n,
       ROUND(sse_r, 4) AS sse_restricted,
       ROUND(sse_u, 4) AS sse_unrestricted,
       ROUND((sse_r - sse_u) / (sse_u / (n - 3)), 4) AS f_stat
FROM fin
"""


@register(
    "q_granger_lag1",
    oracle=_GR_ORACLE,
    doc="Granger causality lag-1 (E249): does yesterday's click count "
    "help predict today's purchases beyond purchases' own history? "
    "Calendar-densified daily counts (missing days are real zeros), one "
    "LAG window + one 10-moment scan on the days-sized frame, "
    "restricted (AR1) vs unrestricted (AR1 + clicks) OLS via "
    "centered-moment Cramer solves, F = (SSE_r - SSE_u)/(SSE_u/(n-3)); "
    "numpy-lstsq-anchored in tests/test_frontier48.py",
)
def q_granger_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.datediff(
            F.max(F.col("ts").cast("date")), F.min(F.col("ts").cast("date"))
        ).alias("span"),
    ).first()
    d0, span = bounds["d0"], bounds["span"]
    days = spark.range(0, span + 1).select(F.col("id").alias("d"))
    cnt = ev.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit(d0)).cast("long")
        .alias("d")
    ).agg(
        F.sum((F.col("event_type") == "purchase").cast("int")).cast("long")
        .alias("p"),
        F.sum((F.col("event_type") == "click").cast("int")).cast("long")
        .alias("x"),
    )
    grid = days.join(cnt, "d", "left").select(
        "d",
        F.coalesce("p", F.lit(0)).alias("p"),
        F.coalesce("x", F.lit(0)).alias("x"),
    )
    wo = Window.orderBy("d")
    lagged = grid.select(
        F.col("p").cast("double").alias("y"),
        F.lag("p").over(wo).cast("double").alias("pl"),
        F.lag("x").over(wo).cast("double").alias("xl"),
    ).filter(F.col("pl").isNotNull())
    m = lagged.agg(
        F.count("*").alias("n"),
        F.sum("y").alias("sy"),
        F.sum("pl").alias("s1"),
        F.sum("xl").alias("s2"),
        F.sum(F.col("pl") * F.col("pl")).alias("s11"),
        F.sum(F.col("pl") * F.col("xl")).alias("s12"),
        F.sum(F.col("xl") * F.col("xl")).alias("s22"),
        F.sum(F.col("y") * F.col("pl")).alias("sy1"),
        F.sum(F.col("y") * F.col("xl")).alias("sy2"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).first()
    n = float(m["n"])
    a11 = m["s11"] - m["s1"] * m["s1"] / n
    a12 = m["s12"] - m["s1"] * m["s2"] / n
    a22 = m["s22"] - m["s2"] * m["s2"] / n
    b1 = m["sy1"] - m["s1"] * m["sy"] / n
    b2 = m["sy2"] - m["s2"] * m["sy"] / n
    sst = m["syy"] - m["sy"] * m["sy"] / n
    br = b1 / a11
    sse_r = sst - br * b1
    det = a11 * a22 - a12 * a12
    bu = (b1 * a22 - b2 * a12) / det
    cu = (b2 * a11 - b1 * a12) / det
    sse_u = sst - bu * b1 - cu * b2
    f = (sse_r - sse_u) / (sse_u / (n - 3))
    return spark.createDataFrame(
        [(m["n"], round(sse_r, 4), round(sse_u, 4), round(f, 4))],
        "n long, sse_restricted double, sse_unrestricted double, "
        "f_stat double",
    )


# ---------------------------------------------------------------------------
# E250: Mann-Kendall trend test
# ---------------------------------------------------------------------------
# The nonparametric trend TEST beside Theil-Sen's ESTIMATE: on the
# daily-mean series, S = sum over i<j of sign(m_j - m_i) (an exact
# integer from the days-sized pair join — the same bounded-quadratic
# shape as q_kendall_daily), tie-corrected Var(S), continuity-corrected
# z via the shared A&S p. Cross-pin: sign(S) must agree with the
# Theil-Sen slope's sign on the same series (tests).

_MK_ORACLE_TMPL = """
WITH daily AS (
  SELECT date_diff('day', (SELECT MIN(ts::DATE) FROM events),
                   ts::DATE)::BIGINT AS d,
         SUM(ROUND(value * 1000)::BIGINT)::BIGINT AS sm,
         COUNT(*)::BIGINT AS nd
  FROM events GROUP BY 1
),
md AS (SELECT d, ROUND(sm / nd / 1000.0, 6) AS m FROM daily),
s AS (
  SELECT SUM(CASE WHEN b.m > a.m THEN 1
                  WHEN b.m < a.m THEN -1 ELSE 0 END)::BIGINT AS s,
         COUNT(*)::BIGINT AS n_pairs
  FROM md a JOIN md b ON b.d > a.d
),
n AS (SELECT COUNT(*)::BIGINT AS n FROM md),
ties AS (
  SELECT COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0)::BIGINT AS tt
  FROM (SELECT COUNT(*)::BIGINT AS t FROM md GROUP BY m HAVING COUNT(*) > 1)
),
v AS (
  SELECT n.n, s.s, s.n_pairs,
         (n.n * (n.n - 1) * (2 * n.n + 5) - ties.tt) / 18.0 AS var_s
  FROM n, s, ties
),
z AS (
  SELECT n, s, n_pairs, var_s,
         -- p is computed from the ROUNDED z on both engines
         ROUND(CASE WHEN s > 0 THEN (s - 1) / SQRT(var_s)
                    WHEN s < 0 THEN (s + 1) / SQRT(var_s)
                    ELSE 0.0 END, 4) AS zs
  FROM v
)
SELECT n AS n_days, s AS s_stat, n_pairs,
       ROUND(var_s, 2) AS var_s,
       zs AS z_stat,
       ROUND({p}, 6) AS p_value
FROM z
"""


def _mk_oracle() -> str:
    from dumpty_spark.queries.relational8 import _PVAL_SQL, _TINV_SQL

    return _MK_ORACLE_TMPL.format(
        p=_PVAL_SQL.format(z="zs", t=_TINV_SQL.format(z="zs"))
    )


@register(
    "q_mann_kendall",
    oracle=_mk_oracle(),
    doc="Mann-Kendall trend test (E250): S from pairwise signs on the "
    "daily-mean series (days-sized pair join, exact integer), "
    "tie-corrected Var(S), continuity-corrected z, two-sided p via the "
    "shared A&S polynomial — the nonparametric trend TEST beside "
    "Theil-Sen's slope ESTIMATE; numpy-anchored + sign-agreement "
    "cross-pin in tests/test_frontier48.py",
)
def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.queries.relational8 import _pval2

    ev = load_table(spark, sf_dir, "events")
    t0 = ev.agg(F.min(F.col("ts").cast("date")).alias("d")).first()["d"]
    md = ev.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit(t0)).cast("long")
        .alias("d")
    ).agg(
        F.round(
            F.sum(F.round(F.col("value") * 1000, 0).cast("long"))
            / F.count("*") / 1000.0,
            6,
        ).alias("m")
    ).localCheckpoint()
    a = md.select(F.col("d").alias("da"), F.col("m").alias("ma"))
    b = md.select(F.col("d").alias("db"), F.col("m").alias("mb"))
    s = a.join(b, F.col("db") > F.col("da")).agg(
        F.sum(
            F.when(F.col("mb") > F.col("ma"), 1)
            .when(F.col("mb") < F.col("ma"), -1)
            .otherwise(0)
        ).cast("long").alias("s"),
        F.count("*").alias("n_pairs"),
    ).first()
    nn = md.count()
    tt = (
        md.groupBy("m").agg(F.count("*").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            ).alias("tt")
        )
        .first()["tt"]
    )
    var_s = (nn * (nn - 1) * (2 * nn + 5) - tt) / 18.0
    sv = s["s"]
    if sv > 0:
        zs = (sv - 1) / var_s**0.5
    elif sv < 0:
        zs = (sv + 1) / var_s**0.5
    else:
        zs = 0.0
    out = spark.createDataFrame(
        [(nn, sv, s["n_pairs"], round(var_s, 2), round(zs, 4))],
        "n_days long, s_stat long, n_pairs long, var_s double, "
        "z_stat double",
    )
    return out.select(
        "n_days", "s_stat", "n_pairs", "var_s", "z_stat",
        F.round(_pval2(F.col("z_stat")), 6).alias("p_value"),
    )
