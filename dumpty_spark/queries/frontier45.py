"""Round-10 engine extensions, second batch (EXT E236-E237): the two
survival-analysis operators next to E76's Kaplan-Meier — the
Nelson-Aalen cumulative hazard (the additive estimator KM's
product-limit form approximates) and the two-group log-rank test (the
standard "do these cohorts churn differently?" readout).

Both run on E76's spell construction (purchase -> next purchase per
user, last spell right-censored at corpus end): ONE users-sized window
pass, then everything downstream lives on the death-time table — whose
row count is bounded by the corpus day SPAN, not its size, so the
statistics are metadata work at any scale.

Portability disciplines: per-death-time float terms (d/n hazard
increments, O-E and variance terms) are integerized to micro-units per
term (one division + one round each) and summed as BIGINTs; exp/sqrt
appear once in final expressions whose 4dp rounding absorbs libm ulps.
Independent anchors in tests/test_frontier45.py: numpy cumsum
recomputation, the 1-x <= e^-x dominance of the Fleming-Harrington
survival over KM, the log-rank O-E antisymmetry identity, and a full
numpy recomputation of the chi-square.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E236: Nelson-Aalen cumulative hazard (+ Fleming-Harrington survival)
# ---------------------------------------------------------------------------
# H(t) = sum_{death times d <= t} d_t / n_t — the additive counterpart
# of KM's product: where KM multiplies survival factors, NA accumulates
# hazard mass, is defined even when a risk set is wiped out, and
# exp(-H) (Fleming-Harrington) dominates the KM curve pointwise
# (1 - x <= e^-x). Per-time hazard increments are exact BIGINT micro
# ratios summed by a window over the death-time table.

_NA_ORACLE = """
WITH bounds AS (SELECT MAX(ts) AS t_end FROM events),
p AS (
  SELECT user_id, ts,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events WHERE event_type = 'purchase'
),
life AS (
  SELECT date_diff('day', ts, COALESCE(nxt, (SELECT t_end FROM bounds)))
           AS dur,
         (nxt IS NULL) AS censored
  FROM p
),
tab AS (
  SELECT dur,
         SUM(CASE WHEN NOT censored THEN 1 ELSE 0 END)::BIGINT AS d,
         COUNT(*)::BIGINT AS x
  FROM life GROUP BY dur
),
risk AS (
  SELECT dur, d,
         SUM(x) OVER (ORDER BY dur DESC ROWS UNBOUNDED PRECEDING)::BIGINT
           AS n
  FROM tab
),
haz AS (
  SELECT dur, d, n,
         CAST(ROUND(1000000.0 * d / n, 0) AS BIGINT) AS h_micro
  FROM risk WHERE d > 0
)
SELECT dur AS duration_days, n AS n_at_risk, d AS n_events,
       ROUND(SUM(h_micro) OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING)
             / 1000000.0, 6) AS cum_hazard,
       ROUND(EXP(-(SUM(h_micro) OVER (ORDER BY dur
                                      ROWS UNBOUNDED PRECEDING))
                 / 1000000.0), 4) AS fh_survival
FROM haz
ORDER BY dur
"""


@register(
    "q_nelson_aalen",
    oracle=_NA_ORACLE,
    doc="Nelson-Aalen cumulative hazard (E236): additive hazard mass "
    "H(t) = sum d/n over E76's censored purchase spells, plus the "
    "Fleming-Harrington survival exp(-H) that pointwise dominates KM "
    "(1-x <= e^-x — pinned in tests); per-time increments are exact "
    "micro-integer ratios summed as BIGINTs over the day-span-bounded "
    "death-time table — metadata work at any corpus scale",
)
def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t_end = ev.agg(F.max("ts").alias("t")).first()["t"]
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lead("ts").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("nxt"),
    )
    life = p.select(
        F.datediff(
            F.coalesce(F.col("nxt"), F.lit(t_end)).cast("date"),
            F.col("ts").cast("date"),
        ).alias("dur"),
        F.col("nxt").isNull().alias("censored"),
    )
    tab = life.groupBy("dur").agg(
        F.sum(F.when(~F.col("censored"), 1).otherwise(0)).cast("long").alias("d"),
        F.count("*").alias("x"),
    )
    w_risk = Window.orderBy(F.desc("dur")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = tab.select(
        "dur", "d", F.sum("x").over(w_risk).cast("long").alias("n")
    )
    haz = risk.filter(F.col("d") > 0).select(
        "dur",
        "d",
        "n",
        F.round(1e6 * F.col("d") / F.col("n"), 0).cast("long").alias("h_micro"),
    )
    w_cum = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    cum = F.sum("h_micro").over(w_cum)
    return haz.select(
        F.col("dur").alias("duration_days"),
        F.col("n").alias("n_at_risk"),
        F.col("d").alias("n_events"),
        F.round(cum / 1e6, 6).alias("cum_hazard"),
        F.round(F.exp(-cum / 1e6), 4).alias("fh_survival"),
    ).orderBy("duration_days")


# ---------------------------------------------------------------------------
# E237: two-group log-rank test over the spell table
# ---------------------------------------------------------------------------
# "Do weekend-started spells churn at a different rate?" — the standard
# survival comparison: at each death time, group 1's observed deaths
# vs its hypergeometric expectation e1 = d*n1/n, variance
# v = d*(n1/n)*(1-n1/n)*(n-d)/(n-1), and chi2 = (sum(O-E))^2 / sum(V)
# (Mantel-Haenszel/log-rank). O-E and V are integerized to micro-units
# per death time and summed as BIGINTs; the O-E antisymmetry (group 0's
# sum is the exact negative) and a numpy recomputation anchor the
# formula. The death-time table is day-span-bounded: metadata work.

_LOGRANK_ORACLE = """
WITH bounds AS (SELECT MAX(ts) AS t_end FROM events),
p AS (
  SELECT user_id, ts,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events WHERE event_type = 'purchase'
),
life AS (
  SELECT date_diff('day', ts, COALESCE(nxt, (SELECT t_end FROM bounds)))
           AS dur,
         (nxt IS NULL) AS censored,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS grp
  FROM p
),
tab AS (
  SELECT dur, grp,
         SUM(CASE WHEN NOT censored THEN 1 ELSE 0 END)::BIGINT AS d,
         COUNT(*)::BIGINT AS x
  FROM life GROUP BY dur, grp
),
-- risk sets must be DENSIFIED to every death time: a per-group
-- cumulative window only has rows at durations where THAT group has a
-- spell, silently zeroing n_g at the other group's death times (this
-- module's own anchor test caught exactly that — the oracle replayed
-- the bug and hash-matched it). The theta join below evaluates
-- n_g(t) = #spells in g with dur >= t at ALL death times; both tables
-- are day-span-bounded, so the join is metadata work.
dt AS (SELECT dur FROM tab GROUP BY dur HAVING SUM(d) > 0),
risk AS (
  SELECT dt.dur, t.grp,
         SUM(t.x)::BIGINT AS n,
         SUM(CASE WHEN t.dur = dt.dur THEN t.d ELSE 0 END)::BIGINT AS d
  FROM dt JOIN tab t ON t.dur >= dt.dur
  GROUP BY dt.dur, t.grp
),
wide AS (
  SELECT dur,
         SUM(CASE WHEN grp = 1 THEN d ELSE 0 END)::BIGINT AS d1,
         SUM(d)::BIGINT AS d,
         SUM(CASE WHEN grp = 1 THEN n ELSE 0 END)::BIGINT AS n1,
         SUM(n)::BIGINT AS n
  FROM risk GROUP BY dur
),
terms AS (
  SELECT dur, d1, d, n1, n,
         CAST(ROUND(1000000.0 * (d1 - d * n1 / CAST(n AS DOUBLE)), 0)
              AS BIGINT) AS oe_micro,
         CASE WHEN n > 1 THEN
           CAST(ROUND(1000000.0 * d * (n1 / CAST(n AS DOUBLE))
                      * (1.0 - n1 / CAST(n AS DOUBLE))
                      * (n - d) / (n - 1.0), 0) AS BIGINT)
         ELSE 0 END AS v_micro
  FROM wide WHERE d > 0
),
agg AS (
  SELECT COUNT(*)::BIGINT AS n_death_times,
         SUM(oe_micro)::BIGINT AS oe_micro, SUM(v_micro)::BIGINT AS v_micro
  FROM terms
),
grp_tot AS (
  SELECT SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END)::BIGINT AS n_weekend,
         SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END)::BIGINT AS n_weekday,
         SUM(CASE WHEN grp = 1 AND NOT censored THEN 1 ELSE 0 END)::BIGINT
           AS deaths_weekend,
         SUM(CASE WHEN grp = 0 AND NOT censored THEN 1 ELSE 0 END)::BIGINT
           AS deaths_weekday
  FROM life
)
SELECT g.n_weekend, g.n_weekday, g.deaths_weekend, g.deaths_weekday,
       a.n_death_times,
       ROUND(a.oe_micro / 1000000.0, 6) AS observed_minus_expected,
       ROUND(a.v_micro / 1000000.0, 6) AS variance,
       ROUND(CAST(a.oe_micro AS DOUBLE) * a.oe_micro
             / (1000000.0 * a.v_micro), 4) AS logrank_chi2
FROM agg a, grp_tot g
"""


@register(
    "q_logrank_test",
    oracle=_LOGRANK_ORACLE,
    doc="two-group log-rank test (E237): weekend- vs weekday-started "
    "purchase spells compared by the Mantel-Haenszel statistic — per "
    "death time O-E = d1 - d*n1/n and hypergeometric variance, "
    "micro-integerized per term and summed as BIGINTs; chi2 one closed "
    "form; the O-E antisymmetry identity and a numpy recomputation "
    "anchor the formula (tests/test_frontier45.py); death-time table "
    "day-span-bounded — metadata work at any scale",
)
def q_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t_end = ev.agg(F.max("ts").alias("t")).first()["t"]
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lead("ts").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("nxt"),
    )
    # Spark dayofweek(): 1=Sunday..7=Saturday; DuckDB dayofweek():
    # 0=Sunday..6=Saturday — weekend is {1,7} here, {0,6} there
    life = p.select(
        F.datediff(
            F.coalesce(F.col("nxt"), F.lit(t_end)).cast("date"),
            F.col("ts").cast("date"),
        ).alias("dur"),
        F.col("nxt").isNull().alias("censored"),
        F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0).alias("grp"),
    ).localCheckpoint()  # one spell pass feeds terms + group totals
    tab = life.groupBy("dur", "grp").agg(
        F.sum(F.when(~F.col("censored"), 1).otherwise(0)).cast("long").alias("d"),
        F.count("*").alias("x"),
    ).localCheckpoint()  # day-span-bounded; reused by dt + the theta join
    # densified risk sets (see the oracle comment): n_g(t) evaluated at
    # ALL death times via a theta join of two day-span-bounded frames —
    # a per-group cumulative window would silently zero n_g at the other
    # group's death times (caught by this module's own anchor test)
    dt = (
        tab.groupBy("dur")
        .agg(F.sum("d").alias("_d"))
        .filter(F.col("_d") > 0)
        .select(F.col("dur").alias("_t"))
    )
    t2 = tab.select(
        F.col("dur").alias("_dur"), "grp", F.col("d").alias("_dd"), "x"
    )
    risk = (
        F.broadcast(dt)
        .join(t2, F.col("_dur") >= F.col("_t"))
        .groupBy(F.col("_t").alias("dur"), "grp")
        .agg(
            F.sum("x").cast("long").alias("n"),
            F.sum(
                F.when(F.col("_dur") == F.col("_t"), F.col("_dd")).otherwise(0)
            )
            .cast("long")
            .alias("d"),
        )
    )
    wide = risk.groupBy("dur").agg(
        F.sum(F.when(F.col("grp") == 1, F.col("d")).otherwise(0))
        .cast("long")
        .alias("d1"),
        F.sum("d").cast("long").alias("d"),
        F.sum(F.when(F.col("grp") == 1, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum("n").cast("long").alias("n"),
    )
    nd = F.col("n").cast("double")
    terms = wide.filter(F.col("d") > 0).select(
        F.round(1e6 * (F.col("d1") - F.col("d") * F.col("n1") / nd), 0)
        .cast("long")
        .alias("oe_micro"),
        F.when(
            F.col("n") > 1,
            F.round(
                1e6
                * F.col("d")
                * (F.col("n1") / nd)
                * (1.0 - F.col("n1") / nd)
                * (F.col("n") - F.col("d"))
                / (F.col("n") - 1.0),
                0,
            ).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("v_micro"),
    )
    agg = terms.agg(
        F.count("*").alias("n_death_times"),
        F.sum("oe_micro").alias("oe_micro"),
        F.sum("v_micro").alias("v_micro"),
    )
    grp_tot = life.agg(
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_weekend"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_weekday"),
        F.sum(F.when((F.col("grp") == 1) & ~F.col("censored"), 1).otherwise(0))
        .cast("long")
        .alias("deaths_weekend"),
        F.sum(F.when((F.col("grp") == 0) & ~F.col("censored"), 1).otherwise(0))
        .cast("long")
        .alias("deaths_weekday"),
    )
    return grp_tot.crossJoin(F.broadcast(agg)).select(
        "n_weekend",
        "n_weekday",
        "deaths_weekend",
        "deaths_weekday",
        "n_death_times",
        F.round(F.col("oe_micro") / 1e6, 6).alias("observed_minus_expected"),
        F.round(F.col("v_micro") / 1e6, 6).alias("variance"),
        F.round(
            F.col("oe_micro").cast("double")
            * F.col("oe_micro")
            / (1e6 * F.col("v_micro")),
            4,
        ).alias("logrank_chi2"),
    )


# ---------------------------------------------------------------------------
# E238: discrete-time hazard regression (survival logistic, 3-param IRLS)
# ---------------------------------------------------------------------------
# The REGRESSION the survival family lacks: KM/NA/log-rank describe and
# compare, this one MODELS — the discrete-time proportional-odds
# analogue of Cox: each spell expands to person-period rows (one row
# per day survived; y=1 on the terminal day of uncensored spells), and
# logit h(t) = a + b*weekend + c*ln(t+1) is fit by Newton/IRLS. exp(b)
# is the weekend discrete-time hazard (odds) ratio — the effect size
# the log-rank only tests. Spark-first: the expansion is one
# explode(sequence(0, dur)) over the spells (person-periods are
# sum(dur+1) rows — linear in spells x mean duration, each Newton step
# ONE nine-moment partial-agg scan), the 3x3 solve is driver-side
# Cramer closed forms; coefficients requantized 9dp per step (E143/
# E169 trajectory discipline) so both engines walk identical doubles.
# The oracle unrolls the identical steps; the independent anchor
# (tests/test_frontier45.py) checks the 3-component score equations
# vanish at the returned coefficients, the fit beats the best
# intercept-only model, and a from-scratch unquantized numpy Newton
# lands on the same point.

_DHR_STEPS = 6


def _dhr_pp_sql() -> str:
    return """
bounds AS (SELECT MAX(ts) AS t_end FROM events),
p AS (
  SELECT user_id, ts,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events WHERE event_type = 'purchase'
),
life AS (
  SELECT date_diff('day', ts, COALESCE(nxt, (SELECT t_end FROM bounds)))
           AS dur,
         (nxt IS NULL) AS censored,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS grp
  FROM p
),
pp AS (
  SELECT CASE WHEN t = dur AND NOT censored THEN 1.0 ELSE 0.0 END AS y,
         grp::DOUBLE AS g,
         ROUND(LN(t + 1.0), 6) AS z
  FROM life, UNNEST(generate_series(0, dur)) AS u(t)
)"""


def _dhr_oracle() -> str:
    ctes = ["WITH " + _dhr_pp_sql().strip(),
            "c0 AS (SELECT 0.0 AS a, 0.0 AS b, 0.0 AS c)"]
    for i in range(1, _DHR_STEPS + 1):
        pexp = f"1 / (1 + exp(-(c{i-1}.a + c{i-1}.b * g + c{i-1}.c * z)))"
        ctes.append(f"""m{i} AS (
  SELECT SUM(y - p) AS g0, SUM((y - p) * g) AS g1, SUM((y - p) * z) AS g2,
         SUM(p * (1 - p)) AS w00, SUM(p * (1 - p) * g) AS w01,
         SUM(p * (1 - p) * z) AS w02, SUM(p * (1 - p) * g * g) AS w11,
         SUM(p * (1 - p) * g * z) AS w12, SUM(p * (1 - p) * z * z) AS w22
  FROM (SELECT y, g, z, {pexp} AS p FROM pp, c{i-1})
)""")
        det = ("(w00 * (w11 * w22 - w12 * w12) - w01 * (w01 * w22 - w12 * w02)"
               " + w02 * (w01 * w12 - w11 * w02))")
        da = ("(g0 * (w11 * w22 - w12 * w12) - w01 * (g1 * w22 - w12 * g2)"
              " + w02 * (g1 * w12 - w11 * g2))")
        db = ("(w00 * (g1 * w22 - g2 * w12) - g0 * (w01 * w22 - w12 * w02)"
              " + w02 * (w01 * g2 - g1 * w02))")
        dc = ("(w00 * (w11 * g2 - w12 * g1) - w01 * (w01 * g2 - g1 * w02)"
              " + g0 * (w01 * w12 - w11 * w02))")
        ctes.append(f"""c{i} AS (
  SELECT ROUND(c{i-1}.a + {da} / {det}, 9) AS a,
         ROUND(c{i-1}.b + {db} / {det}, 9) AS b,
         ROUND(c{i-1}.c + {dc} / {det}, 9) AS c
  FROM m{i}, c{i-1}
)""")
    last = f"c{_DHR_STEPS}"
    ctes.append(f"""ll AS (
  SELECT -AVG(y * ln(p) + (1 - y) * ln(1 - p)) AS loss,
         COUNT(*)::BIGINT AS n_periods, SUM(y)::BIGINT AS n_events
  FROM (SELECT y, 1 / (1 + exp(-({last}.a + {last}.b * g + {last}.c * z)))
               AS p
        FROM pp, {last})
)""")
    return (",\n".join(ctes) + f"""
SELECT ROUND({last}.a, 6) AS coef_intercept,
       ROUND({last}.b, 6) AS coef_weekend,
       ROUND({last}.c, 6) AS coef_logtime,
       ROUND(EXP({last}.b), 4) AS weekend_odds_ratio,
       ROUND(ll.loss, 6) AS log_loss,
       ll.n_periods, ll.n_events
FROM {last}, ll""")


@register(
    "q_discrete_hazard_regression",
    oracle=_dhr_oracle(),
    doc="discrete-time hazard regression (E238): spells exploded to "
    "person-period rows (explode(sequence(0, dur)) — linear), logit "
    "h(t) = a + b*weekend + c*ln(t+1) fit by 6 Newton steps, each ONE "
    "nine-moment partial-agg scan + a driver-side 3x3 Cramer solve; "
    "9dp-requantized trajectory (E169 discipline), exp(b) the weekend "
    "hazard odds ratio — the effect size the log-rank only tests; "
    "score-equation + unquantized-numpy anchored",
)
def q_discrete_hazard_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t_end = ev.agg(F.max("ts").alias("t")).first()["t"]
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lead("ts").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("nxt"),
    )
    life = p.select(
        F.datediff(
            F.coalesce(F.col("nxt"), F.lit(t_end)).cast("date"),
            F.col("ts").cast("date"),
        ).alias("dur"),
        F.col("nxt").isNull().alias("censored"),
        F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0).alias("grp"),
    )
    pp = life.select(
        F.explode(F.sequence(F.lit(0), F.col("dur"))).alias("t"),
        "dur",
        "censored",
        "grp",
    ).select(
        F.when((F.col("t") == F.col("dur")) & ~F.col("censored"), 1.0)
        .otherwise(0.0)
        .alias("y"),
        F.col("grp").cast("double").alias("g"),
        F.round(F.log(F.col("t") + 1.0), 6).alias("z"),
    ).localCheckpoint()  # 7 scans (6 steps + loss) over the periods

    a = b = c = 0.0
    for _ in range(_DHR_STEPS):
        pcol = 1 / (1 + F.exp(-(F.lit(a) + F.lit(b) * F.col("g")
                                + F.lit(c) * F.col("z"))))
        w = pcol * (1 - pcol)
        m = pp.agg(
            F.sum(F.col("y") - pcol).alias("g0"),
            F.sum((F.col("y") - pcol) * F.col("g")).alias("g1"),
            F.sum((F.col("y") - pcol) * F.col("z")).alias("g2"),
            F.sum(w).alias("w00"),
            F.sum(w * F.col("g")).alias("w01"),
            F.sum(w * F.col("z")).alias("w02"),
            F.sum(w * F.col("g") * F.col("g")).alias("w11"),
            F.sum(w * F.col("g") * F.col("z")).alias("w12"),
            F.sum(w * F.col("z") * F.col("z")).alias("w22"),
        ).first()
        g0, g1, g2 = m["g0"], m["g1"], m["g2"]
        w00, w01, w02 = m["w00"], m["w01"], m["w02"]
        w11, w12, w22 = m["w11"], m["w12"], m["w22"]
        det = (w00 * (w11 * w22 - w12 * w12)
               - w01 * (w01 * w22 - w12 * w02)
               + w02 * (w01 * w12 - w11 * w02))
        da = (g0 * (w11 * w22 - w12 * w12)
              - w01 * (g1 * w22 - w12 * g2)
              + w02 * (g1 * w12 - w11 * g2))
        db = (w00 * (g1 * w22 - g2 * w12)
              - g0 * (w01 * w22 - w12 * w02)
              + w02 * (w01 * g2 - g1 * w02))
        dc = (w00 * (w11 * g2 - w12 * g1)
              - w01 * (w01 * g2 - g1 * w02)
              + g0 * (w01 * w12 - w11 * w02))
        a = round(a + da / det, 9)
        b = round(b + db / det, 9)
        c = round(c + dc / det, 9)
    pcol = 1 / (1 + F.exp(-(F.lit(a) + F.lit(b) * F.col("g")
                            + F.lit(c) * F.col("z"))))
    return pp.agg(
        F.lit(round(a, 6)).alias("coef_intercept"),
        F.lit(round(b, 6)).alias("coef_weekend"),
        F.lit(round(c, 6)).alias("coef_logtime"),
        F.lit(round(__import__("math").exp(b), 4)).alias("weekend_odds_ratio"),
        F.round(
            -F.avg(F.col("y") * F.log(pcol) + (1 - F.col("y")) * F.log(1 - pcol)),
            6,
        ).alias("log_loss"),
        F.count("*").alias("n_periods"),
        F.sum("y").cast("long").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# E239: Kruskal-Wallis H — k-group nonparametric location test
# ---------------------------------------------------------------------------
# The nonparametric sibling of E233's one-way ANOVA (and the k-group
# extension of E74's Mann-Whitney): does event value differ by type
# WITHOUT normality assumptions? Scale design: mid-ranks are NOT
# computed with a global row window (a single-partition WindowExec over
# the corpus — the exact bottleneck the E136 discipline bans) but from
# the DISTINCT-VALUE rollup: per value v, midrank(v) = cum_before(v) +
# (c_v + 1)/2, a values-sized frame; per-group rank sums come from a
# broadcast join of (group, value) counts onto that frame. Every rank
# addend is an exact multiple of 0.5 (and every partial sum < 2^52), so
# distributed double summation is EXACT and order-independent — no
# integerization needed. H and its tie correction are single closed
# forms; anchored by an independent numpy mid-rank reference whose
# 2-group case is itself cross-validated against the MWU reference via
# the exact H = z^2 identity (tests/test_frontier45.py).

_KW_ORACLE = """
WITH v2 AS (
  SELECT event_type, ROUND(value, 4) AS v FROM events
),
vc AS (
  SELECT v, COUNT(*)::BIGINT AS c FROM v2 GROUP BY v
),
rv AS (
  SELECT v, c,
         SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c
           + (c + 1) / 2.0 AS r
  FROM vc
),
gv AS (
  SELECT event_type, v, COUNT(*)::BIGINT AS cg FROM v2 GROUP BY 1, 2
),
grp AS (
  SELECT gv.event_type, SUM(gv.cg)::BIGINT AS n_g,
         SUM(gv.cg * rv.r) AS r_g
  FROM gv JOIN rv USING (v) GROUP BY gv.event_type
),
tot AS (
  SELECT COUNT(*)::BIGINT AS k, SUM(n_g)::BIGINT AS n,
         SUM(r_g * r_g / n_g) AS s
  FROM grp
),
ties AS (SELECT SUM(c * c * c - c)::BIGINT AS t3 FROM vc),
h AS (
  SELECT tot.k, tot.n,
         12.0 / (tot.n * (tot.n + 1.0)) * tot.s - 3.0 * (tot.n + 1.0) AS h0,
         1.0 - ties.t3 / (CAST(tot.n AS DOUBLE) * tot.n * tot.n - tot.n)
           AS corr
  FROM tot, ties
)
SELECT k, n, (k - 1)::BIGINT AS dof,
       ROUND(h0, 4) AS h_stat,
       ROUND(h0 / corr, 4) AS h_corrected,
       ROUND(h0 / corr / (n - 1), 6) AS epsilon_sq
FROM h
"""


@register(
    "q_kruskal_wallis",
    oracle=_KW_ORACLE,
    doc="Kruskal-Wallis H (E239): k-group nonparametric location test "
    "over event value by type — mid-ranks from the DISTINCT-VALUE "
    "rollup (values-sized frame; no global row window), per-group rank "
    "sums via one broadcast join (rank addends are exact multiples of "
    "0.5 -> distributed double sums are exact), tie-corrected H and "
    "epsilon-squared as single closed forms; numpy-anchored with the "
    "2-group H = z^2 MWU identity cross-validating the reference",
)
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v2 = ev.select("event_type", F.round("value", 4).alias("v"))
    vc = v2.groupBy("v").agg(F.count("*").alias("c"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    rv = vc.select(
        "v",
        "c",
        (F.sum("c").over(w) - F.col("c") + (F.col("c") + 1) / 2.0).alias("r"),
    )
    gv = v2.groupBy("event_type", "v").agg(F.count("*").alias("cg"))
    grp = (
        gv.join(F.broadcast(rv), "v")
        .groupBy("event_type")
        .agg(
            F.sum("cg").cast("long").alias("n_g"),
            F.sum(F.col("cg") * F.col("r")).alias("r_g"),
        )
    )
    tot = grp.agg(
        F.count("*").alias("k"),
        F.sum("n_g").alias("n"),
        F.sum(F.col("r_g") * F.col("r_g") / F.col("n_g")).alias("s"),
    )
    t3 = vc.agg(
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .cast("long")
        .alias("t3")
    )
    h0 = (
        12.0 / (F.col("n") * (F.col("n") + 1.0)) * F.col("s")
        - 3.0 * (F.col("n") + 1.0)
    )
    corr = 1.0 - F.col("t3") / (
        F.col("n").cast("double") * F.col("n") * F.col("n") - F.col("n")
    )
    return tot.crossJoin(F.broadcast(t3)).select(
        "k",
        "n",
        (F.col("k") - 1).cast("long").alias("dof"),
        F.round(h0, 4).alias("h_stat"),
        F.round(h0 / corr, 4).alias("h_corrected"),
        F.round(h0 / corr / (F.col("n") - 1), 6).alias("epsilon_sq"),
    )
