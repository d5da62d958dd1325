"""Round-6 engine extensions, seventh batch (EXT E159-E161): k-fold
out-of-fold regression evaluation, target-leakage screen, time-decay
attribution.

Same design rules as the rest of the E-series: single-pass partial-agg
moments wherever algebra allows (the OOF evaluator never materializes a
prediction row — fold-complement fits and fold errors both expand in
per-fold moments), portable md5 folds, exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dumpty_spark.operators.sampling import bucket_fraction, bucket_fraction_sql
from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E159: k-fold out-of-fold regression evaluation — pure moment algebra
# ---------------------------------------------------------------------------
# Cross-validated error WITHOUT a prediction pass: for OLS y ~ a + b·x,
# both the fold-complement fit (global moments minus fold moments) and
# the fold's sum of squared errors expand in the SAME five per-fold
# moments:
#   SSE_f = Syy - 2a·Sy - 2b·Sxy + 2ab·Sx + a²·n + b²·Sxx   (all _f)
# so the entire 5-fold CV is ONE moments scan + folds-sized arithmetic —
# at 100 TB, the difference between an evaluation job and a free
# afterthought. x is centered on a constant epoch-day offset for
# conditioning (the cancellation in SSE stays 1e-12-relative, absorbed
# by the 4dp output rounding). Folds are the portable md5 bucket.

_OOF_DAY0 = 19700  # constant centering offset (~2023-12-08), both engines

_OOF_ORACLE = f"""
WITH rows_ AS (
  SELECT o_totalprice AS y,
         (floor(epoch(o_orderdate))::BIGINT // 86400 - {_OOF_DAY0})::DOUBLE
           AS x,
         LEAST(FLOOR({bucket_fraction_sql(["o_orderkey"])} * 5), 4)::BIGINT
           AS fold
  FROM orders
),
fm AS (
  SELECT fold, COUNT(*)::DOUBLE AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
  FROM rows_ GROUP BY fold
),
g AS (
  SELECT SUM(n) AS n, SUM(sx) AS sx, SUM(sy) AS sy,
         SUM(sxx) AS sxx, SUM(sxy) AS sxy, SUM(syy) AS syy
  FROM fm
),
fit AS (
  SELECT f.fold, f.n AS n_f,
         (g.n - f.n) AS nc,
         ((g.n - f.n) * (g.sxy - f.sxy) - (g.sx - f.sx) * (g.sy - f.sy))
         / ((g.n - f.n) * (g.sxx - f.sxx) - (g.sx - f.sx) * (g.sx - f.sx))
           AS b,
         f.sx, f.sy, f.sxx, f.sxy, f.syy,
         g.sx AS gsx, g.sy AS gsy
  FROM fm f, g
),
ab AS (
  SELECT fold, n_f, b,
         ((gsy - sy) - b * (gsx - sx)) / nc AS a,
         sx, sy, sxx, sxy, syy
  FROM fit
),
err AS (
  SELECT fold, n_f, a, b,
         syy - 2 * a * sy - 2 * b * sxy + 2 * a * b * sx
             + a * a * n_f + b * b * sxx AS sse
  FROM ab
)
SELECT fold, n_f::BIGINT AS n,
       ROUND(a, 4) AS intercept,
       ROUND(b, 6) AS slope,
       ROUND(SQRT(sse / n_f), 4) AS oof_rmse,
       ROUND(SQRT(SUM(sse) OVER () / SUM(n_f) OVER ()), 4) AS pooled_rmse
FROM err
ORDER BY fold
"""


@register(
    "q_oof_regression_eval",
    oracle=_OOF_ORACLE,
    doc="k-fold out-of-fold regression eval (E159): 5-fold CV of OLS "
    "price~day from ONE moments scan — fold-complement fits AND fold "
    "SSEs both expand in the same five per-fold moments, so no "
    "prediction pass ever runs; md5 folds, per-fold and pooled OOF RMSE",
)
def q_oof_regression_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    x = (
        F.floor(F.col("o_orderdate").cast("timestamp").cast("double") / 86400)
        .cast("long")
        - _OOF_DAY0
    ).cast("double")
    rows = orders.select(
        F.col("o_totalprice").alias("y"),
        x.alias("x"),
        F.least(F.floor(bucket_fraction(["o_orderkey"]) * 5), F.lit(4))
        .cast("long")
        .alias("fold"),
    )
    fm = rows.groupBy("fold").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).localCheckpoint()  # folds-sized; global totals derive from it, so
    # the one moments scan is the plan's ONLY table read
    g = fm.agg(
        F.sum("n").alias("gn"),
        F.sum("sx").alias("gsx"),
        F.sum("sy").alias("gsy"),
        F.sum("sxx").alias("gsxx"),
        F.sum("sxy").alias("gsxy"),
        F.sum("syy").alias("gsyy"),
    )
    nc = F.col("gn") - F.col("n")
    b = (
        nc * (F.col("gsxy") - F.col("sxy"))
        - (F.col("gsx") - F.col("sx")) * (F.col("gsy") - F.col("sy"))
    ) / (
        nc * (F.col("gsxx") - F.col("sxx"))
        - (F.col("gsx") - F.col("sx")) * (F.col("gsx") - F.col("sx"))
    )
    ab = fm.crossJoin(F.broadcast(g)).select(
        "fold",
        F.col("n").alias("n_f"),
        b.alias("b"),
        "sx",
        "sy",
        "sxx",
        "sxy",
        "syy",
        (
            ((F.col("gsy") - F.col("sy")) - b * (F.col("gsx") - F.col("sx")))
            / nc
        ).alias("a"),
    )
    sse = (
        F.col("syy")
        - 2 * F.col("a") * F.col("sy")
        - 2 * F.col("b") * F.col("sxy")
        + 2 * F.col("a") * F.col("b") * F.col("sx")
        + F.col("a") * F.col("a") * F.col("n_f")
        + F.col("b") * F.col("b") * F.col("sxx")
    )
    w_all = Window.partitionBy()
    err = ab.select("fold", "n_f", "a", "b", sse.alias("sse"))
    return err.select(
        "fold",
        F.col("n_f").cast("long").alias("n"),
        F.round("a", 4).alias("intercept"),
        F.round("b", 6).alias("slope"),
        F.round(F.sqrt(F.col("sse") / F.col("n_f")), 4).alias("oof_rmse"),
        F.round(
            F.sqrt(F.sum("sse").over(w_all) / F.sum("n_f").over(w_all)), 4
        ).alias("pooled_rmse"),
    ).orderBy("fold")


# ---------------------------------------------------------------------------
# E160: target-leakage screen
# ---------------------------------------------------------------------------
# Before a quality classifier trains, every candidate feature gets the
# leakage screen: association with the target (Cramér's V over the
# feature-value x label contingency) plus the max per-value label
# purity — a feature that predicts the target too well IS the target
# wearing a costume. The fixture plants one: leak_code is a pure
# function of the label, and the screen must rank it first with V = 1.
# One contingency rollup per feature, all downstream value-table-sized.

_LEAK_ORACLE = """
WITH base AS (
  SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
         o_orderpriority AS f_priority,
         CAST(o_custkey % 7 AS VARCHAR) AS f_custmod,
         CAST(dayofweek(o_orderdate) AS VARCHAR) AS f_dow,
         CASE WHEN o_orderstatus = 'F' THEN 'X9' ELSE 'Z1' END AS leak_code
  FROM orders
),
melted AS (
  SELECT 'f_priority' AS feature, f_priority AS val, y FROM base
  UNION ALL SELECT 'f_custmod', f_custmod, y FROM base
  UNION ALL SELECT 'f_dow', f_dow, y FROM base
  UNION ALL SELECT 'leak_code', leak_code, y FROM base
),
ct AS (
  SELECT feature, val, y, COUNT(*)::DOUBLE AS n
  FROM melted GROUP BY feature, val, y
),
marg AS (
  SELECT feature, SUM(n) AS nt, COUNT(DISTINCT val)::BIGINT AS k
  FROM ct GROUP BY feature
),
rowm AS (SELECT feature, val, SUM(n) AS nv FROM ct GROUP BY feature, val),
colm AS (SELECT feature, y, SUM(n) AS ny FROM ct GROUP BY feature, y),
grid AS (
  -- the COMPLETE val x label grid: zero cells contribute (0-e)^2/e = e,
  -- and dropping them understates chi2 exactly when association is
  -- strongest (the planted leak has two structurally-empty cells)
  SELECT r.feature, r.val, cm.y, r.nv, cm.ny,
         COALESCE(c.n, 0) AS n
  FROM rowm r
  JOIN colm cm ON cm.feature = r.feature
  LEFT JOIN ct c ON c.feature = r.feature AND c.val = r.val AND c.y = cm.y
),
chi AS (
  SELECT g.feature,
         SUM((g.n - g.nv * g.ny / m.nt) * (g.n - g.nv * g.ny / m.nt)
             / (g.nv * g.ny / m.nt)) AS chi2
  FROM grid g JOIN marg m ON m.feature = g.feature
  GROUP BY g.feature
),
purity AS (
  SELECT feature, MAX(p) AS max_purity
  FROM (
    SELECT c.feature, c.val, MAX(c.n / r.nv) AS p
    FROM ct c JOIN rowm r ON r.feature = c.feature AND r.val = c.val
    GROUP BY c.feature, c.val
  ) GROUP BY feature
)
SELECT m.feature, m.k AS n_values,
       ROUND(CASE WHEN m.k > 1
                  THEN SQRT(ch.chi2 / (m.nt * LEAST(m.k - 1, 1)))
                  ELSE 0.0::DOUBLE END, 6) AS cramers_v,
       ROUND(p.max_purity, 6) AS max_value_purity,
       (CASE WHEN m.k > 1
             THEN SQRT(ch.chi2 / (m.nt * LEAST(m.k - 1, 1)))
             ELSE 0.0::DOUBLE END > 0.95) AS leak_flag
FROM marg m JOIN chi ch ON ch.feature = m.feature
JOIN purity p ON p.feature = m.feature
ORDER BY ROUND(CASE WHEN m.k > 1
                    THEN SQRT(ch.chi2 / (m.nt * LEAST(m.k - 1, 1)))
                    ELSE 0.0::DOUBLE END, 6) DESC, m.feature
"""


@register(
    "q_leakage_screen",
    oracle=_LEAK_ORACLE,
    doc="target-leakage screen (E160): per candidate feature, Cramér's V "
    "against the binary target + max per-value label purity + a leak "
    "flag at V>0.95 — the planted leak_code (a pure function of the "
    "label) must rank first with V=1; one contingency rollup per "
    "feature, value-table-sized downstream",
)
def q_leakage_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    y = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    base = orders.select(
        y.alias("y"),
        F.col("o_orderpriority").alias("f_priority"),
        (F.col("o_custkey") % 7).cast("string").alias("f_custmod"),
        F.dayofweek("o_orderdate").cast("string").alias("f_dow"),
        F.when(F.col("o_orderstatus") == "F", "X9").otherwise("Z1").alias(
            "leak_code"
        ),
    )
    melted = None
    for feat in ["f_priority", "f_custmod", "f_dow", "leak_code"]:
        part = base.select(
            F.lit(feat).alias("feature"), F.col(feat).alias("val"), "y"
        )
        melted = part if melted is None else melted.unionAll(part)
    ct = melted.groupBy("feature", "val", "y").agg(
        F.count("*").cast("double").alias("n")
    ).localCheckpoint()  # one contingency build feeds four rollups
    marg = ct.groupBy("feature").agg(
        F.sum("n").alias("nt"), F.countDistinct("val").alias("k")
    )
    rowm = ct.groupBy("feature", "val").agg(F.sum("n").alias("nv"))
    colm = ct.groupBy("feature", "y").agg(F.sum("n").alias("ny"))
    exp = F.col("nv") * F.col("ny") / F.col("nt")
    # complete val x label grid (zero cells included — see oracle note)
    grid = (
        rowm.join(colm, "feature")
        .join(ct.select("feature", "val", "y", "n"), ["feature", "val", "y"], "left")
        .select("feature", "val", "y", "nv", "ny", F.coalesce("n", F.lit(0.0)).alias("n"))
    )
    chi = (
        grid.join(F.broadcast(marg), "feature")
        .groupBy("feature")
        .agg(
            F.sum((F.col("n") - exp) * (F.col("n") - exp) / exp).alias("chi2")
        )
    )
    purity = (
        ct.join(F.broadcast(rowm), ["feature", "val"])
        .groupBy("feature", "val")
        .agg(F.max(F.col("n") / F.col("nv")).alias("p"))
        .groupBy("feature")
        .agg(F.max("p").alias("max_purity"))
    )
    # single-valued features carry no signal: V := 0 (and the guard
    # keeps the k-1 denominator away from zero)
    v = F.when(
        F.col("k") > 1,
        F.sqrt(
            F.col("chi2") / (F.col("nt") * F.least(F.col("k") - 1, F.lit(1)))
        ),
    ).otherwise(F.lit(0.0))
    return (
        marg.join(F.broadcast(chi), "feature")
        .join(F.broadcast(purity), "feature")
        .select(
            "feature",
            F.col("k").alias("n_values"),
            F.round(v, 6).alias("cramers_v"),
            F.round("max_purity", 6).alias("max_value_purity"),
            (v > 0.95).alias("leak_flag"),
        )
        .orderBy(F.desc(F.round(v, 6)), "feature")
    )


# ---------------------------------------------------------------------------
# E161: time-decay attribution
# ---------------------------------------------------------------------------
# The third attribution model next to U-shaped (E142) and Markov (E150):
# each touch earns exp(-minutes_to_conversion / 30) of raw weight,
# normalized within its conversion segment — recency-weighted credit,
# the model ad platforms default to. Same reverse-cumulative
# segmentation; one join from touches to their segment's purchase for
# the conversion timestamp; all windows user-segment-partitioned.

_TDECAY_ORACLE = """
WITH seg AS (
  SELECT user_id, event_type, ts, event_id,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
         ) AS g
  FROM events
),
conv AS (
  SELECT user_id, g, ts AS conv_ts FROM seg WHERE event_type = 'purchase'
),
touches AS (
  SELECT s.user_id, s.g, s.event_type,
         EXP(-(EPOCH(c.conv_ts - s.ts) / 60.0) / 30.0) AS w
  FROM seg s JOIN conv c ON c.user_id = s.user_id AND c.g = s.g
  WHERE s.event_type <> 'purchase'
),
shared AS (
  SELECT event_type,
         w / SUM(w) OVER (PARTITION BY user_id, g) AS credit
  FROM touches
)
SELECT event_type,
       ROUND(SUM(credit), 4) AS total_credit,
       COUNT(*)::BIGINT AS n_touches
FROM shared
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q_timedecay_attribution",
    oracle=_TDECAY_ORACLE,
    doc="time-decay attribution (E161): each touch earns "
    "exp(-mins_to_conversion/30), normalized within its conversion "
    "segment — recency-weighted credit, the third model next to "
    "U-shaped (E142) and Markov (E150); one segment join, all windows "
    "user-partitioned",
)
def q_timedecay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_rev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    seg = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).over(w_rev).alias("g"),
    ).localCheckpoint()  # one segmentation pass feeds touches AND convs
    conv = seg.filter(F.col("event_type") == "purchase").select(
        "user_id", "g", F.col("ts").alias("conv_ts")
    )
    dt_mins = (
        F.col("conv_ts").cast("timestamp").cast("double")
        - F.col("ts").cast("timestamp").cast("double")
    ) / 60.0
    touches = (
        seg.filter(F.col("event_type") != "purchase")
        .join(conv, ["user_id", "g"])
        .select(
            "user_id",
            "g",
            "event_type",
            F.exp(-dt_mins / 30.0).alias("w"),
        )
    )
    w_seg = Window.partitionBy("user_id", "g")
    return (
        touches.select(
            "event_type", (F.col("w") / F.sum("w").over(w_seg)).alias("credit")
        )
        .groupBy("event_type")
        .agg(
            F.round(F.sum("credit"), 4).alias("total_credit"),
            F.count("*").alias("n_touches"),
        )
        .orderBy("event_type")
    )
