"""Round-5 engine extensions, third batch (EXT E116-E120): decayed
aggregate store, multivariate OLS via normal equations, weighted median,
Matryoshka embedding-truncation audit, linear gap interpolation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E116: exponentially-decayed aggregate store
# ---------------------------------------------------------------------------
# Two ingest batches reduced to decayed partials at their own reference
# times; the readout re-decays each batch by ONE scalar to the newest
# reference and folds — recency-weighted aggregates over unbounded
# history with nothing re-read. The oracle computes the decayed sums
# directly over the raw events at the same global reference time, so the
# hash match proves the two-step decay algebra (batch-local decay ×
# re-decay) equals the direct single-step weighting.

_HALF_LIFE_S = 86400.0  # 1-day half-life

_DECAY_ORACLE = f"""
WITH t AS (SELECT MAX(epoch(ts)) AS tmax FROM events),
d AS (
  SELECT event_type, value,
         POW(2.0, -(t.tmax - epoch(ts)) / {_HALF_LIFE_S}) AS w
  FROM events, t
)
SELECT event_type,
       ROUND(SUM(value * w), 4) AS decayed_sum,
       ROUND(SUM(w), 4) AS decayed_n,
       ROUND(SUM(value * w) / SUM(w), 4) AS decayed_mean,
       COUNT(*)::BIGINT AS n_rows
FROM d
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q_decayed_store",
    oracle=_DECAY_ORACLE,
    doc="exponentially-decayed aggregate store (E116): per-batch decayed "
    "partials at rest (1-day half-life), readout re-decays each batch by "
    "one scalar and folds — recency-weighted sums/means over unbounded "
    "history, history never re-read; the oracle recomputes the weights "
    "directly from raw events, proving the two-step decay algebra exact",
)
def q_decayed_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from dumpty_spark.operators import decay as D
    from dumpty_spark.session import warehouse_scratch

    ev = load_table(spark, sf_dir, "events")
    tmp = warehouse_scratch(spark, "decay")
    try:
        store = f"{tmp}/decay"
        for bid, parity in (("b0", 0), ("b1", 1)):
            D.decay_store_append(
                ev.filter(F.col("event_id") % 2 == parity),
                store,
                ["event_type"],
                "value",
                "ts",
                _HALF_LIFE_S,
                bid,
            )
        return (
            D.decay_store_read(spark, store, ["event_type"], _HALF_LIFE_S)
            .select(
                "event_type",
                F.round("decayed_sum", 4).alias("decayed_sum"),
                F.round("decayed_n", 4).alias("decayed_n"),
                F.round("decayed_mean", 4).alias("decayed_mean"),
                "n_rows",
            )
            .orderBy("event_type")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# E117: multivariate OLS via normal equations — ML from aggregates
# ---------------------------------------------------------------------------
# Two-feature regression (value ~ day-index + hour-of-day per series)
# solved in closed form from ONE partial-aggregated co-moment pass: the
# 2×2 centered normal equations invert by Cramer's rule, so model fitting
# costs exactly one scan at any scale — no iterative solver, no driver
# matrices beyond 2×2. Extends E60's single-feature REGR_* surface to the
# multivariate case neither engine has built in.

_MV_OLS_ORACLE = """
WITH pts AS (
  SELECT event_type,
         (floor(epoch(ts))::BIGINT // 86400)::DOUBLE AS x1,
         ((floor(epoch(ts))::BIGINT % 86400) / 3600.0) AS x2,
         value AS y
  FROM events
),
m AS (
  SELECT event_type,
         COUNT(*)::BIGINT AS n,
         VAR_POP(x1) AS v1, VAR_POP(x2) AS v2,
         COVAR_POP(x1, x2) AS c12,
         COVAR_POP(x1, y) AS c1y, COVAR_POP(x2, y) AS c2y,
         VAR_POP(y) AS vy,
         AVG(x1) AS m1, AVG(x2) AS m2, AVG(y) AS my
  FROM pts GROUP BY 1
)
SELECT event_type, n,
       ROUND((c1y * v2 - c2y * c12) / (v1 * v2 - c12 * c12), 5) AS beta_day,
       ROUND((c2y * v1 - c1y * c12) / (v1 * v2 - c12 * c12), 5) AS beta_hour,
       ROUND(my - (c1y * v2 - c2y * c12) / (v1 * v2 - c12 * c12) * m1
                - (c2y * v1 - c1y * c12) / (v1 * v2 - c12 * c12) * m2, 4)
         AS intercept,
       ROUND(((c1y * v2 - c2y * c12) / (v1 * v2 - c12 * c12) * c1y
            + (c2y * v1 - c1y * c12) / (v1 * v2 - c12 * c12) * c2y) / vy, 5)
         AS r2
FROM m
ORDER BY event_type
"""


@register(
    "q_multivar_ols",
    oracle=_MV_OLS_ORACLE,
    doc="multivariate OLS via normal equations (E117): value ~ day + "
    "hour-of-day per series, solved closed-form from one co-moment "
    "partial-agg scan (2x2 Cramer inverse) — distributed model fitting "
    "with zero iterations; extends the REGR_* single-feature surface",
)
def q_multivar_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.floor(F.unix_timestamp("ts") / F.lit(86400)).cast("long")
    secs = F.unix_timestamp("ts") - day * 86400
    pts = ev.select(
        "event_type",
        day.cast("double").alias("x1"),
        (secs / 3600.0).alias("x2"),
        F.col("value").alias("y"),
    )
    m = pts.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.var_pop("x1").alias("v1"),
        F.var_pop("x2").alias("v2"),
        F.covar_pop("x1", "x2").alias("c12"),
        F.covar_pop("x1", "y").alias("c1y"),
        F.covar_pop("x2", "y").alias("c2y"),
        F.var_pop("y").alias("vy"),
        F.avg("x1").alias("m1"),
        F.avg("x2").alias("m2"),
        F.avg("y").alias("my"),
    )
    det = F.col("v1") * F.col("v2") - F.col("c12") * F.col("c12")
    b1 = (F.col("c1y") * F.col("v2") - F.col("c2y") * F.col("c12")) / det
    b2 = (F.col("c2y") * F.col("v1") - F.col("c1y") * F.col("c12")) / det
    return m.select(
        "event_type",
        "n",
        F.round(b1, 5).alias("beta_day"),
        F.round(b2, 5).alias("beta_hour"),
        F.round(F.col("my") - b1 * F.col("m1") - b2 * F.col("m2"), 4).alias(
            "intercept"
        ),
        F.round((b1 * F.col("c1y") + b2 * F.col("c2y")) / F.col("vy"), 5).alias("r2"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# E118: weighted median — cumulative-weight crossing, no interpolation
# ---------------------------------------------------------------------------
# The weighted median of l_extendedprice with l_quantity as mass, per
# return flag: the smallest price whose cumulative weight reaches half
# the total. A pure window pass (cumulative sum over a total order);
# quantities are integral so the crossing comparison is exact on both
# engines — no floating interpolation anywhere.

_WMEDIAN_ORACLE = """
WITH w AS (
  SELECT l_returnflag AS flag, l_extendedprice AS price, l_quantity AS q,
         SUM(l_quantity) OVER (PARTITION BY l_returnflag
                               ORDER BY l_extendedprice, l_orderkey, l_linenumber
                               ROWS UNBOUNDED PRECEDING) AS cumw,
         SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS totw
  FROM lineitem
),
x AS (
  SELECT flag, price, totw,
         ROW_NUMBER() OVER (PARTITION BY flag ORDER BY price, cumw) AS rn
  FROM w WHERE cumw >= totw / 2.0
)
SELECT flag,
       ROUND(price, 2) AS weighted_median,
       ROUND(totw, 2) AS total_weight
FROM x WHERE rn = 1
ORDER BY flag
"""


@register(
    "q_weighted_median",
    oracle=_WMEDIAN_ORACLE,
    doc="weighted median (E118): smallest l_extendedprice whose "
    "cumulative l_quantity mass reaches half the flag's total — exact "
    "integral-mass crossing via the E9 bucket pattern (approx-quantile "
    "price buckets, metadata-sized per-bucket partial weights, broadcast "
    "offsets, cumulative window ONLY inside each flag's crossing bucket) "
    "— no cumulative window ever partitions on the 3-value flag alone",
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    # VERDICT r5 What's wrong #3: the naive plan (cumulative window
    # partitioned by l_returnflag) lands 1/3 of lineitem in ONE task.
    # E9's pattern shrinks the windowed slice to ~1/n_buckets of a flag:
    #   1. equal-frequency price boundaries (one approxQuantile pass);
    #   2. bucket id = pure function of price (monotone, so the global
    #      (price, okey, lineno) order is bucket-major);
    #   3. per-(flag, bucket) partial l_quantity sums — METADATA-sized
    #      (flags x buckets rows); cumulative offsets + totals over that;
    #   4. the crossing bucket per flag (offset < totw/2 <= offset+w) is
    #      broadcast back; the cumulative window runs only inside it.
    # l_quantity is integer-valued, so re-associating the sum (offset +
    # local cum) is exact — no float-order sensitivity at the crossing.
    spark_ = spark.sparkContext
    n_buckets = max(32, spark_.defaultParallelism)
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").alias("qty"),
        "l_orderkey",
        "l_linenumber",
    )
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sorted(set(li.stat.approxQuantile("price", probs, 0.001)))
    barr = F.array(*[F.lit(float(b)) for b in bounds])
    pid = F.size(F.filter(barr, lambda b: F.col("price") > b))
    lb = li.withColumn("__b", pid)

    parts = lb.groupBy("flag", "__b").agg(F.sum("qty").alias("__w"))
    woff = (
        Window.partitionBy("flag")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marks = parts.select(
        "flag",
        "__b",
        F.coalesce(F.sum("__w").over(woff), F.lit(0.0)).alias("__off"),
        F.sum("__w").over(Window.partitionBy("flag")).alias("totw"),
        "__w",
    ).filter(
        (F.col("__off") < F.col("totw") / 2.0)
        & (F.col("__off") + F.col("__w") >= F.col("totw") / 2.0)
    )

    wloc = (
        Window.partitionBy("flag", "__b")
        .orderBy("price", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    crossing = (
        lb.join(F.broadcast(marks.select("flag", "__b", "__off", "totw")), ["flag", "__b"])
        .withColumn("cumw", F.col("__off") + F.sum("qty").over(wloc))
        .filter(F.col("cumw") >= F.col("totw") / 2.0)
    )
    # first qualifying row per flag by (price, cumw): a min-of-struct
    # partial aggregation — no window over the qualifying tail at all
    x = crossing.groupBy("flag").agg(
        F.min(F.struct("price", "cumw", "totw")).alias("s")
    )
    return x.select(
        "flag",
        F.round(F.col("s.price"), 2).alias("weighted_median"),
        F.round(F.col("s.totw"), 2).alias("total_weight"),
    ).orderBy("flag")


# ---------------------------------------------------------------------------
# E119: Matryoshka truncation audit — how much ANN quality do prefix
# dimensions keep?
# ---------------------------------------------------------------------------
# Modern embedding models train nested ("Matryoshka") representations so
# a prefix slice of the vector is itself a usable embedding at lower
# cost. Before shipping truncated vectors, a pipeline measures what the
# cut loses: overlap@5 of the truncated-vector top-k vs the full-vector
# top-k for a query batch, per prefix width. All brute-force passes are
# queries×corpus-bounded with the rank convention (4dp-rounded sims,
# id tie-break) every similarity surface here shares.

_MATRYOSHKA_ORACLE = """
WITH full_tk AS (
  SELECT q_id, n_id FROM (
    SELECT a.vec_id AS q_id, b.vec_id AS n_id,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
             ORDER BY ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                                   b.embedding::DOUBLE[]), 4)
               DESC, b.vec_id) AS rnk
    FROM embeddings a JOIN embeddings b
      ON a.vec_id < 10 AND b.vec_id != a.vec_id
  ) WHERE rnk <= 5
),
trunc AS (
  SELECT d.dim, a.vec_id AS q_id, b.vec_id AS n_id,
         ROW_NUMBER() OVER (PARTITION BY d.dim, a.vec_id
           ORDER BY ROUND(list_cosine_similarity(
                      a.embedding[1:d.dim]::DOUBLE[],
                      b.embedding[1:d.dim]::DOUBLE[]), 4) DESC, b.vec_id) AS rnk
  FROM embeddings a
  JOIN embeddings b ON a.vec_id < 10 AND b.vec_id != a.vec_id
  CROSS JOIN (SELECT UNNEST([8, 16, 32]) AS dim) d
),
tk AS (SELECT dim, q_id, n_id FROM trunc WHERE rnk <= 5),
ov AS (
  SELECT t.dim, t.q_id, COUNT(f.n_id)::DOUBLE AS hits
  FROM tk t LEFT JOIN full_tk f ON f.q_id = t.q_id AND f.n_id = t.n_id
  GROUP BY t.dim, t.q_id
)
SELECT dim, ROUND(AVG(hits) / 5.0, 4) AS overlap_at_5
FROM ov GROUP BY dim ORDER BY dim
"""


@register(
    "q_matryoshka_audit",
    oracle=_MATRYOSHKA_ORACLE,
    doc="Matryoshka truncation audit (E119): overlap@5 of prefix-sliced "
    "embeddings (8/16/32 of 64 dims) vs the full-vector top-5 over the "
    "query batch — the measure-before-you-truncate gate for cheap-vector "
    "serving; every pass is queries×corpus-bounded with the shared "
    "4dp-rounded rank convention",
)
def q_matryoshka_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators import similarity as S
    from dumpty_spark.queries.vector import _shared_exact_topk

    emb = load_table(spark, sf_dir, "embeddings")
    # the full-vector reference is the session-shared brute-force top-5
    # (same frame q_cosine_topk publishes) — already checkpointed
    full = _shared_exact_topk(spark, sf_dir).select("q_id", "n_id")
    outs = []
    for dim in (8, 16, 32):
        sliced = emb.select(
            "vec_id", F.slice("embedding", 1, dim).alias("embedding")
        )
        tk = S.brute_force_topk(
            sliced, sliced.filter(F.col("vec_id") < 10), k=5
        ).select(F.lit(dim).alias("dim"), "q_id", "n_id")
        outs.append(tk)
    trunc = outs[0].unionAll(outs[1]).unionAll(outs[2])
    fullr = full.select(
        F.col("q_id").alias("f_q"), F.col("n_id").alias("f_id")
    )
    ov = (
        trunc.join(
            F.broadcast(fullr),
            (trunc["q_id"] == fullr["f_q"]) & (trunc["n_id"] == fullr["f_id"]),
            "left",
        )
        .groupBy("dim", trunc["q_id"])
        .agg(F.count("f_id").cast("double").alias("hits"))
    )
    return (
        ov.groupBy("dim")
        .agg(F.round(F.avg("hits") / 5.0, 4).alias("overlap_at_5"))
        .orderBy("dim")
    )


# ---------------------------------------------------------------------------
# E120: linear gap interpolation over the hourly grid
# ---------------------------------------------------------------------------
# q_resample_ffill carries the LAST value across gaps; this fills each
# missing hour on the line between its neighbors — the standard
# time-series imputation before models that can't see NULLs. The grid is
# calendar-sized; prev/next anchors come from two IGNORE-NULLS window
# passes, so the fill is one plan with no self-join.

_INTERP_ORACLE = """
WITH hourly AS (
  SELECT event_type, floor(epoch(ts))::BIGINT // 3600 AS h,
         ROUND(AVG(value), 6) AS v
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, MIN(h) AS mn, MAX(h) AS mx FROM hourly GROUP BY 1
),
grid AS (
  SELECT event_type, UNNEST(generate_series(mn, mx)) AS h FROM bounds
),
g AS (
  SELECT g.event_type, g.h, hr.v,
         LAST_VALUE(hr.v IGNORE NULLS) OVER
           (PARTITION BY g.event_type ORDER BY g.h
            ROWS UNBOUNDED PRECEDING) AS pv,
         LAST_VALUE(CASE WHEN hr.v IS NOT NULL THEN g.h END IGNORE NULLS)
           OVER (PARTITION BY g.event_type ORDER BY g.h
                 ROWS UNBOUNDED PRECEDING) AS ph,
         FIRST_VALUE(hr.v IGNORE NULLS) OVER
           (PARTITION BY g.event_type ORDER BY g.h
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         FIRST_VALUE(CASE WHEN hr.v IS NOT NULL THEN g.h END IGNORE NULLS)
           OVER (PARTITION BY g.event_type ORDER BY g.h
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
  FROM grid g LEFT JOIN hourly hr ON hr.event_type = g.event_type AND hr.h = g.h
),
f AS (
  SELECT event_type, h, v,
         CASE
           WHEN v IS NOT NULL THEN v
           WHEN pv IS NOT NULL AND nv IS NOT NULL
             THEN pv + (nv - pv) * (h - ph)::DOUBLE / (nh - ph)
           WHEN pv IS NOT NULL THEN pv
           ELSE nv
         END AS filled
  FROM g
)
SELECT event_type,
       COUNT(*)::BIGINT AS n_hours,
       COUNT(*) FILTER (WHERE v IS NULL)::BIGINT AS n_filled,
       ROUND(SUM(filled), 4) AS filled_sum,
       ROUND(AVG(filled), 4) AS filled_avg
FROM f
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q_interpolate_gaps",
    oracle=_INTERP_ORACLE,
    doc="linear gap interpolation (E120): every missing hour filled on "
    "the line between its prev/next observed anchors (edge gaps carry "
    "the nearest anchor) — two IGNORE-NULLS window passes over the "
    "calendar-sized hourly grid, one plan, no self-join; the fill "
    "checksum and counts are the hashed contract",
)
def q_interpolate_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type",
            F.floor(F.unix_timestamp("ts") / F.lit(3600)).cast("long").alias("h"),
            "value",
        )
        .groupBy("event_type", "h")
        .agg(F.round(F.avg("value"), 6).alias("v"))
    )
    # per-type hour grid (__mn <= __mx by construction: min <= max)
    bounds = hourly.groupBy("event_type").agg(
        F.min("h").alias("__mn"), F.max("h").alias("__mx")
    )
    grid = bounds.select(
        "event_type", F.explode(F.sequence(F.col("__mn"), F.col("__mx"))).alias("h")
    )
    g = grid.join(hourly, ["event_type", "h"], "left")
    wb = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    marked_h = F.when(F.col("v").isNotNull(), F.col("h"))
    filledf = (
        g.withColumn("pv", F.last("v", ignorenulls=True).over(wb))
        .withColumn("ph", F.last(marked_h, ignorenulls=True).over(wb))
        .withColumn("nv", F.first("v", ignorenulls=True).over(wf))
        .withColumn("nh", F.first(marked_h, ignorenulls=True).over(wf))
        .withColumn(
            "filled",
            F.when(F.col("v").isNotNull(), F.col("v"))
            .when(
                F.col("pv").isNotNull() & F.col("nv").isNotNull(),
                F.col("pv")
                + (F.col("nv") - F.col("pv"))
                * (F.col("h") - F.col("ph")).cast("double")
                / (F.col("nh") - F.col("ph")),
            )
            .when(F.col("pv").isNotNull(), F.col("pv"))
            .otherwise(F.col("nv")),
        )
    )
    return (
        filledf.groupBy("event_type")
        .agg(
            F.count("*").alias("n_hours"),
            F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_filled"),
            F.round(F.sum("filled"), 4).alias("filled_sum"),
            F.round(F.avg("filled"), 4).alias("filled_avg"),
        )
        .orderBy("event_type")
    )
