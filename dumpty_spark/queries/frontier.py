"""Round-5 engine extensions (EXT E108-E112): graph reachability,
leakage-safe target encoding, Pareto frontier, sliding-window distinct
counts, changepoint localization.

Each one is an operator class the rest of the registry doesn't cover:
bounded BFS is the navigational-graph primitive (CC/PageRank/k-core are
whole-graph), out-of-fold target encoding is the feature-engineering
step every tabular-ML pipeline runs before training, the skyline answers
multi-objective "best tradeoff" questions no single ORDER BY can, the
sliding distinct is the exact windowed-cardinality the naive window agg
cannot express (COUNT(DISTINCT) over a moving frame), and changepoint
localization turns the CUSUM alarm (q_cusum_alarm: IS there drift?) into
an estimate of WHERE the level shift happened.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E108: bounded BFS — n-hop reachability with frontier contraction
# ---------------------------------------------------------------------------
# min-hop distances (<= 3) from the 3 smallest part keys over the part
# co-purchase graph. Spark-first shape: per-hop frontier expansion is ONE
# join frontier⋈edges + ONE anti-join against the visited set (so a node
# reached at hop d is never re-expanded at hop d+1 — the frontier
# CONTRACTS toward the periphery instead of re-walking the core), with
# localCheckpoint truncating the loop's lineage. Hop count is a fixed
# small constant, so the driver loop is bounded, and every per-hop state
# is nodes-sized, never edges×hops. The oracle is a true recursive CTE —
# DuckDB's WITH RECURSIVE UNION dedups (src, node, dist) states, and the
# MIN(dist) rollup collapses them to first-reach distances.

_BFS_ORACLE = """
WITH RECURSIVE baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),
srcs AS (SELECT DISTINCT l_partkey AS s FROM lineitem ORDER BY s LIMIT 3),
walk(src, node, dist) AS (
  SELECT s, s, 0 FROM srcs
  UNION
  SELECT w.src, e.v, w.dist + 1
  FROM walk w JOIN edges e ON e.u = w.node
  WHERE w.dist < 3
),
mind AS (SELECT src, node, MIN(dist) AS dist FROM walk GROUP BY src, node)
SELECT src, dist,
       COUNT(*)::BIGINT AS n_nodes,
       MIN(node)::BIGINT AS min_node,
       MAX(node)::BIGINT AS max_node
FROM mind
GROUP BY src, dist
ORDER BY src, dist
"""


@register(
    "q_bfs_reachability",
    oracle=_BFS_ORACLE,
    doc="bounded BFS (E108): min-hop distances <= 3 from the 3 smallest "
    "part keys over the co-purchase graph — per-hop frontier join + "
    "visited anti-join (the frontier contracts, nothing is re-expanded), "
    "lineage checkpointed per hop; oracle is a genuine recursive CTE",
)
def q_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators.bfs import bounded_bfs
    from dumpty_spark.queries.shared_graph import copurchase_symmetric

    li = load_table(spark, sf_dir, "lineitem")
    edges = copurchase_symmetric(spark, sf_dir)
    # seed set: 3 smallest part keys — driver-known by contract (the
    # operator walk is two-regime; see operators/bfs.py, r6)
    sources = [
        r["s"]
        for r in li.select(F.col("l_partkey").alias("s"))
        .distinct()
        .orderBy("s")
        .limit(3)
        .collect()
    ]
    visited = bounded_bfs(edges, sources, n_hops=3)
    return (
        visited.groupBy("src", "dist")
        .agg(
            F.count("*").alias("n_nodes"),
            F.min("node").alias("min_node"),
            F.max("node").alias("max_node"),
        )
        .orderBy("src", "dist")
    )


# ---------------------------------------------------------------------------
# E109: leakage-safe out-of-fold target encoding
# ---------------------------------------------------------------------------
# The standard tabular-ML categorical encoder: replace a category with a
# smoothed mean of the target — computed OUT-OF-FOLD, so a row's own
# target never leaks into its feature. Folds come from the portable md5
# bucket (pure function of the key: identical on any engine, any
# partitioning). For fold f and category c:
#   enc(c, f) = (sum_c − sum_{c,f} + m·prior_f) / (cnt_c − cnt_{c,f} + m)
# where prior_f is the out-of-fold global mean and m is the smoothing
# pseudo-count. One (category, fold) partial-agg scan; everything after
# is categories×folds-sized arithmetic on broadcast totals.

_TE_FOLDS = 5
_TE_SMOOTH = 20.0

_TARGET_ENC_ORACLE = f"""
WITH folds AS (
  SELECT o_orderpriority AS cat, o_totalprice AS y,
         ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))::INTEGER
           % {_TE_FOLDS} AS fold
  FROM orders
),
cf AS (SELECT cat, fold, SUM(y) AS s, COUNT(*)::DOUBLE AS c FROM folds GROUP BY 1, 2),
ct AS (SELECT cat, SUM(s) AS s_cat, SUM(c) AS c_cat FROM cf GROUP BY 1),
ft AS (SELECT fold, SUM(s) AS s_fold, SUM(c) AS c_fold FROM cf GROUP BY 1),
gt AS (SELECT SUM(s) AS s_all, SUM(c) AS c_all FROM cf)
SELECT cf.cat, cf.fold,
       cf.c::BIGINT AS n_rows,
       ROUND((ct.s_cat - cf.s + {_TE_SMOOTH} *
                ((gt.s_all - ft.s_fold) / (gt.c_all - ft.c_fold)))
             / (ct.c_cat - cf.c + {_TE_SMOOTH}), 4) AS enc
FROM cf
JOIN ct USING (cat)
JOIN ft USING (fold)
CROSS JOIN gt
ORDER BY cat, fold
"""


@register(
    "q_target_encoding",
    oracle=_TARGET_ENC_ORACLE,
    doc="out-of-fold target encoding (E109): smoothed out-of-fold mean "
    "o_totalprice per o_orderpriority with 5 portable md5 folds — the "
    "leakage-safe categorical encoder; one (cat, fold) partial-agg scan, "
    "categories×folds-sized arithmetic after",
)
def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    fold = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % _TE_FOLDS
    )
    cf = (
        orders.select(
            F.col("o_orderpriority").alias("cat"),
            F.col("o_totalprice").alias("y"),
            fold.alias("fold"),
        )
        .groupBy("cat", "fold")
        .agg(F.sum("y").alias("s"), F.count("*").cast("double").alias("c"))
    )
    ct = cf.groupBy("cat").agg(F.sum("s").alias("s_cat"), F.sum("c").alias("c_cat"))
    ft = cf.groupBy("fold").agg(F.sum("s").alias("s_fold"), F.sum("c").alias("c_fold"))
    gt = cf.agg(F.sum("s").alias("s_all"), F.sum("c").alias("c_all"))
    prior = (F.col("s_all") - F.col("s_fold")) / (F.col("c_all") - F.col("c_fold"))
    return (
        cf.join(F.broadcast(ct), "cat")
        .join(F.broadcast(ft), "fold")
        .crossJoin(F.broadcast(gt))
        .select(
            "cat",
            "fold",
            F.col("c").cast("long").alias("n_rows"),
            F.round(
                (F.col("s_cat") - F.col("s") + _TE_SMOOTH * prior)
                / (F.col("c_cat") - F.col("c") + _TE_SMOOTH),
                4,
            ).alias("enc"),
        )
        .orderBy("cat", "fold")
    )


# ---------------------------------------------------------------------------
# E110: Pareto frontier (skyline) — min price, max size
# ---------------------------------------------------------------------------
# The parts no other part beats on BOTH objectives. Naive skyline is the
# quadratic dominance anti-join (that's the oracle); the engine computes
# it with monotone windows: (1) per price keep only the max size (a
# same-price taller point strictly dominates the rest), (2) range-bucket
# the price axis, take per-bucket maxima, running-max the bucket maxima
# (a B-row window), (3) inside each bucket a candidate survives iff its
# size strictly exceeds both the running max of all cheaper buckets and
# the running max of cheaper points within its own bucket — every window
# is bucket-partitioned, so no stage ever sees a global ordering.

_PARETO_ORACLE = """
WITH pts AS (
  SELECT p_retailprice AS price, p_size AS size, COUNT(*)::BIGINT AS n_parts
  FROM part GROUP BY 1, 2
),
fr AS (
  SELECT * FROM pts p
  WHERE NOT EXISTS (
    SELECT 1 FROM pts q
    WHERE q.price <= p.price AND q.size >= p.size
      AND (q.price < p.price OR q.size > p.size)
  )
)
SELECT ROUND(price, 2) AS price, size, n_parts
FROM fr ORDER BY price, size
"""

_PARETO_BUCKETS = 32


@register(
    "q_pareto_frontier",
    oracle=_PARETO_ORACLE,
    doc="Pareto frontier / skyline (E110): parts undominated on (min "
    "p_retailprice, max p_size) via bucket-partitioned monotone windows — "
    "no global window, no quadratic pass; the oracle IS the quadratic "
    "dominance anti-join, so the hash match proves the windowed plan "
    "finds exactly the classical skyline",
)
def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    pts = part.groupBy(
        F.col("p_retailprice").alias("price"), F.col("p_size").alias("size")
    ).agg(F.count("*").alias("n_parts"))
    # per price only the tallest point can survive (same price, bigger
    # size strictly dominates); carry its n_parts through
    wp = Window.partitionBy("price").orderBy(F.desc("size"))
    cand = (
        pts.withColumn("__r", F.row_number().over(wp))
        .filter(F.col("__r") == 1)
        .drop("__r")
    )
    # range-bucket the price axis from one broadcast stats row
    stats = cand.agg(
        F.min("price").alias("__mn"), F.max("price").alias("__mx")
    )
    b = cand.crossJoin(F.broadcast(stats)).withColumn(
        "bucket",
        F.least(
            F.lit(_PARETO_BUCKETS - 1),
            F.floor(
                (F.col("price") - F.col("__mn"))
                / ((F.col("__mx") - F.col("__mn")) / _PARETO_BUCKETS + 1e-12)
            ).cast("int"),
        ),
    )
    # bucket maxima → running max over STRICTLY cheaper buckets (B rows)
    bm = b.groupBy("bucket").agg(F.max("size").alias("bmax"))
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    prev_bucket_max = bm.select(
        "bucket", F.max("bmax").over(wb).alias("prev_max")
    )
    # within a bucket: running max over strictly cheaper points
    wc = (
        Window.partitionBy("bucket")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        b.join(F.broadcast(prev_bucket_max), "bucket")
        .withColumn("in_bucket_prev", F.max("size").over(wc))
        .filter(
            (F.col("size") > F.coalesce(F.col("prev_max"), F.lit(-(2**31))))
            & (
                F.col("size")
                > F.coalesce(F.col("in_bucket_prev"), F.lit(-(2**31)))
            )
        )
        .select(F.round("price", 2).alias("price"), "size", "n_parts")
        .orderBy("price", "size")
    )


# ---------------------------------------------------------------------------
# E111: exact sliding-window distinct counts via interval diff-arrays
# ---------------------------------------------------------------------------
# Distinct users in the trailing 24 h, for EVERY hour — the windowed
# cardinality a frame-based COUNT(DISTINCT) cannot express and an HLL
# union can only approximate. Exact trick: a user covers window-end hour
# H iff their latest active hour h <= H satisfies H - h < 24, i.e. each
# (h, next_h) pair of consecutive active hours contributes the interval
# [h, min(h+23, next_h-1)] — disjoint per user by construction, so
# summing +1/−1 interval endpoints (a diff array) and prefix-summing over
# the hour grid yields the exact count. The heavy state is distinct
# (user, hour) pairs — one shuffle — and everything after is
# calendar-sized, not event-sized.

_WINDOW_H = 24

_SLIDING_DISTINCT_ORACLE = f"""
WITH act AS (
  SELECT DISTINCT user_id, floor(epoch(ts))::BIGINT // 3600 AS h FROM events
),
bounds AS (SELECT MIN(h) AS mn, MAX(h) AS mx FROM act),
grid AS (SELECT UNNEST(generate_series(mn, mx)) AS hour_id FROM bounds)
SELECT g.hour_id,
       COUNT(DISTINCT a.user_id)::BIGINT AS n_users_24h
FROM grid g
LEFT JOIN act a ON a.h BETWEEN g.hour_id - {_WINDOW_H - 1} AND g.hour_id
GROUP BY g.hour_id
ORDER BY g.hour_id
"""


@register(
    "q_sliding_distinct",
    oracle=_SLIDING_DISTINCT_ORACLE,
    doc="exact sliding-window distinct users (E111): trailing-24h "
    "cardinality per hour via interval diff-arrays (+1 at each latest-"
    "active interval start, -1 past its end, prefix sum over the hour "
    "grid) — one (user, hour) dedup shuffle, then calendar-sized state; "
    "the oracle recomputes every window by brute-force range join",
)
def q_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    act = ev.select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / F.lit(3600)).cast("long").alias("h"),
    ).distinct()
    wu = Window.partitionBy("user_id").orderBy("h")
    iv = act.withColumn("next_h", F.lead("h").over(wu)).select(
        "h",
        F.least(
            F.coalesce(F.col("next_h") - 1, F.col("h") + (_WINDOW_H - 1)),
            F.col("h") + (_WINDOW_H - 1),
        ).alias("end"),
    )
    deltas = iv.select(F.col("h").alias("hour_id"), F.lit(1).alias("d")).unionAll(
        iv.select((F.col("end") + 1).alias("hour_id"), F.lit(-1).alias("d"))
    )
    dsum = deltas.groupBy("hour_id").agg(F.sum("d").alias("d"))
    # full hour grid from one broadcast stats row (__mn <= __mx by
    # construction, so the computed-bounds sequence can never invert)
    bounds = act.agg(F.min("h").alias("__mn"), F.max("h").alias("__mx"))
    grid = bounds.select(
        F.explode(F.sequence(F.col("__mn"), F.col("__mx"))).alias("hour_id")
    )
    return (
        grid.join(dsum, "hour_id", "left")
        .fillna(0, ["d"])
        .withColumn(
            "n_users_24h",
            F.sum("d")
            .over(Window.orderBy("hour_id").rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
        .select("hour_id", "n_users_24h")
        .orderBy("hour_id")
    )


# ---------------------------------------------------------------------------
# E112: changepoint localization — WHERE did the level shift happen?
# ---------------------------------------------------------------------------
# q_cusum_alarm answers whether a series drifted; this estimates the
# change POINT: the index maximizing the standardized CUSUM deviation
# |S_k| / (σ√n) with S_k = Σ_{i<=k}(x_i − x̄) — the classic single-
# changepoint estimator (binary segmentation's first split). S_k is
# cum(x) − k·x̄, so one ordered window pass plus a broadcast stats row
# covers every series. Both engines pre-round the statistic to 6dp
# BEFORE the argmax so an ulp of accumulation order can never flip the
# winner; the reported stat re-rounds to the 4dp hash standard.

_CHANGEPOINT_ORACLE = """
WITH s AS (
  SELECT event_type, ts, event_id,
         ROW_NUMBER() OVER w AS i,
         SUM(value) OVER (w ROWS UNBOUNDED PRECEDING) AS cum
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
),
st AS (
  SELECT event_type, COUNT(*)::DOUBLE AS n, AVG(value) AS mu,
         STDDEV_POP(value) AS sd
  FROM events GROUP BY 1
),
sc AS (
  SELECT s.event_type, s.ts, s.i,
         ROUND(ABS(s.cum - s.i * st.mu) / (st.sd * SQRT(st.n)), 6) AS stat
  FROM s JOIN st USING (event_type)
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY event_type ORDER BY stat DESC, ts, i) AS rnk
  FROM sc
)
SELECT event_type,
       STRFTIME(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS cp_ts,
       i::BIGINT AS cp_idx,
       ROUND(stat, 4) AS max_stat
FROM r WHERE rnk = 1
ORDER BY event_type
"""


@register(
    "q_changepoint",
    oracle=_CHANGEPOINT_ORACLE,
    doc="changepoint localization (E112): per-series argmax of the "
    "standardized CUSUM deviation |S_k|/(σ√n) — the classic single-"
    "changepoint estimator; one ordered window pass + broadcast stats, "
    "6dp pre-rounding on both engines so the argmax can't flip on "
    "accumulation-order ulps",
)
def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        "ts",
        F.row_number().over(w).alias("i"),
        F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
    )
    st = ev.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        F.avg("value").alias("mu"),
        F.stddev_pop("value").alias("sd"),
    )
    sc = s.join(F.broadcast(st), "event_type").select(
        "event_type",
        "ts",
        "i",
        F.round(
            F.abs(F.col("cum") - F.col("i") * F.col("mu"))
            / (F.col("sd") * F.sqrt(F.col("n"))),
            6,
        ).alias("stat"),
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.desc("stat"), F.asc("ts"), F.asc("i")
    )
    return (
        sc.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") == 1)
        .select(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("cp_ts"),
            F.col("i").alias("cp_idx"),
            F.round("stat", 4).alias("max_stat"),
        )
        .orderBy("event_type")
    )
