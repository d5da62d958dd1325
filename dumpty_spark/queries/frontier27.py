"""Round-8 engine extensions, second batch (EXT E191-E194): HITS
hubs/authorities, functional-dependency profiling, seasonal-naive
forecast evaluation (MASE), and degree assortativity.

Design rules: integer-exact iterative trajectories wherever possible
(HITS runs UNNORMALIZED over BIGINT scores — no float drift to
requantize at all), single-division portability for every ratio
(one IEEE op on identical integers is deterministic across engines;
multi-term float SUMs are the only order-sensitive construct, so they
are integerized per-term first), and exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E191: HITS hubs & authorities (Kleinberg 1999)
# ---------------------------------------------------------------------------
# PageRank (E26) ranks by undirected co-purchase mass; HITS separates
# the two ROLES a directed graph has — hubs that point at good
# authorities and authorities pointed at by good hubs — here over the
# supplier -> customer fulfilment graph (distinct pairs via
# lineitem x orders). Spark-first: each half-step is ONE broadcast join
# of the node-sized score frame onto the edge list + a partial-agg
# shuffle (edge-linear, the PageRank round shape). The trajectory stays
# INTEGER: seeds are 1, so after k half-steps every score is an exact
# path count (auth2 = # of 2-step hub paths into the node) — BIGINT
# arithmetic is bit-identical on both engines, which kills the
# 9dp-requantization machinery iterative float trajectories need.
# Bounded at 2 full iterations so magnitudes stay ~1e10 << 2^63 even
# at x100 edges.

_HITS_TOPK = 10

_HITS_ORACLE = f"""
WITH edges AS (
  SELECT DISTINCT l.l_suppkey AS u, o.o_custkey AS v
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
a1 AS (SELECT v, COUNT(*)::BIGINT AS s FROM edges GROUP BY v),
h1 AS (SELECT e.u, SUM(a1.s)::BIGINT AS s FROM edges e
       JOIN a1 ON a1.v = e.v GROUP BY e.u),
a2 AS (SELECT e.v, SUM(h1.s)::BIGINT AS s FROM edges e
       JOIN h1 ON h1.u = e.u GROUP BY e.v),
h2 AS (SELECT e.u, SUM(a2.s)::BIGINT AS s FROM edges e
       JOIN a2 ON a2.v = e.v GROUP BY e.u),
tops AS (
  SELECT 'auth' AS side, v AS node, s,
         ROW_NUMBER() OVER (ORDER BY s DESC, v) AS rnk
  FROM a2
  UNION ALL
  SELECT 'hub', u, s, ROW_NUMBER() OVER (ORDER BY s DESC, u)
  FROM h2
)
SELECT side, node, s AS score, rnk
FROM tops WHERE rnk <= {_HITS_TOPK}
ORDER BY side, rnk
"""


@register(
    "q_hits_scores",
    oracle=_HITS_ORACLE,
    doc="HITS hubs & authorities (E191, Kleinberg): two mutual-"
    "reinforcement iterations over the distinct supplier->customer "
    "fulfilment graph — each half-step one broadcast node-score join + "
    "partial-agg shuffle (edge-linear, the PageRank round shape); the "
    "trajectory is INTEGER path counts (seeds 1, unnormalized), so "
    "both engines agree bit-exactly with no requantization; top-10 "
    "per side",
)
def q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(F.col("l_suppkey").alias("u"), F.col("o_custkey").alias("v"))
        .distinct()
        .localCheckpoint()  # 4 half-steps reuse the edge list
    )
    a1 = edges.groupBy("v").agg(F.count("*").alias("s"))
    h1 = (
        edges.join(F.broadcast(a1), "v")
        .groupBy("u")
        .agg(F.sum("s").alias("s"))
    )
    a2 = (
        edges.join(F.broadcast(h1), "u")
        .groupBy("v")
        .agg(F.sum("s").alias("s"))
    )
    h2 = (
        edges.join(F.broadcast(a2), "v")
        .groupBy("u")
        .agg(F.sum("s").alias("s"))
    )

    def top(df: DataFrame, node_col: str, side: str) -> DataFrame:
        return (
            df.orderBy(F.desc("s"), node_col)
            .limit(_HITS_TOPK)
            .select(
                F.lit(side).alias("side"),
                F.col(node_col).alias("node"),
                F.col("s").alias("score"),
            )
        )

    from pyspark.sql.window import Window

    w = Window.partitionBy("side").orderBy(F.desc("score"), "node")
    return (
        top(a2, "v", "auth")
        .unionAll(top(h2, "u", "hub"))
        .withColumn("rnk", F.row_number().over(w))
        .orderBy("side", "rnk")
    )


# ---------------------------------------------------------------------------
# E192: functional-dependency profiler (g3 violation measure)
# ---------------------------------------------------------------------------
# The data-profiling pass schema discovery runs before modeling a new
# source (TANE/FDEP families measure FD validity by g3 — the minimum
# fraction of rows to delete for the FD to hold = rows outside each
# LHS group's majority RHS). Five candidate FDs spanning the shapes
# that matter: a key LHS (holds), a composite LHS (high-confidence but
# violated — the fixture's (l_orderkey, l_linenumber) is NOT unique,
# which is exactly what a profiler is for), and three plausible-but-
# false business rules. Per FD: ONE two-level
# partial-agg cascade — (lhs, rhs) counts, then lhs-group rollup, then
# a 1-row summary; confidence is a single int/int division (portable
# by construction).

_FD_CANDIDATES = [
    ("orders_key_priority", "orders", ["o_orderkey"], "o_orderpriority"),
    ("lineitem_composite_part", "lineitem",
     ["l_orderkey", "l_linenumber"], "l_partkey"),
    ("customer_nation_segment", "customer", ["c_nationkey"], "c_mktsegment"),
    ("part_brand_type", "part", ["p_brand"], "p_type"),
    ("events_user_type", "events", ["user_id"], "event_type"),
]


def _fd_oracle() -> str:
    blocks = []
    for name, table, lhs, rhs in _FD_CANDIDATES:
        lhs_sql = ", ".join(lhs)
        blocks.append(f"""
SELECT '{name}' AS fd,
       SUM(n)::BIGINT AS n_rows,
       COUNT(*)::BIGINT AS n_groups,
       SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END)::BIGINT AS violating_groups,
       (SUM(n) - SUM(mx))::BIGINT AS g3_violations,
       ROUND(CAST(SUM(mx) AS DOUBLE) / SUM(n), 4) AS confidence,
       SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) = 0 AS holds
FROM (
  SELECT {lhs_sql}, SUM(c) AS n, MAX(c) AS mx, COUNT(*) AS k
  FROM (
    SELECT {lhs_sql}, {rhs}, COUNT(*) AS c
    FROM {table} GROUP BY {lhs_sql}, {rhs}
  ) GROUP BY {lhs_sql}
)""".strip())
    return "\nUNION ALL\n".join(blocks) + "\nORDER BY fd"


@register(
    "q_fd_profile",
    oracle=_fd_oracle(),
    doc="functional-dependency profiler (E192): g3 validity (rows "
    "outside each LHS group's majority RHS — the TANE/FDEP approximate-"
    "FD measure) for five candidate FDs incl. a key LHS, a composite "
    "LHS the fixture genuinely violates, and three false business "
    "rules — per FD one two-level partial-agg cascade, summary-sized "
    "output, confidence a single int/int division",
)
def q_fd_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for name, table, lhs, rhs in _FD_CANDIDATES:
        df = load_table(spark, sf_dir, table)
        cnt = df.groupBy(*lhs, rhs).agg(F.count("*").alias("c"))
        grp = cnt.groupBy(*lhs).agg(
            F.sum("c").alias("n"), F.max("c").alias("mx"),
            F.count("*").alias("k"),
        )
        viol = F.sum(F.when(F.col("k") > 1, 1).otherwise(0))
        row = grp.agg(
            F.lit(name).alias("fd"),
            F.sum("n").alias("n_rows"),
            F.count("*").alias("n_groups"),
            viol.alias("violating_groups"),
            (F.sum("n") - F.sum("mx")).alias("g3_violations"),
            F.round(F.sum("mx") / F.sum("n"), 4).alias("confidence"),
            (viol == 0).alias("holds"),
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("fd")


# ---------------------------------------------------------------------------
# E193: seasonal-naive forecast + MASE/sMAPE evaluation
# ---------------------------------------------------------------------------
# The forecast-evaluation companion to Holt smoothing (E139): the
# m=7 seasonal-naive forecast (y_hat(t) = y(t-7)) is THE baseline every
# real forecaster must beat, and MASE (Hyndman & Koehler 2006) is the
# scale-free score defined against it. Series = daily event counts per
# type, DENSIFIED over the full calendar (a missing day IS a zero).
# Integer discipline: counts and absolute errors are BIGINTs; MASE is
# one int-ratio division; sMAPE terms are integerized to micro-units
# PER TERM (single division each) and summed as BIGINTs — no
# multi-term float sum anywhere.

_MASE_TEST_DAYS = 7

_MASE_ORACLE = f"""
WITH bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS mn, MAX(CAST(ts AS DATE)) AS mx FROM events
),
days AS (
  SELECT CAST(UNNEST(generate_series(mn::TIMESTAMP, mx::TIMESTAMP,
                                     INTERVAL 1 DAY)) AS DATE) AS d
  FROM bounds
),
types AS (SELECT DISTINCT event_type FROM events),
grid AS (SELECT t.event_type, d.d FROM types t CROSS JOIN days d),
counts AS (
  SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
),
series AS (
  SELECT g.event_type, g.d, COALESCE(c.n, 0)::BIGINT AS n,
         DATEDIFF('day', b.mn, g.d) AS off, DATEDIFF('day', b.mn, b.mx) AS mxoff
  FROM grid g LEFT JOIN counts c
    ON c.event_type = g.event_type AND c.d = g.d
  CROSS JOIN bounds b
),
lagged AS (
  SELECT event_type, d, n, off, mxoff,
         LAG(n, 7) OVER (PARTITION BY event_type ORDER BY off) AS sn
  FROM series
),
scored AS (
  SELECT event_type,
         CASE WHEN off > mxoff - {_MASE_TEST_DAYS} THEN 'test'
              WHEN off >= 7 THEN 'train' END AS split,
         ABS(n - sn)::BIGINT AS ae,
         CASE WHEN n + sn = 0 THEN 0
              ELSE CAST(ROUND(2000000.0 * ABS(n - sn) / (n + sn), 0) AS BIGINT)
         END AS smape_micro
  FROM lagged WHERE sn IS NOT NULL
)
SELECT event_type,
       SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END)::BIGINT AS n_test,
       SUM(CASE WHEN split = 'test' THEN ae ELSE 0 END)::BIGINT AS test_abs_err,
       SUM(CASE WHEN split = 'train' THEN ae ELSE 0 END)::BIGINT AS train_abs_err,
       ROUND(CAST(SUM(CASE WHEN split = 'test' THEN ae ELSE 0 END)
                  * SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS DOUBLE)
             / NULLIF(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END)
                      * SUM(CASE WHEN split = 'train' THEN ae ELSE 0 END), 0),
             4) AS mase,
       SUM(CASE WHEN split = 'test' THEN smape_micro ELSE 0 END)::BIGINT
         AS test_smape_micro
FROM scored WHERE split IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q_seasonal_naive_mase",
    oracle=_MASE_ORACLE,
    doc="seasonal-naive forecast + MASE evaluation (E193, Hyndman & "
    "Koehler): m=7 naive forecast over calendar-densified daily event "
    "counts (missing day = 0), last 7 days held out; MASE = test MAE "
    "over in-sample seasonal-naive MAE as ONE int-ratio division, "
    "sMAPE integerized per term to micro-units and summed as BIGINT — "
    "the multi-term float-sum portability trap is designed out; one "
    "grouped scan + one lag window per series",
)
def q_seasonal_naive_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        "event_type", F.col("ts").cast("date").alias("d")
    )
    # calendar grid from one broadcast stats row (__mn <= __mx by
    # construction: MIN/MAX of the same non-empty column)
    bounds = daily.agg(
        F.min("d").alias("__mn"), F.max("d").alias("__mx")
    )
    days = bounds.select(
        F.explode(F.sequence("__mn", "__mx")).alias("d"), "__mn", "__mx"
    )
    types = daily.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(days))
    counts = daily.groupBy("event_type", "d").agg(F.count("*").alias("n"))
    series = (
        grid.join(counts, ["event_type", "d"], "left")
        .select(
            "event_type",
            F.datediff("d", "__mn").alias("off"),
            F.datediff("__mx", "__mn").alias("mxoff"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("off")
    lagged = series.withColumn("sn", F.lag("n", 7).over(w)).filter(
        F.col("sn").isNotNull()
    )
    split = F.when(
        F.col("off") > F.col("mxoff") - _MASE_TEST_DAYS, "test"
    ).when(F.col("off") >= 7, "train")
    ae = F.abs(F.col("n") - F.col("sn"))
    smape_micro = F.when(F.col("n") + F.col("sn") == 0, F.lit(0)).otherwise(
        F.round(2000000.0 * ae / (F.col("n") + F.col("sn")), 0).cast("long")
    )
    scored = lagged.select(
        "event_type", split.alias("split"), ae.alias("ae"),
        smape_micro.alias("smape_micro"),
    ).filter(F.col("split").isNotNull())
    t = F.when(F.col("split") == "test", F.col("ae")).otherwise(0)
    tr = F.when(F.col("split") == "train", F.col("ae")).otherwise(0)
    n_test = F.sum(F.when(F.col("split") == "test", 1).otherwise(0))
    n_train = F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
    return (
        scored.groupBy("event_type")
        .agg(
            n_test.alias("n_test"),
            F.sum(t).alias("test_abs_err"),
            F.sum(tr).alias("train_abs_err"),
            F.round(
                (F.sum(t) * n_train).cast("double")
                / F.nullif(n_test * F.sum(tr), F.lit(0)),
                4,
            ).alias("mase"),
            F.sum(
                F.when(F.col("split") == "test", F.col("smape_micro"))
                .otherwise(0)
            ).alias("test_smape_micro"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# E194: degree assortativity of the co-purchase graph
# ---------------------------------------------------------------------------
# Newman's r (2002): the Pearson correlation of endpoint degrees over
# directed edge stubs — THE one-number mixing diagnostic (hub-hub vs
# hub-leaf wiring) that decides whether degree-based partitioning salts
# well. Everything upstream of the final formula is INTEGER: degrees
# are counts, the five moment sums are BIGINT aggregates over the edge
# list (one broadcast degree join, one partial-agg scan), and r is
# computed once driver-side from those exact integers — identical
# IEEE ops on identical ints on both engines.

_ASSORT_ORACLE = """
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),
deg AS (SELECT u AS node, COUNT(*)::BIGINT AS d FROM edges GROUP BY u),
stubs AS (
  SELECT du.d AS x, dv.d AS y
  FROM edges e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
),
mom AS (
  SELECT COUNT(*)::BIGINT AS n, SUM(x)::BIGINT AS sx, SUM(y)::BIGINT AS sy,
         SUM(x * y)::BIGINT AS sxy, SUM(x * x)::BIGINT AS sxx,
         SUM(y * y)::BIGINT AS syy
  FROM stubs
)
SELECT n AS n_stubs,
       (SELECT COUNT(*)::BIGINT FROM deg) AS n_nodes,
       (SELECT MAX(d)::BIGINT FROM deg) AS max_deg,
       ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (SQRT(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * SQRT(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
             4) AS assortativity
FROM mom
"""


@register(
    "q_degree_assortativity",
    oracle=_ASSORT_ORACLE,
    doc="degree assortativity (E194, Newman 2002): Pearson r of "
    "endpoint degrees over both-direction co-purchase edge stubs "
    "(shared session pair graph) — integer degree moments via one "
    "broadcast degree join + one partial-agg scan, r formed once from "
    "the exact BIGINT sums; the mixing diagnostic that tells whether "
    "degree-keyed partitioning/salting will face hub-hub edges",
)
def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.queries.shared_graph import copurchase_symmetric

    edges = copurchase_symmetric(spark, sf_dir)
    deg = edges.groupBy(F.col("u").alias("node")).agg(
        F.count("*").alias("d")
    )
    stubs = (
        edges.join(
            F.broadcast(deg.select(F.col("node").alias("u"), F.col("d").alias("x"))),
            "u",
        )
        .join(
            F.broadcast(deg.select(F.col("node").alias("v"), F.col("d").alias("y"))),
            "v",
        )
        .select("x", "y")
    )
    mom = stubs.agg(
        F.count("*").alias("n"), F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).first()
    n_nodes, max_deg = deg.agg(
        F.count("*"), F.max("d")
    ).first()
    import math

    n, sx, sy = mom["n"], mom["sx"], mom["sy"]
    sxy, sxx, syy = mom["sxy"], mom["sxx"], mom["syy"]
    r = (float(n) * sxy - float(sx) * sy) / (
        math.sqrt(float(n) * sxx - float(sx) * sx)
        * math.sqrt(float(n) * syy - float(sy) * sy)
    )
    return spark.createDataFrame(
        [(n, n_nodes, max_deg, round(r, 4))],
        "n_stubs long, n_nodes long, max_deg long, assortativity double",
    )
