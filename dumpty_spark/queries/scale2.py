"""Round-2 scale-pattern queries: bloom-prefiltered join, market-basket
co-occurrence, snapshot diff, feature scaling, per-stratum exact-k,
windowed trending, and PageRank centrality."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.operators import sampling as SM
from dumpty_spark.queries import register
from dumpty_spark.sources import load_table

# ---------------------------------------------------------------------------
# Bloom-prefiltered semi join (operators/bloom.py). The bloom is a
# transparent physical optimization — the oracle is the PLAIN semi join.

_BLOOM_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 4500)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "q_bloom_prefilter_join",
    oracle=_BLOOM_ORACLE,
    doc="bloom-prefiltered semi join: dim keys folded into a 2^16-bit "
    "pure-Column bloom (xxhash64 x5, bit_or bitmap) evaluated map-side on "
    "the fact BEFORE the exchange; exact semi join removes false positives "
    "so the oracle is the plain join (EXT — the runtime semi-join filter "
    "BigQuery would apply for the reference's downstream joins)",
)
def q_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators.bloom import bloom_prefilter_semi_join

    orders = load_table(spark, sf_dir, "orders")
    rich = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 4500)
    hit = bloom_prefilter_semi_join(orders, rich, "o_custkey", "c_custkey")
    return (
        hit.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Market-basket co-occurrence with support + lift. Pairs are generated
# MAP-SIDE from each order's sorted part set via array HOFs — never a
# basket self-join (which shuffles the fact twice and explodes skewed
# orders quadratically on one task *before* filtering). The only
# shuffles are the basket groupBy and the small pair-count aggs.

_COOC_ORACLE = """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM b),
items AS (SELECT l_partkey, COUNT(*) AS n FROM b GROUP BY 1),
co AS (
  SELECT x.l_partkey AS part_a, y.l_partkey AS part_b, COUNT(*) AS n_co
  FROM b x JOIN b y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  GROUP BY 1, 2
)
SELECT co.part_a, co.part_b, co.n_co,
       ROUND(1.0 * co.n_co * tot.n / (ia.n * ib.n), 6) AS lift
FROM co, tot
JOIN items ia ON ia.l_partkey = co.part_a
JOIN items ib ON ib.l_partkey = co.part_b
WHERE co.n_co >= 3
ORDER BY co.part_a, co.part_b
"""


@register(
    "q_part_cooccurrence",
    oracle=_COOC_ORACLE,
    doc="market-basket co-occurrence: per-order part sets, map-side pair "
    "generation via array HOFs (no basket self-join), support>=3 gate, "
    "lift vs independence from broadcast item counts (EXT — association "
    "mining over the fact table)",
)
def q_part_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(parts, (x, i) -> "
                "transform(slice(parts, i + 2, size(parts)), "
                "y -> struct(x AS part_a, y AS part_b))))"
            )
        ).alias("p")
    ).select("p.part_a", "p.part_b")
    co = (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_co"))
        .filter(F.col("n_co") >= 3)
    )
    items = baskets.select(F.explode("parts").alias("pk")).groupBy("pk").agg(
        F.count("*").alias("n")
    )
    tot = baskets.agg(F.count("*").alias("n_orders"))
    return (
        co.join(F.broadcast(items.withColumnRenamed("pk", "part_a")
                            .withColumnRenamed("n", "n_a")), "part_a")
        .join(F.broadcast(items.withColumnRenamed("pk", "part_b")
                          .withColumnRenamed("n", "n_b")), "part_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "n_co",
            F.round(
                F.lit(1.0) * F.col("n_co") * F.col("n_orders")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy("part_a", "part_b")
    )


# ---------------------------------------------------------------------------
# Snapshot diff (operators/diff.py). The "new" snapshot is derived from
# orders with deterministic mutations so the oracle can rebuild it:
# keys %97==0 deleted, %101==0 repriced, %89==0 cloned to key+10^7.

_DIFF_ORACLE = """
WITH newsnap AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderkey % 101 = 0
              THEN ROUND(o_totalprice * 1.1, 2) ELSE o_totalprice END
           AS o_totalprice
  FROM orders WHERE o_orderkey % 97 != 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 89 = 0
),
oldsnap AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
)
SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
       CASE WHEN o.o_orderkey IS NULL THEN 'added'
            WHEN n.o_orderkey IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM oldsnap o FULL OUTER JOIN newsnap n USING (o_orderkey)
WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
   OR o.o_custkey IS DISTINCT FROM n.o_custkey
   OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
   OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
ORDER BY o_orderkey
"""


@register(
    "q_table_diff",
    oracle=_DIFF_ORACLE,
    doc="snapshot diff: keyed added/removed/changed via one full-outer "
    "join + NULL-safe struct compare — the reference's row-count "
    "reconciliation (X7, extract.py:36-38) generalized to per-key audit",
)
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators.diff import snapshot_diff

    old = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    new = (
        old.filter(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 101 == 0,
                F.round(F.col("o_totalprice") * 1.1, 2),
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            old.filter(F.col("o_orderkey") % 89 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(10000000)
            )
        )
    )
    return snapshot_diff(old, new, ["o_orderkey"]).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# Feature scaling: per-segment min-max + z-score in one stats pass. The
# stats frame is segments-sized (tiny) -> broadcast join, scaling is
# map-side; at 100 TB this is one partial-agg shuffle + one scan.

_SCALE_ORACLE = """
WITH stats AS (
  SELECT c_mktsegment,
         MIN(c_acctbal) AS mn, MAX(c_acctbal) AS mx,
         AVG(c_acctbal) AS mu, STDDEV_POP(c_acctbal) AS sd
  FROM customer GROUP BY 1
)
SELECT c.c_custkey, c.c_mktsegment,
       ROUND(CASE WHEN s.mx = s.mn THEN 0.0
                  ELSE (c.c_acctbal - s.mn) / (s.mx - s.mn) END, 6)
         AS minmax_scaled,
       ROUND(CASE WHEN s.sd = 0 THEN 0.0
                  ELSE (c.c_acctbal - s.mu) / s.sd END, 6) AS zscore
FROM customer c JOIN stats s USING (c_mktsegment)
ORDER BY c.c_custkey
"""


@register(
    "q_minmax_scale",
    oracle=_SCALE_ORACLE,
    doc="per-group feature scaling (min-max + z-score) via one "
    "partial-agg stats pass broadcast back onto the scan — the "
    "normalization step of feature pipelines, zero-variance guarded",
)
def q_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    stats = cust.groupBy("c_mktsegment").agg(
        F.min("c_acctbal").alias("mn"),
        F.max("c_acctbal").alias("mx"),
        F.avg("c_acctbal").alias("mu"),
        F.stddev_pop("c_acctbal").alias("sd"),
    )
    return (
        cust.join(F.broadcast(stats), "c_mktsegment")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.round(
                F.when(F.col("mx") == F.col("mn"), F.lit(0.0)).otherwise(
                    (F.col("c_acctbal") - F.col("mn")) / (F.col("mx") - F.col("mn"))
                ),
                6,
            ).alias("minmax_scaled"),
            F.round(
                F.when(F.col("sd") == 0, F.lit(0.0)).otherwise(
                    (F.col("c_acctbal") - F.col("mu")) / F.col("sd")
                ),
                6,
            ).alias("zscore"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Per-stratum exact-k draw (operators/sampling.py).

_STRAT_K_ORACLE = f"""
SELECT doc_id, lang
FROM documents
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY lang
  ORDER BY {SM.bucket_sql(['doc_id'])}, doc_id
) <= 25
ORDER BY doc_id
"""


@register(
    "q_sample_stratified_k",
    oracle=_STRAT_K_ORACLE,
    doc="EXACTLY k docs per language via hash-ranked per-stratum window "
    "(fixed-size eval-set draw; rare strata never starved) — "
    "partition-invariant, sort bounded by largest stratum (E7)",
)
def q_sample_stratified_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        SM.sample_stratified_k(docs, ["lang"], ["doc_id"], 25)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Trending: per-hour top-3 event types by count — the windowed heavy
# hitter feed. Counts shuffle on (hour, type); ranking is a per-hour
# window over a 3-row-ish group, never a global sort.

_TRENDING_ORACLE = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
       event_type, n, rnk
FROM (
  SELECT h, event_type, n,
         ROW_NUMBER() OVER (PARTITION BY h ORDER BY n DESC, event_type) AS rnk
  FROM hourly
)
WHERE rnk <= 3
ORDER BY hour, rnk
"""


@register(
    "q_trending_events",
    oracle=_TRENDING_ORACLE,
    doc="per-hour top-3 trending event types: bucketed counts + "
    "partitioned ranking window (deterministic count-then-name "
    "tie-break) — the windowed heavy-hitters feed",
)
def q_trending_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("h").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        hourly.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n",
            "rnk",
        )
        .orderBy("hour", "rnk")
    )


# ---------------------------------------------------------------------------
# PageRank centrality of parts in the co-purchase graph. The iteration
# count is FIXED (8), so the power iteration is SQL-expressible after
# all: recursive CTEs can't aggregate over the recursive term, but a
# fixed-depth loop unrolls into 8 chained plain CTEs (r1..r8), each one
# grouped-sum of contributions over the previous. The co-purchase graph
# is symmetric, so there is no dangling mass and each step is exactly
# rank' = 0.15/N + 0.85 * sum(rank(in-nbr)/deg(in-nbr)).  numpy-exact
# parity is additionally asserted in tests/test_graph.py.


def _pagerank_oracle(n_iter: int = 8, damping: float = 0.85) -> str:
    head = """
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
deg AS (SELECT src AS id, COUNT(*)::DOUBLE AS deg FROM edges GROUP BY 1),
nn AS (SELECT COUNT(*)::DOUBLE AS n FROM deg),
r0 AS (SELECT id, deg, (SELECT 1.0 / n FROM nn) AS rank FROM deg)"""
    steps = []
    for k in range(1, n_iter + 1):
        steps.append(
            f""",
r{k} AS (
  SELECT d.id, d.deg,
         (SELECT {1.0 - damping} / n FROM nn)
         + {damping} * COALESCE(c.c, 0) AS rank
  FROM deg d LEFT JOIN (
    SELECT e.dst AS id, SUM(p.rank / p.deg) AS c
    FROM edges e JOIN r{k - 1} p ON p.id = e.src
    GROUP BY e.dst
  ) c ON c.id = d.id
)"""
        )
    tail = f"""
SELECT id AS part, ROUND(rank, 8) AS rank
FROM r{n_iter}
ORDER BY ROUND(rank, 8) DESC, part
LIMIT 50"""
    return head + "".join(steps) + tail


@register(
    "q_pagerank_parts",
    oracle=_pagerank_oracle(),
    doc="PageRank over the part co-purchase graph (edges = parts sharing "
    "an order): 8 fixed power iterations, dangling-mass redistribution, "
    "two-regime like CC — numpy bincount mat-vecs driver-side below a "
    "5M-edge gate, fused one-shuffle-per-round Pregel loop above it "
    "(distributed path test-forced); full DuckDB oracle via an unrolled "
    "8-step CTE chain + numpy-exact parity in tests",
)
def q_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators.graph import pagerank
    from dumpty_spark.queries.shared_graph import copurchase_pairs

    # the pair graph is a session-shared artifact (shared_graph.py) —
    # the same distinct (u<v) pairs every graph query here analyzes
    pairs = copurchase_pairs(spark, sf_dir).select(
        F.col("u").alias("a"), F.col("v").alias("b")
    )
    edges = pairs.union(pairs.select(F.col("b").alias("a"), F.col("a").alias("b")))
    pr = pagerank(edges, "a", "b", damping=0.85, n_iter=8)
    return pr.select(
        F.col("id").alias("part"), F.round("rank", 8).alias("rank")
    ).orderBy(F.desc("rank"), "part").limit(50)


# ---------------------------------------------------------------------------
# Robust outliers: median/MAD per event type. Two grouped exact-median
# passes (stats frame is types-sized -> broadcast back), outlier gate at
# the conventional 3 robust sigmas (MAD * 1.4826).

_MAD_ORACLE = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY 1
),
mad AS (
  SELECT e.event_type, ANY_VALUE(m.med) AS med,
         quantile_cont(ABS(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type
)
SELECT e.event_type,
       COUNT(*) AS n,
       ROUND(ANY_VALUE(m.med), 4) AS med,
       ROUND(ANY_VALUE(m.mad), 4) AS mad,
       SUM(CASE WHEN ABS(e.value - m.med) > 3 * 1.4826 * m.mad
                THEN 1 ELSE 0 END)::BIGINT AS n_outliers
FROM events e JOIN mad m USING (event_type)
GROUP BY e.event_type
ORDER BY e.event_type
"""


@register(
    "q_mad_outliers",
    oracle=_MAD_ORACLE,
    doc="robust outlier detection per event type: exact median + MAD "
    "(two grouped interpolated-median passes, types-sized stats "
    "broadcast back), 3-robust-sigma gate — the heavy-tail-safe "
    "anomaly screen (swap median -> approx_percentile at 10^9+ rows "
    "per group, same shape)",
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("med").alias("med"),
            F.median(F.abs(F.col("value") - F.col("med"))).alias("mad"),
        )
    )
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.any_value("med"), 4).alias("med"),
            F.round(F.any_value("mad"), 4).alias("mad"),
            F.sum(
                (
                    F.abs(F.col("value") - F.col("med"))
                    > 3 * 1.4826 * F.col("mad")
                ).cast("bigint")
            ).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


_BLOOM_LOOKUP_ORACLE = """
SELECT event_id, user_id, event_type
FROM events
WHERE event_id IN (1, 2, 3, 4, 5)
ORDER BY event_id
"""


@register(
    "q_file_bloom_lookup",
    oracle=_BLOOM_LOOKUP_ORACLE,
    doc="file-level Bloom skipping index (E48). events written clustered "
    "on ts (so the lookup key is unclustered and min-max cannot skip), a "
    "per-file Bloom sidecar built in one pass, then a point lookup that "
    "reads only candidate files — provably identical to the full scan, "
    "which is exactly what the oracle checks",
)
def q_file_bloom_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from dumpty_spark.operators.bloom import (
        file_bloom_index_build,
        file_bloom_lookup,
    )
    from dumpty_spark.session import warehouse_scratch

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    tmp = warehouse_scratch(spark, "bloomidx")
    try:
        data = f"{tmp}/events"
        ev.repartitionByRange(8, "ts").write.parquet(data)
        file_bloom_index_build(spark, data, "event_id", f"{tmp}/idx")
        return (
            file_bloom_lookup(
                spark, data, f"{tmp}/idx", "event_id", [1, 2, 3, 4, 5]
            )
            .select("event_id", "user_id", "event_type")
            .orderBy("event_id")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# E50: k-core of the part co-occurrence graph
# ---------------------------------------------------------------------------
_KCORE_K = 80
_KCORE_PEELS = 10  # fixpoint measured at 6 peels (both SFs); extras no-op


def _kcore_oracle() -> str:
    ctes = [
        "e0 AS MATERIALIZED (SELECT DISTINCT l1.l_partkey AS u, l2.l_partkey AS v "
        "FROM lineitem l1 JOIN lineitem l2 "
        "ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey)"
    ]
    prev = "e0"
    for i in range(1, _KCORE_PEELS + 1):
        ctes.append(
            f"k{i} AS MATERIALIZED (SELECT u AS id FROM "
            f"(SELECT u FROM {prev} UNION ALL SELECT v FROM {prev}) "
            f"GROUP BY u HAVING COUNT(*) >= {_KCORE_K})"
        )
        ctes.append(
            f"e{i} AS MATERIALIZED (SELECT u, v FROM {prev} "
            f"WHERE u IN (SELECT id FROM k{i}) AND v IN (SELECT id FROM k{i}))"
        )
        prev = f"e{i}"
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT id, COUNT(*)::BIGINT AS degree
FROM (SELECT u AS id FROM {prev} UNION ALL SELECT v FROM {prev})
GROUP BY id ORDER BY id"""
    )


@register(
    "q_kcore_parts",
    oracle=_kcore_oracle(),
    doc=f"k-core (k={_KCORE_K}) of the part co-occurrence graph (E50): "
    "iterative shell peeling — degree count + semi-join filter per "
    "round, lineage-truncated; the structural density filter that "
    "separates well-embedded nodes from the long tail (and spam farms "
    "from organic link mass). Oracle = the peeling recurrence unrolled "
    f"{_KCORE_PEELS} rounds in SQL, exact because extra peels are no-ops",
)
def q_kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators.kcore import kcore
    from dumpty_spark.queries.shared_graph import copurchase_pairs

    pairs = copurchase_pairs(spark, sf_dir).select(
        F.col("u").alias("a"), F.col("v").alias("b")
    )
    return kcore(pairs, _KCORE_K, "a", "b").orderBy("id")


from dumpty_spark.queries.dedup import _JACCARD_EDGE_CTES  # noqa: E402

# ---------------------------------------------------------------------------
# E106: pair-graph health — degree stats, power-law MLE, assortativity
# ---------------------------------------------------------------------------
# The graph-health check before any of E11/E21/E26/E50 runs, in ONE
# pair-graph build: the degree profile says whether the near-dup graph
# is clique-ish (dedup-friendly) or hub-dominated (a viral shingle —
# skew ahead); the discrete power-law MLE alpha = 1 + n/Σ ln(d/(dmin−½))
# (Clauset-Shalizi-Newman 2009, public literature) quantifies the tail;
# degree assortativity (Newman 2002 — Pearson corr of endpoint degrees
# over the symmetrized edges) warns of star structure, the exact case
# the df-capping and salting knobs exist for. Edges are built once and
# checkpointed; degrees are one partial-agg count broadcast back.

_GRAPH_HEALTH_ORACLE = f"""
WITH {_JACCARD_EDGE_CTES},
edges AS (
  SELECT a_id, b_id
  FROM pairs
  JOIN counts ca ON ca.doc_id = a_id
  JOIN counts cb ON cb.doc_id = b_id
  WHERE ROUND(common::DOUBLE / (ca.n_sh + cb.n_sh - common), 4) >= 0.5
),
sym AS (
  SELECT a_id AS src, b_id AS dst FROM edges
  UNION ALL SELECT b_id, a_id FROM edges
),
deg AS (SELECT src AS node, COUNT(*)::DOUBLE AS d FROM sym GROUP BY src),
fit AS (SELECT COUNT(*)::DOUBLE AS n, MIN(d) AS dmin FROM deg),
degstats AS (
  SELECT f.n::BIGINT AS n_nodes,
         f.dmin::BIGINT AS min_degree,
         MAX(deg.d)::BIGINT AS max_degree,
         ROUND(AVG(deg.d), 4) AS mean_degree,
         ROUND(1.0 + f.n / SUM(LN(deg.d / (f.dmin - 0.5))), 4) AS alpha_mle
  FROM deg CROSS JOIN fit f
  GROUP BY f.n, f.dmin
),
assort AS (
  SELECT COUNT(*)::BIGINT AS n_directed_edges,
         ROUND(CORR(da.d, db.d), 4) AS assortativity
  FROM sym
  JOIN deg da ON da.node = sym.src
  JOIN deg db ON db.node = sym.dst
)
SELECT d.n_nodes, a.n_directed_edges, d.min_degree, d.max_degree,
       d.mean_degree, d.alpha_mle, a.assortativity
FROM degstats d CROSS JOIN assort a
"""


@register(
    "q_pair_graph_health",
    oracle=_GRAPH_HEALTH_ORACLE,
    doc="pair-graph health (E106): degree profile, Clauset-Shalizi-"
    "Newman power-law MLE alpha = 1 + n/Σln(d/(dmin−½)), and Newman "
    "degree assortativity of the 3-gram Jaccard pair graph (threshold "
    "0.5 so a tail exists) — ONE edge build (checkpointed), degrees as "
    "one partial-agg count joined back (node-sized, never forced "
    "broadcast); the hub-dominance early "
    "warning before E11/E26/E50 run",
)
def q_pair_graph_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators import dedup as D
    from dumpty_spark.sources.parquet import load_table as _lt

    from dumpty_spark.queries.shared_graph import jaccard_pair_graph

    # one (session-shared) shingle-join build feeds every stat below
    edges = jaccard_pair_graph(spark, sf_dir, threshold=0.5).select(
        "a_id", "b_id"
    )
    sym = edges.unionAll(
        edges.select(F.col("b_id").alias("a_id"), F.col("a_id").alias("b_id"))
    ).toDF("src", "dst")
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("double").alias("d")
    )
    fit = deg.agg(
        F.count(F.lit(1)).cast("double").alias("n"), F.min("d").alias("dmin")
    )
    degstats = (
        deg.crossJoin(F.broadcast(fit))
        .groupBy("n", "dmin")
        .agg(
            F.max("d").cast("long").alias("max_degree"),
            F.round(F.avg("d"), 4).alias("mean_degree"),
            F.round(
                1.0
                + F.first("n")
                / F.sum(F.log(F.col("d") / (F.col("dmin") - 0.5))),
                4,
            ).alias("alpha_mle"),
        )
        .select(
            F.col("n").cast("long").alias("n_nodes"),
            F.col("dmin").cast("long").alias("min_degree"),
            "max_degree",
            "mean_degree",
            "alpha_mle",
        )
    )
    # the degree frame is NODE-sized, not metadata-sized — no forced
    # broadcast (at the corpus scales this early-warning runs at, that
    # would exceed the broadcast limit exactly where a plain shuffle
    # join works); AQE may still choose to broadcast a small one
    da = deg.select(F.col("node").alias("src"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("dst"), F.col("d").alias("db"))
    assort = (
        sym.join(da, "src")
        .join(db, "dst")
        .agg(
            F.count(F.lit(1)).alias("n_directed_edges"),
            F.round(F.corr("da", "db"), 4).alias("assortativity"),
        )
    )
    return degstats.crossJoin(F.broadcast(assort)).select(
        "n_nodes", "n_directed_edges", "min_degree", "max_degree",
        "mean_degree", "alpha_mle", "assortativity",
    )
