"""Relational widening, batch 4: statistical aggregates, data-quality
expectations, entity resolution, graph triangle counting, and session
path mining.

All DELEG/EXT surface (the reference extracts tables verbatim and leaves
analytics to its SQL backends — SURVEY §2.3/§2.10); each query here is a
first-class Spark built-in composition with a full DuckDB oracle.

Scale notes (100 TB):
- q_stats_agg is one partial-agg pass — co-moments (corr/covar/regr_*)
  are map-side combinable, the shuffle carries one row per group.
- q_expectations is one aggregation scan emitting every row-local
  constraint verdict, plus one broadcast-anti-join scan for the FK
  check — the Deequ-style pattern where N constraints don't mean N
  scans (two scans total, regardless of constraint count).
- q_fuzzy_match generates SymSpell deletion-neighborhood candidate keys
  ({name} plus its one-char deletions) and bucket-joins on
  (nation, variant): candidate pairs scale with the number of genuine
  near-duplicates, never with block size squared; levenshtein runs only
  on deduped candidates.
- q_triangle_count re-orients edges low-degree -> high-degree
  (compact-forward) so every node's wedge fanout is C(outdeg,2) with
  outdeg = O(sqrt(m)); hub vertices cannot produce quadratic wedge
  lists, and the degree lookup is a node-sized broadcast join.
- q_session_paths is the gaps-and-islands sessionizer: one window pass
  per user (shuffle on user_id), then a vocabulary-sized path rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.sources import load_table

# ---------------------------------------------------------------------------
# E27: statistical aggregates (corr / covar / stddev / linear regression)
# ---------------------------------------------------------------------------

_STATS_ORACLE = """
SELECT l_returnflag,
       COUNT(*)::BIGINT AS n,
       ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
       ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
       ROUND(stddev_samp(l_extendedprice), 4) AS std_price,
       ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       ROUND(regr_r2(l_extendedprice, l_quantity), 4) AS r2
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register(
    "q_stats_agg",
    oracle=_STATS_ORACLE,
    doc="statistical aggregate surface: corr/covar_samp/stddev_samp + "
    "regr_slope/intercept/r2 per group — all co-moment aggregates, "
    "map-side combinable, one shuffle row per group (EXT E27)",
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
                "covar_qty_price"
            ),
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
            F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias(
                "intercept"
            ),
            F.round(F.regr_r2("l_extendedprice", "l_quantity"), 4).alias("r2"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# E28: data-quality expectations (Deequ-style one-scan constraint report)
# ---------------------------------------------------------------------------
# The reference's only correctness guard is a row-count reconciliation
# (X7, src/dumpty/extract.py:36-38); this generalizes it to a constraint
# suite evaluated in ONE scan of the fact + a broadcast FK anti-join.

_EXPECT_ORACLE = """
WITH base AS (
  SELECT COUNT(*)::BIGINT AS total,
         SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS v_null,
         (COUNT(*) - COUNT(DISTINCT o_orderkey))::BIGINT AS v_unique,
         SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)::BIGINT AS v_range,
         SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END)::BIGINT AS v_set
  FROM orders
),
fk AS (
  SELECT COUNT(*)::BIGINT AS v_fk
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_custkey IS NULL
)
SELECT constraint_name, violations, total,
       violations = 0 AS passed
FROM (
  SELECT 'not_null:o_custkey' AS constraint_name, v_null AS violations, total FROM base
  UNION ALL
  SELECT 'unique:o_orderkey', v_unique, total FROM base
  UNION ALL
  SELECT 'range:o_totalprice>0', v_range, total FROM base
  UNION ALL
  SELECT 'in_set:o_orderstatus', v_set, total FROM base
  UNION ALL
  SELECT 'fk:o_custkey->customer', v_fk, (SELECT total FROM base) FROM fk
)
ORDER BY constraint_name
"""


@register(
    "q_expectations",
    oracle=_EXPECT_ORACLE,
    doc="data-quality expectation suite: null/unique/range/set/FK "
    "constraints as one aggregation scan (stacked agg) plus one "
    "broadcast-anti-join scan for the FK check — the reference's X7 "
    "row-count guard generalized to declarative checks (EXT E28)",
)
def q_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    base = orders.agg(
        F.count("*").alias("total"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("v_null"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("v_unique"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("v_range"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("v_set"),
    )
    # FK violations: orders whose customer key has no match — broadcast
    # the dim (it is the small side by star-schema construction).
    fk = (
        orders.join(
            F.broadcast(customer.select("c_custkey")),
            orders.o_custkey == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count("*").alias("v_fk"))
    )
    report = base.crossJoin(fk).select(
        F.expr(
            "stack(5, "
            "'not_null:o_custkey', v_null, "
            "'unique:o_orderkey', v_unique, "
            "'range:o_totalprice>0', v_range, "
            "'in_set:o_orderstatus', v_set, "
            "'fk:o_custkey->customer', v_fk) AS (constraint_name, violations)"
        ),
        "total",
    )
    return report.select(
        "constraint_name",
        F.col("violations").cast("long").alias("violations"),
        "total",
        (F.col("violations") == 0).alias("passed"),
    ).orderBy("constraint_name")


# ---------------------------------------------------------------------------
# E29: entity resolution — blocked Levenshtein matching
# ---------------------------------------------------------------------------

_FUZZY_ORACLE = """
SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
       a.c_name AS name_a, b.c_name AS name_b,
       levenshtein(a.c_name, b.c_name)::INT AS dist
FROM customer a
JOIN customer b
  ON a.c_nationkey = b.c_nationkey
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
ORDER BY custkey_a, custkey_b
"""


@register(
    "q_fuzzy_match",
    oracle=_FUZZY_ORACLE,
    doc="entity resolution: candidate duplicate identities via "
    "deletion-neighborhood (SymSpell) blocking + Levenshtein<=1 verify — "
    "each name emits its |name|+1 one-char-deletion variants; two names "
    "within edit distance 1 ALWAYS share a variant, so candidates are "
    "bucket-joined on (nation, variant) instead of compared all-pairs "
    "per block (EXT E29)",
)
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 pair mining that stays near-linear at scale.

    Soundness of the candidate key: for strings a, b with
    levenshtein(a,b) <= 1, one of the following holds —
      * a == b                 -> share the identity variant;
      * b deletes one char of a -> b is in D1(a) and is its own identity
        variant;
      * b substitutes one char of a at position i -> deleting position i
        from both yields the same string, so D1(a) ∩ D1(b) != ∅.
    Hence joining on the exploded variant key D1(name) = {name} ∪
    {name minus one char} loses no true pair, and the exact
    ``levenshtein`` filter afterwards discards false candidates.  Bucket
    sizes are O(near-duplicate cluster), not O(block), so the plan is
    candidate-bounded: at 100x customers the work grows with the number
    of genuine near-dup pairs, not with (n/25)^2 as the old per-nation
    cartesian did.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    name = F.col("c_name")
    # one-char-deletion variants: position i in [1, len] removed. The
    # when() guard keeps sequence(1, 0) unreachable — Spark's sequence
    # errors (positive step) or descends (inferred step) when lo > hi.
    deletions = F.when(
        F.length(name) > 0,
        F.transform(
            F.sequence(F.lit(1), F.length(name), F.lit(1)),
            lambda i: F.concat(
                name.substr(F.lit(1), i - F.lit(1)),
                name.substr(i + F.lit(1), F.length(name) - i),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    keyed = cust.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.explode(F.array_union(F.array(name), deletions)).alias("vkey"),
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.vkey") == F.col("b.vkey"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("custkey_a"),
            F.col("b.c_custkey").alias("custkey_b"),
            F.col("a.c_name").alias("name_a"),
            F.col("b.c_name").alias("name_b"),
        )
        # a pair can share several variants (e.g. equal names) — dedup
        # before the exact verify so levenshtein runs once per pair.
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 1)
        .select(
            "custkey_a",
            "custkey_b",
            "name_a",
            "name_b",
            F.col("dist").cast("int").alias("dist"),
        )
        .orderBy("custkey_a", "custkey_b")
    )


# ---------------------------------------------------------------------------
# E30: triangle counting + global clustering coefficient
# ---------------------------------------------------------------------------
# Completes the graph family (E11 connected components, E26 PageRank)
# with the classic one-round triangle count: orient every co-purchase
# edge u<v, build wedges by joining edge lists on the middle vertex, and
# close them against the edge set. Exactly three relational joins — no
# iteration — so the whole thing is oracle-checkable SQL.

_TRIANGLE_ORACLE = """
WITH pr AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM pr a JOIN pr b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT node, COUNT(*)::BIGINT AS d
  FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
  GROUP BY node
),
tri AS (
  SELECT COUNT(*)::BIGINT AS n_triangles
  FROM e e1 JOIN e e2 ON e2.u = e1.v JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
),
wed AS (SELECT SUM((d * (d - 1)) // 2)::BIGINT AS n_wedges FROM deg)
SELECT n_triangles, n_wedges,
       ROUND(3.0 * n_triangles / n_wedges, 6) AS global_clustering
FROM tri, wed
"""


@register(
    "q_triangle_count",
    oracle=_TRIANGLE_ORACLE,
    doc="triangle count + global clustering coefficient on the part "
    "co-purchase graph: edges re-oriented low-degree -> high-degree "
    "(compact-forward), wedge join on the middle vertex, closure join "
    "against the oriented edge set — per-node wedge fanout is bounded "
    "by out-degree <= O(sqrt(m)), so hub vertices cannot explode the "
    "join (EXT E30)",
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compact-forward triangle counting.

    The undirected edge set is first built as canonical (u<v) pairs,
    then every edge is RE-oriented from its lower-(degree, id) endpoint
    to its higher-(degree, id) endpoint.  Under that total order each
    triangle a<b<c has exactly the oriented edges a->b, b->c, a->c, so
    the wedge join (e1.dst == e2.src) plus one closure join counts each
    triangle exactly once — and every node's wedge fanout is
    C(outdeg, 2) with outdeg = O(sqrt(m)) under degree ordering, the
    standard bound that keeps skewed co-purchase hubs from producing
    quadratic wedge lists.  The degree table is node-sized (small
    relative to edges) and broadcast-joined onto the edge list, so
    re-orientation adds no extra shuffle.
    """
    from dumpty_spark.queries.shared_graph import copurchase_symmetric

    # 1. undirected adjacency from the session-shared canonical pair
    #    graph (shared_graph.copurchase_pairs — the identical distinct
    #    u<v edge set pagerank/kcore/LPA/BFS analyze), regrouped by
    #    node.  The adjacency groupBy is CPU-bound (collect_list over
    #    wide groups); an explicit hash repartition on the grouping key
    #    pins the stage at full parallelism — AQE's size-based
    #    coalescing otherwise shrinks these small-byte/heavy-CPU
    #    shuffles to a few tasks (measured 2x slower). Same exchange
    #    either way: the partitioning matches the groupBy key.
    width = spark.sparkContext.defaultParallelism
    und = (
        copurchase_symmetric(spark, sf_dir)
        .select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .repartition(width, "node")
        .groupBy("node")
        # pairs are already globally distinct, so collect_list suffices
        .agg(F.collect_list("nbr").alias("nbrs"))
        .withColumn("d", F.size("nbrs"))
        # node-sized (one row per part); feeds the degree broadcast, the
        # wedge count, and the orientation explode — materialize once.
        .localCheckpoint()
    )
    # 2. orient each edge from the lower-(degree, id) endpoint to the
    #    higher one ((d, node) is a total order, so orientation is
    #    acyclic) and regroup into out-neighbor (N+) adjacency.  The
    #    degree lookup for the far endpoint is a node-sized 2-column
    #    broadcast join; out-degrees are O(sqrt(m)) under this ordering.
    #    Broadcast only below the same node-count bound graph.py uses —
    #    at billion-node scale these become ordinary shuffle joins.
    n_nodes = und.count()  # cheap: und is checkpointed, node-sized
    maybe_bcast = F.broadcast if n_nodes < 5_000_000 else (lambda df: df)
    deg_map = maybe_bcast(
        und.select(F.col("node").alias("nbr"), F.col("d").alias("d_nbr"))
    )
    node_first = (F.col("d") < F.col("d_nbr")) | (
        (F.col("d") == F.col("d_nbr")) & (F.col("node") < F.col("nbr"))
    )
    adjp = (
        und.select("node", "d", F.explode("nbrs").alias("nbr"))
        .join(deg_map, "nbr")
        .filter(node_first)
        .repartition(width, "node")
        .groupBy("node")
        .agg(F.collect_list("nbr").alias("nbrs_p"))
        .localCheckpoint()
    )
    # 3. edge-iterator count: a triangle with rank order a<b<c
    #    contributes exactly one hit — c in N+(a) ∩ N+(b) for the edge
    #    (a,b) — so summing |N+(x) ∩ N+(y)| over oriented edges (x,y)
    #    counts each triangle once.  Exploding x's own N+ list yields
    #    the oriented edges WITH nbrs_x already attached, so only one
    #    adjacency join remains; wedge lists are never materialized.
    elem_t = und.schema["nbrs"].dataType.elementType.simpleString()
    a_y = maybe_bcast(
        adjp.select(F.col("node").alias("_y"), F.col("nbrs_p").alias("nbrs_y"))
    )
    tri = (
        adjp.select(F.col("nbrs_p").alias("nbrs_x"), F.explode("nbrs_p").alias("y"))
        # rank-maximal nodes have no N+ row: left join + empty fallback
        .join(a_y, F.col("y") == F.col("_y"), "left")
        .select(
            F.size(
                F.array_intersect(
                    "nbrs_x",
                    F.coalesce(
                        F.col("nbrs_y"),
                        F.expr(f"cast(array() as array<{elem_t}>)"),
                    ),
                )
            ).alias("c")
        )
        .agg(F.sum("c").alias("n_triangles"))
    )
    wedges = und.agg(F.sum(F.expr("d * (d - 1) div 2")).alias("n_wedges"))
    return tri.crossJoin(wedges).select(
        "n_triangles",
        "n_wedges",
        F.round(3.0 * F.col("n_triangles") / F.col("n_wedges"), 6).alias(
            "global_clustering"
        ),
    )


# ---------------------------------------------------------------------------
# E31: sessionization + path mining (gaps-and-islands)
# ---------------------------------------------------------------------------

_SESSION_GAP_S = 1800  # 30-minute inactivity ends a session

_PATHS_ORACLE = f"""
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > {_SESSION_GAP_S}
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess
  FROM e
),
p AS (
  SELECT user_id, sess,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM s GROUP BY user_id, sess
)
SELECT path, COUNT(*)::BIGINT AS n_sessions
FROM p GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT 20
"""


@register(
    "q_session_paths",
    oracle=_PATHS_ORACLE,
    doc="batch sessionization (gaps-and-islands, 30-min inactivity gap) "
    "+ top-20 session event paths: one window pass shuffled on user_id, "
    "then a path-vocabulary-sized rollup (EXT E31)",
)
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # epoch seconds as double on BOTH sides (DuckDB epoch()); ts is
    # TIMESTAMP_NTZ, which has no direct double cast — route through
    # timestamp under the pinned-UTC session TZ so values equal DuckDB's
    # naive epoch, sub-second gaps included
    epoch = lambda c: F.col(c).cast("timestamp").cast("double")  # noqa: E731
    sess = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_s",
            F.when(
                F.col("prev_ts").isNull()
                | (epoch("ts") - epoch("prev_ts") > _SESSION_GAP_S),
                1,
            ).otherwise(0),
        )
        .withColumn("sess", F.sum("new_s").over(w))
    )
    paths = sess.groupBy("user_id", "sess").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(20)
    )
