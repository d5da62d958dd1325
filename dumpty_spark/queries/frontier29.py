"""Round-8 engine extensions, fourth batch (EXT E199-E202): grid
DBSCAN, split-conformal intervals, propensity-stratified ATT, and
frequent triples.

Portability: the DBSCAN surface is ALL integers (cell counts, cluster
counts) downstream of one exact-by-construction projection (Rademacher
±1 products are sign flips, left-fold sums in list order on both
engines); conformal residuals live on a 1e-6 grid with disc-quantile
element picks; ATT terms integerize to micro-units per stratum; triples
are pure counts.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E199: grid DBSCAN (cell-based density clustering)
# ---------------------------------------------------------------------------
# The scalable DBSCAN formulation: project to 2D (seeded Rademacher JL,
# the E3f machinery), bucket into eps-cells, and do ALL density work on
# the CELL frame — neighborhood mass via a 9-offset map-side explode,
# core cells by a minPts threshold, clusters as connected components of
# the core-cell adjacency graph. Point pairs are NEVER enumerated: the
# per-point work is one projection + one cell key, and every downstream
# frame is bounded by the grid extent (<= (range/eps)^2 cells for
# unit-norm data) regardless of corpus size — the property that makes
# this the 100 TB density-clustering shape while classic DBSCAN's
# eps-neighbor join is quadratic. On this fixture the embeddings are a
# single isotropic blob (measured: same-label and cross-label cosines
# are indistinguishable), so the expected structure IS one dense core
# with a border ring and sparse noise — the operator's evidence is the
# exact core/border/noise partition and the cell-graph clustering, not
# a contrived multi-cluster output.

_DB_EPS = 0.0625  # dyadic cell width
_DB_MINPTS = 20  # 3x3-neighborhood mass threshold
_DB_ENC = 100000  # cell id encoding: (cx+512)*ENC + (cy+512)


def _db_rows():
    from dumpty_spark.queries.vector import _rademacher_rows

    return _rademacher_rows(2, 64, seed=7)


def _proj_sql(axis_row: list[float]) -> str:
    terms = " + ".join(
        f"e[{i + 1}] * {r}" for i, r in enumerate(axis_row)
    )
    return f"ROUND(({terms}) / 8.0, 6)"


def _dbscan_oracle() -> str:
    rx, ry = _db_rows()
    return f"""
WITH RECURSIVE v AS (SELECT embedding::DOUBLE[] AS e FROM embeddings),
pts AS (
  SELECT CAST(FLOOR({_proj_sql(rx)} / {_DB_EPS}) AS BIGINT) AS cx,
         CAST(FLOOR({_proj_sql(ry)} / {_DB_EPS}) AS BIGINT) AS cy
  FROM v
),
cells AS (SELECT cx, cy, COUNT(*)::BIGINT AS n FROM pts GROUP BY cx, cy),
nb AS (
  SELECT c1.cx, c1.cy, c1.n, SUM(c2.n)::BIGINT AS mass
  FROM cells c1 JOIN cells c2
    ON c2.cx BETWEEN c1.cx - 1 AND c1.cx + 1
   AND c2.cy BETWEEN c1.cy - 1 AND c1.cy + 1
  GROUP BY c1.cx, c1.cy, c1.n
),
core AS (
  SELECT cx, cy, n, (cx + 512) * {_DB_ENC} + (cy + 512) AS id
  FROM nb WHERE mass >= {_DB_MINPTS}
),
core_edges AS (
  SELECT a.id AS u, b.id AS v
  FROM core a JOIN core b
    ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
   AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
),
walk(id, lab) AS (
  SELECT id, id FROM core
  UNION
  SELECT e.v, w.lab FROM walk w JOIN core_edges e ON e.u = w.id
),
comp AS (SELECT id, MIN(lab) AS cluster FROM walk GROUP BY id),
csize AS (
  SELECT comp.cluster, SUM(core.n)::BIGINT AS pts
  FROM comp JOIN core ON core.id = comp.id
  GROUP BY comp.cluster
),
border AS (
  SELECT SUM(nc.n)::BIGINT AS pts
  FROM (SELECT * FROM nb WHERE mass < {_DB_MINPTS}) nc
  WHERE EXISTS (
    SELECT 1 FROM core c
    WHERE c.cx BETWEEN nc.cx - 1 AND nc.cx + 1
      AND c.cy BETWEEN nc.cy - 1 AND nc.cy + 1
  )
)
SELECT (SELECT COUNT(*)::BIGINT FROM pts) AS n_points,
       (SELECT COUNT(*)::BIGINT FROM cells) AS n_cells,
       (SELECT COUNT(*)::BIGINT FROM core) AS n_core_cells,
       (SELECT COUNT(*)::BIGINT FROM csize) AS n_clusters,
       (SELECT COALESCE(SUM(n), 0)::BIGINT FROM core) AS core_pts,
       COALESCE((SELECT pts FROM border), 0)::BIGINT AS border_pts,
       ((SELECT COUNT(*) FROM pts)
        - (SELECT COALESCE(SUM(n), 0) FROM core)
        - COALESCE((SELECT pts FROM border), 0))::BIGINT AS noise_pts,
       (SELECT MAX(pts)::BIGINT FROM csize) AS max_cluster_pts
"""


@register(
    "q_grid_dbscan",
    oracle=_dbscan_oracle(),
    doc="grid DBSCAN (E199): seeded 2D Rademacher projection (exact "
    "cross-engine: +-1 products are sign flips, left-fold list-order "
    "sums), eps-cell bucketing, 9-offset neighborhood mass, core cells "
    "by minPts, clusters = connected components of the core-cell "
    "adjacency graph — point pairs NEVER enumerated; every density "
    "frame is grid-extent-bounded regardless of corpus size (the "
    "scalable DBSCAN shape vs the quadratic eps-join); exact integer "
    "core/border/noise partition, CC oracle via recursive CTE",
)
def q_grid_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.functions.vectors import as_double
    from dumpty_spark.operators.dedup import connected_components
    from dumpty_spark.operators.util import ensure_parallelism

    rx, ry = _db_rows()

    def proj(row: list[float]):
        e = as_double("embedding")
        s = reduce(
            lambda acc, t: acc + t,
            [F.element_at(e, i + 1) * F.lit(r) for i, r in enumerate(row)],
        )
        return F.round(s / 8.0, 6)

    emb = ensure_parallelism(
        load_table(spark, sf_dir, "embeddings").select("embedding")
    )
    pts = emb.select(
        F.floor(proj(rx) / _DB_EPS).cast("long").alias("cx"),
        F.floor(proj(ry) / _DB_EPS).cast("long").alias("cy"),
    )
    cells = pts.groupBy("cx", "cy").agg(F.count("*").alias("n")).localCheckpoint()
    offsets = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], "dx long, dy long"
    )
    # neighborhood mass at every lattice point any cell touches
    shifted = cells.crossJoin(F.broadcast(offsets)).select(
        (F.col("cx") + F.col("dx")).alias("tx"),
        (F.col("cy") + F.col("dy")).alias("ty"),
        "n",
    )
    mass = shifted.groupBy("tx", "ty").agg(F.sum("n").alias("mass"))
    nb = cells.join(
        mass,
        (F.col("cx") == F.col("tx")) & (F.col("cy") == F.col("ty")),
    ).select("cx", "cy", "n", "mass")
    enc = (F.col("cx") + 512) * _DB_ENC + (F.col("cy") + 512)
    core = (
        nb.filter(F.col("mass") >= _DB_MINPTS)
        .select("cx", "cy", "n", enc.alias("id"))
        .localCheckpoint()
    )
    noncore = nb.filter(F.col("mass") < _DB_MINPTS).select("cx", "cy", "n")
    # core-cell adjacency (self-loop via offset 0,0 keeps isolated cores)
    tgt = core.crossJoin(F.broadcast(offsets)).select(
        F.col("id").alias("u"),
        (F.col("cx") + F.col("dx")).alias("tx"),
        (F.col("cy") + F.col("dy")).alias("ty"),
    )
    edges = tgt.join(
        core.select(F.col("cx").alias("tx"), F.col("cy").alias("ty"),
                    F.col("id").alias("v")),
        ["tx", "ty"],
    ).select("u", "v")
    # the five scalar readouts are independent of each other once core is
    # checkpointed (the CC chain is the only sequential dependency) —
    # overlap them on driver threads and fold the two cells statistics
    # into ONE aggregate (r11 optimization, guide §2.6 / §2.4): was 5
    # sequential small actions, each paying the per-job floor
    from dumpty_spark.operators.util import run_overlapped

    def _cells_stats():
        r = cells.agg(
            F.coalesce(F.sum("n"), F.lit(0)).alias("np"),
            F.count("*").alias("nc"),
        ).first()
        return int(r["np"]), int(r["nc"])

    def _core_stats():
        return core.agg(
            F.count("*").alias("k"), F.coalesce(F.sum("n"), F.lit(0)).alias("pts")
        ).first()

    def _border_pts():
        return (
            noncore.crossJoin(F.broadcast(offsets))
            .select(
                "cx", "cy", "n",
                (F.col("cx") + F.col("dx")).alias("tx"),
                (F.col("cy") + F.col("dy")).alias("ty"),
            )
            .join(
                core.select(F.col("cx").alias("tx"), F.col("cy").alias("ty")),
                ["tx", "ty"],
                "left_semi",
            )
            .select("cx", "cy", "n")
            .distinct()
            .agg(F.coalesce(F.sum("n"), F.lit(0)))
            .first()[0]
        )

    def _cc_chain():
        comp = connected_components(edges, a_col="u", b_col="v")
        csize = (
            core.join(comp, core["id"] == comp["id"])
            .groupBy("cluster_id")
            .agg(F.sum("n").alias("pts"))
        )
        return csize.agg(
            F.count("*").alias("n_clusters"), F.max("pts").alias("max_pts")
        ).first()

    (n_points, n_cells), core_stats, border_pts, crow = run_overlapped(
        spark, [_cells_stats, _core_stats, _border_pts, _cc_chain]
    )
    return spark.createDataFrame(
        [
            (
                n_points, n_cells, core_stats["k"], crow["n_clusters"],
                core_stats["pts"], int(border_pts),
                n_points - int(core_stats["pts"]) - int(border_pts),
                crow["max_pts"],
            )
        ],
        "n_points long, n_cells long, n_core_cells long, n_clusters long, "
        "core_pts long, border_pts long, noise_pts long, max_cluster_pts long",
    )


# ---------------------------------------------------------------------------
# E200: split-conformal prediction intervals
# ---------------------------------------------------------------------------
# The distribution-free uncertainty wrapper every deployed predictor
# needs: fit a per-type mean on the train window, take the
# ceil(0.9(n+1))-th smallest calibration residual as qhat, and the
# interval mean +- qhat covers ~90% of test points by exchangeability
# (Vovk; Lei et al.). Grid discipline end-to-end: values pre-rounded
# 4dp, means 6dp, residuals 6dp (disc-quantile ELEMENT pick by
# row_number with event_id tie-break) — comparisons are exact grid
# arithmetic, coverage a single int division.

_CONF_ORACLE = """
WITH b AS (SELECT MIN(CAST(ts AS DATE)) AS mn FROM events),
ev AS (
  SELECT event_id, event_type, ROUND(value, 4) AS v,
         DATEDIFF('day', b.mn, CAST(ts AS DATE)) AS off
  FROM events, b
),
mean6 AS (
  SELECT event_type, ROUND(SUM(v) / COUNT(*), 6) AS mu,
         COUNT(*)::BIGINT AS n_train
  FROM ev WHERE off <= 19 GROUP BY event_type
),
cal AS (
  SELECT e.event_type, e.event_id, ROUND(ABS(e.v - m.mu), 6) AS r
  FROM ev e JOIN mean6 m ON m.event_type = e.event_type
  WHERE e.off BETWEEN 20 AND 24
),
ranked AS (
  SELECT event_type, r,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY r, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n_cal
  FROM cal
),
qhat AS (
  SELECT event_type, n_cal::BIGINT AS n_cal, r AS q
  FROM ranked
  WHERE rn = LEAST(CAST(CEIL(0.9 * (n_cal + 1)) AS BIGINT), n_cal)
),
test AS (
  SELECT e.event_type, ROUND(ABS(e.v - m.mu), 6) AS r
  FROM ev e JOIN mean6 m ON m.event_type = e.event_type
  WHERE e.off >= 25
)
SELECT t.event_type, m.n_train, q.n_cal,
       COUNT(*)::BIGINT AS n_test, q.q AS qhat,
       SUM(CASE WHEN t.r <= q.q THEN 1 ELSE 0 END)::BIGINT AS n_covered,
       ROUND(CAST(SUM(CASE WHEN t.r <= q.q THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 4) AS coverage
FROM test t
JOIN qhat q ON q.event_type = t.event_type
JOIN mean6 m ON m.event_type = t.event_type
GROUP BY t.event_type, m.n_train, q.n_cal, q.q
ORDER BY t.event_type
"""


@register(
    "q_conformal_interval",
    oracle=_CONF_ORACLE,
    doc="split-conformal prediction intervals (E200, Vovk / Lei): "
    "per-type train mean (days 0-19), qhat = ceil(0.9(n+1))-th "
    "smallest calibration residual (days 20-24, exact disc-quantile "
    "element via row_number), ~90% marginal test coverage (days 25+) "
    "by exchangeability — grid discipline end-to-end (4dp values, 6dp "
    "means/residuals), coverage one int division; the distribution-"
    "free uncertainty wrapper next to the E141 calibration audit",
)
def q_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev0 = load_table(spark, sf_dir, "events")
    mn = ev0.agg(F.min(F.col("ts").cast("date"))).first()[0]
    ev = ev0.select(
        "event_id", "event_type",
        F.round("value", 4).alias("v"),
        F.datediff(F.col("ts").cast("date"), F.lit(mn)).alias("off"),
    )
    mean6 = (
        ev.filter(F.col("off") <= 19)
        .groupBy("event_type")
        .agg(
            F.round(F.sum("v") / F.count("*"), 6).alias("mu"),
            F.count("*").alias("n_train"),
        )
    )
    cal = (
        ev.filter(F.col("off").between(20, 24))
        .join(F.broadcast(mean6), "event_type")
        .select(
            "event_type", "event_id",
            F.round(F.abs(F.col("v") - F.col("mu")), 6).alias("r"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("r", "event_id")
    wc = Window.partitionBy("event_type")
    ranked = cal.withColumn("rn", F.row_number().over(w)).withColumn(
        "n_cal", F.count("*").over(wc)
    )
    qhat = ranked.filter(
        F.col("rn")
        == F.least(
            F.ceil(0.9 * (F.col("n_cal") + 1)).cast("long"), F.col("n_cal")
        )
    ).select("event_type", "n_cal", F.col("r").alias("q"))
    test = (
        ev.filter(F.col("off") >= 25)
        .join(F.broadcast(mean6), "event_type")
        .select(
            "event_type", "n_train",
            F.round(F.abs(F.col("v") - F.col("mu")), 6).alias("r"),
        )
    )
    cov = F.sum(F.when(F.col("r") <= F.col("q"), 1).otherwise(0))
    return (
        test.join(F.broadcast(qhat), "event_type")
        .groupBy("event_type", "n_train", "n_cal", "q")
        .agg(
            F.count("*").alias("n_test"),
            cov.alias("n_covered"),
            F.round(cov.cast("double") / F.count("*"), 4).alias("coverage"),
        )
        .select(
            "event_type", "n_train", "n_cal", "n_test",
            F.col("q").alias("qhat"), "n_covered", "coverage",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# E201: propensity-stratified ATT
# ---------------------------------------------------------------------------
# Completes the causal family (CUPED E126, DiD E134, IPS E133): the
# treatment-effect estimate under confounding-by-activity. Treated =
# signup-HEAVY users (signup share above the global share — an exact
# integer cross-multiplication test, s_u*A > S*a_u, since the fixture
# gives every user some signups); outcome = purchase count; confounder
# = total activity. Users are ranked once (users-sized frame) into 5
# exact strata via integer row-number arithmetic (NO ntile — engine
# tie-splitting differs), and the ATT is the treated-weighted mean of
# within-stratum outcome gaps. Every stratum term is ONE integer-ratio
# division integerized to micro-units; the naive (unstratified) gap is
# reported next to it — the difference IS the confounding.

_ATT_STRATA = 5

_ATT_ORACLE = f"""
WITH act AS (
  SELECT user_id,
         COUNT(*)::BIGINT AS activity,
         SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS s,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS y
  FROM events GROUP BY user_id
),
gl AS (SELECT SUM(s)::BIGINT AS sg, SUM(activity)::BIGINT AS ag FROM act),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (ORDER BY activity, user_id) - 1 AS rn,
         COUNT(*) OVER () AS nu
  FROM act
),
strat AS (
  SELECT (rn * {_ATT_STRATA}) // nu AS stratum,
         CASE WHEN r.s * g.ag > g.sg * r.activity THEN 1 ELSE 0 END AS t, y
  FROM ranked r, gl g
),
cells AS (
  SELECT stratum,
         SUM(t)::BIGINT AS n_t, SUM(1 - t)::BIGINT AS n_c,
         SUM(CASE WHEN t = 1 THEN y ELSE 0 END)::BIGINT AS sum_t,
         SUM(CASE WHEN t = 0 THEN y ELSE 0 END)::BIGINT AS sum_c
  FROM strat GROUP BY stratum
),
tot AS (
  SELECT SUM(n_t)::BIGINT AS nt, SUM(n_c)::BIGINT AS nc,
         SUM(sum_t)::BIGINT AS st, SUM(sum_c)::BIGINT AS sc
  FROM cells
),
terms AS (
  SELECT c.stratum,
         CAST(ROUND(1000000.0 * c.n_t * (c.sum_t * c.n_c - c.sum_c * c.n_t)
                    / (tot.nt * c.n_t * c.n_c), 0) AS BIGINT) AS term_micro
  FROM cells c, tot
  WHERE c.n_t > 0 AND c.n_c > 0
)
SELECT tot.nt AS n_treated, tot.nc AS n_control,
       (SELECT COUNT(*)::BIGINT FROM terms) AS n_strata_used,
       CAST(ROUND(1000000.0 * (tot.st * tot.nc - tot.sc * tot.nt)
                  / (tot.nt * tot.nc), 0) AS BIGINT) AS naive_diff_micro,
       (SELECT SUM(term_micro)::BIGINT FROM terms) AS att_micro,
       ROUND((SELECT SUM(term_micro) FROM terms) / 1000000.0, 6) AS att
FROM tot
"""


@register(
    "q_propensity_att",
    oracle=_ATT_ORACLE,
    doc="propensity-stratified ATT (E201): treated = signup-heavy "
    "users (signup share above global share, exact integer cross-"
    "multiplication), "
    "outcome = purchase count, confounder = activity; 5 exact strata "
    "by integer row-number arithmetic on the users-sized frame (no "
    "ntile — engine tie-splitting differs), ATT = treated-weighted "
    "within-stratum gaps with each term integerized to micro-units "
    "(one division per stratum), the naive gap reported alongside — "
    "the stratification-vs-naive difference IS the confounding; "
    "completes the CUPED/DiD/IPS causal family",
)
def q_propensity_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    act = ev.groupBy("user_id").agg(
        F.count("*").alias("activity"),
        F.sum(F.when(F.col("event_type") == "signup", 1).otherwise(0)).alias("s"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("y"),
    ).localCheckpoint()
    g = act.agg(F.sum("s").alias("sg"), F.sum("activity").alias("ag")).first()
    sg, ag = int(g["sg"]), int(g["ag"])
    # users-sized global rank (bounded relative to the event fact; the
    # one total order the stratification needs)
    w = Window.orderBy("activity", "user_id")
    n_users = act.count()
    strat = act.select(
        (((F.row_number().over(w) - 1) * _ATT_STRATA) / n_users)
        .cast("long")
        .alias("stratum"),
        F.when(F.col("s") * ag > sg * F.col("activity"), 1)
        .otherwise(0)
        .alias("t"),
        "y",
    )
    cells = strat.groupBy("stratum").agg(
        F.sum("t").alias("n_t"),
        F.sum(1 - F.col("t")).alias("n_c"),
        F.sum(F.when(F.col("t") == 1, F.col("y")).otherwise(0)).alias("sum_t"),
        F.sum(F.when(F.col("t") == 0, F.col("y")).otherwise(0)).alias("sum_c"),
    ).localCheckpoint()
    tot = cells.agg(
        F.sum("n_t").alias("nt"), F.sum("n_c").alias("nc"),
        F.sum("sum_t").alias("st"), F.sum("sum_c").alias("sc"),
    ).first()
    nt, nc, st, sc = tot["nt"], tot["nc"], tot["st"], tot["sc"]
    terms = (
        cells.filter((F.col("n_t") > 0) & (F.col("n_c") > 0))
        .select(
            F.round(
                1000000.0
                * F.col("n_t")
                * (F.col("sum_t") * F.col("n_c") - F.col("sum_c") * F.col("n_t"))
                / (F.lit(nt) * F.col("n_t") * F.col("n_c")),
                0,
            )
            .cast("long")
            .alias("term_micro")
        )
        .agg(F.count("*").alias("k"), F.sum("term_micro").alias("att_micro"))
        .first()
    )
    naive_micro = int(round(1000000.0 * (st * nc - sc * nt) / (nt * nc)))
    att_micro = int(terms["att_micro"])
    return spark.createDataFrame(
        [
            (
                nt, nc, terms["k"], naive_micro, att_micro,
                round(att_micro / 1000000.0, 6),
            )
        ],
        "n_treated long, n_control long, n_strata_used long, "
        "naive_diff_micro long, att_micro long, att double",
    )


# ---------------------------------------------------------------------------
# E202: frequent triples (3-itemsets)
# ---------------------------------------------------------------------------
# The C(k,3) extension of the E155 association rules, generated
# MAP-SIDE from each order's sorted part set (no basket self-joins —
# a triple self-join shuffles the fact three times and cubes skewed
# baskets on single tasks). Baskets are size-capped at 32 first (the
# df-capping discipline: promiscuous baskets dominate the cubic
# combinatorics while carrying no signal — PFP's maxPatternLength
# analog), and the cap is applied identically in the oracle. lift3 is
# one closed-form expression of exact counts.

_TRI_MINSUP = 2
_TRI_MAX_BASKET = 32


_TRI_ORACLE = f"""
WITH sizes AS (
  SELECT l_orderkey, COUNT(DISTINCT l_partkey) AS k FROM lineitem GROUP BY 1
),
baskets AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey IN (SELECT l_orderkey FROM sizes
                       WHERE k <= {_TRI_MAX_BASKET})
),
nb AS (SELECT COUNT(DISTINCT l_orderkey)::DOUBLE AS n FROM baskets),
item AS (SELECT l_partkey, COUNT(*)::BIGINT AS n_i FROM baskets GROUP BY 1),
tri AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, c.l_partkey AS pc,
         COUNT(*)::BIGINT AS n_abc
  FROM baskets a
  JOIN baskets b ON b.l_orderkey = a.l_orderkey AND a.l_partkey < b.l_partkey
  JOIN baskets c ON c.l_orderkey = b.l_orderkey AND b.l_partkey < c.l_partkey
  GROUP BY 1, 2, 3
  HAVING COUNT(*) >= {_TRI_MINSUP}
)
SELECT t.pa, t.pb, t.pc, t.n_abc,
       ROUND(t.n_abc / nb.n, 6) AS support,
       ROUND(t.n_abc * nb.n * nb.n / (ia.n_i * ib.n_i * ic.n_i), 6) AS lift3
FROM tri t
JOIN item ia ON ia.l_partkey = t.pa
JOIN item ib ON ib.l_partkey = t.pb
JOIN item ic ON ic.l_partkey = t.pc, nb
ORDER BY t.n_abc DESC, t.pa, t.pb, t.pc
LIMIT 15
"""


@register(
    "q_frequent_triples",
    oracle=_TRI_ORACLE,
    doc="frequent 3-itemsets (E202): map-side C(k,3) triple generation "
    "from each order's sorted part array (no triple basket self-join), "
    "baskets size-capped at 32 first (the df-capping discipline — "
    "promiscuous baskets dominate the cubic combinatorics), support "
    "floor, lift3 one closed-form of exact counts, top-15 with "
    "deterministic tie-breaks — the Apriori step beyond E155's pairs",
)
def q_frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts") <= _TRI_MAX_BASKET)
        .localCheckpoint()
    )
    nb = baskets.count()
    item = baskets.select(F.explode("parts").alias("l_partkey")).groupBy(
        "l_partkey"
    ).agg(F.count("*").alias("n_i"))
    triples = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(parts, (x, i) -> "
                "flatten(transform(slice(parts, i + 2, size(parts)), (y, j) -> "
                "transform(slice(parts, i + j + 3, size(parts)), "
                "z -> struct(x AS pa, y AS pb, z AS pc))))))"
            )
        ).alias("t")
    ).select("t.pa", "t.pb", "t.pc")
    tri = (
        triples.groupBy("pa", "pb", "pc")
        .agg(F.count("*").alias("n_abc"))
        .filter(F.col("n_abc") >= _TRI_MINSUP)
    )
    ia = item.select(F.col("l_partkey").alias("pa"), F.col("n_i").alias("na"))
    ib = item.select(F.col("l_partkey").alias("pb"), F.col("n_i").alias("nb_"))
    ic = item.select(F.col("l_partkey").alias("pc"), F.col("n_i").alias("nc"))
    return (
        tri.join(F.broadcast(ia), "pa")
        .join(F.broadcast(ib), "pb")
        .join(F.broadcast(ic), "pc")
        .select(
            "pa", "pb", "pc", "n_abc",
            F.round(F.col("n_abc") / F.lit(float(nb)), 6).alias("support"),
            F.round(
                F.col("n_abc") * float(nb) * float(nb)
                / (F.col("na") * F.col("nb_") * F.col("nc")),
                6,
            ).alias("lift3"),
        )
        .orderBy(F.desc("n_abc"), "pa", "pb", "pc")
        .limit(15)
    )
