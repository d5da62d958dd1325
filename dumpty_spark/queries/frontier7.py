"""Round-6 engine extensions, second batch (EXT E132-E137): local
clustering coefficients, off-policy IPS evaluation, difference-in-
differences + SRM, minimum-detectable-effect power readout, cross-source
quantile normalization.

Design rules shared by the batch (same as every E-series query):
pure-Column / partial-agg plans, windows only over metadata-sized
rollup frames, broadcast for anything node-/value-/series-sized, and an
exact DuckDB oracle recomputing the identical math from the raw tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dumpty_spark.operators.sampling import bucket_fraction, bucket_fraction_sql
from dumpty_spark.queries import register
from dumpty_spark.queries.frontier5 import _CUPED_PIVOT_DAY
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E132: local clustering coefficients over the co-purchase graph
# ---------------------------------------------------------------------------
# q_triangle_count reports the GLOBAL transitivity scalar; community
# analysis needs the per-node view: lcc(v) = 2·T(v) / (d(v)·(d(v)−1)),
# the fraction of v's neighbor pairs that are themselves connected.
# Per-node triangle counts come from the same degree-ordered
# compact-forward enumeration the global count uses (each triangle
# found exactly once, per-node wedge fanout bounded by out-degree
# O(sqrt m)), exploded to the triangle's three corners. lcc is the raw
# IEEE double 2T/(d(d−1)) — integer inputs, identical operations on
# both engines, so binning on it is portable without pre-rounding.

_LCC_ORACLE = """
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
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1 JOIN e e2 ON e2.u = e1.v JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
),
tcnt AS (
  SELECT node, COUNT(*)::BIGINT AS t
  FROM (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
  GROUP BY node
),
lcc AS (
  SELECT deg.node, deg.d,
         2.0 * COALESCE(t.t, 0) / (deg.d * (deg.d - 1)) AS lcc
  FROM deg LEFT JOIN tcnt t ON t.node = deg.node
  WHERE deg.d >= 2
)
SELECT LEAST(FLOOR(lcc * 4), 3)::BIGINT AS bin,
       COUNT(*)::BIGINT AS n_nodes,
       ROUND(AVG(lcc), 4) AS avg_lcc,
       ROUND(AVG(d), 2) AS avg_degree
FROM lcc
GROUP BY bin
ORDER BY bin
"""


@register(
    "q_clustering_coefficient",
    oracle=_LCC_ORACLE,
    doc="local clustering coefficients (E132): per-node lcc = 2T/(d(d-1)) "
    "over the co-purchase graph via degree-ordered compact-forward "
    "triangle enumeration (each triangle once, wedge fanout O(sqrt m)) "
    "exploded to corners — binned lcc distribution with per-bin node "
    "counts and mean degree, the per-node companion to "
    "q_triangle_count's global transitivity",
)
def q_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.queries.shared_graph import copurchase_symmetric

    # Adjacency-intersection edge iterator (r11 optimization, guide §2.4
    # — remove shuffles outright): the first implementation materialized
    # every WEDGE through a 3-way self-join (wedge rows ≫ edges, two
    # extra exchanges + a closure-join shuffle); triangles per edge are
    # |N+(x) ∩ N+(y)| over degree-ordered out-adjacency arrays — the
    # same plan shape q_triangle_count uses — with per-CORNER credit
    # emitted map-side (x and y each get |∩|, every c ∈ ∩ gets 1), so
    # the only exchanges are the two node-keyed adjacency groupBys and
    # the final node-keyed count sum. Triangle multiset identical, so
    # per-node t, lcc and the binned result are unchanged.
    width = spark.sparkContext.defaultParallelism
    und = (
        copurchase_symmetric(spark, sf_dir)
        .select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .repartition(width, "node")
        .groupBy("node")
        .agg(F.collect_list("nbr").alias("nbrs"))
        .withColumn("d", F.size("nbrs"))
        .localCheckpoint()  # node-sized; feeds degrees + orientation
    )
    deg = und.select("node", "d")
    n_nodes = und.count()  # cheap: und is checkpointed
    bcast = F.broadcast if n_nodes < 5_000_000 else (lambda df: df)

    # orient each edge lower-(d, id) -> higher (total order, acyclic)
    # and regroup into out-neighbor (N+) adjacency: out-degrees are
    # O(sqrt m) under degree ordering
    deg_map = bcast(und.select(F.col("node").alias("nbr"), F.col("d").alias("d_nbr")))
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
    # each oriented edge (x,y) closes one triangle per c ∈ N+(x)∩N+(y);
    # credit all three corners without materializing wedge or triangle
    # rows: x and y get |∩| each, every c gets 1 — summed per node
    elem_t = und.schema["nbrs"].dataType.elementType.simpleString()
    a_y = bcast(
        adjp.select(F.col("node").alias("_y"), F.col("nbrs_p").alias("nbrs_y"))
    )
    common = F.array_intersect(
        "nbrs_x",
        F.coalesce(F.col("nbrs_y"), F.expr(f"cast(array() as array<{elem_t}>)")),
    )
    tcnt = (
        adjp.select(
            F.col("node").alias("x"),
            F.col("nbrs_p").alias("nbrs_x"),
            F.explode("nbrs_p").alias("y"),
        )
        # rank-maximal nodes have no N+ row: left join + empty fallback
        .join(a_y, F.col("y") == F.col("_y"), "left")
        .select(F.col("x"), F.col("y"), common.alias("cs"))
        .filter(F.size("cs") > 0)
        .select(
            F.explode(
                F.concat(
                    F.expr("transform(cs, c -> struct(c AS node, 1L AS t))"),
                    F.array(
                        F.struct(
                            F.col("x").alias("node"),
                            F.size("cs").cast("long").alias("t"),
                        ),
                        F.struct(
                            F.col("y").alias("node"),
                            F.size("cs").cast("long").alias("t"),
                        ),
                    ),
                )
            ).alias("e")
        )
        .groupBy(F.col("e.node").alias("node"))
        .agg(F.sum("e.t").alias("t"))
    )
    lcc = (
        deg.filter(F.col("d") >= 2)
        .join(bcast(tcnt), "node", "left")
        .select(
            "d",
            (
                2.0 * F.coalesce(F.col("t"), F.lit(0)) / (F.col("d") * (F.col("d") - 1))
            ).alias("lcc"),
        )
    )
    return (
        lcc.groupBy(
            F.least(F.floor(F.col("lcc") * 4), F.lit(3)).cast("long").alias("bin")
        )
        .agg(
            F.count("*").alias("n_nodes"),
            F.round(F.avg("lcc"), 4).alias("avg_lcc"),
            F.round(F.avg("d"), 2).alias("avg_degree"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# E133: off-policy evaluation — IPS / SNIPS readout
# ---------------------------------------------------------------------------
# The counterfactual question behind every logged-bandit dataset: what
# value WOULD the target policy have collected, estimated from logs
# gathered under the behavior policy? Behavior propensities are the
# empirical global action frequencies; the target policy is "play the
# user's modal action" (ties -> alphabetically smallest). IPS reweights
# matching log rows by 1/p(a); SNIPS normalizes by the realized weight
# mass (lower variance, slight bias); ESS = (Σw)²/Σw² reports how many
# effective samples survived the reweighting. One events scan + a
# users-sized modal-action frame + a 5-row broadcast propensity frame.

_IPS_ORACLE = """
WITH p AS (
  SELECT event_type AS a,
         COUNT(*)::DOUBLE / (SELECT COUNT(*) FROM events) AS prop
  FROM events GROUP BY 1
),
ua AS (
  SELECT user_id, event_type AS pi_a FROM (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY COUNT(*) DESC, event_type) AS rn
    FROM events GROUP BY user_id, event_type
  ) WHERE rn = 1
),
w AS (
  SELECT CASE WHEN e.event_type = ua.pi_a THEN 1.0 / p.prop ELSE 0.0 END AS w,
         e.value AS r
  FROM events e
  JOIN ua ON ua.user_id = e.user_id
  JOIN p ON p.a = e.event_type
)
SELECT COUNT(*)::BIGINT AS n_events,
       ROUND(AVG(CASE WHEN w > 0 THEN 1.0 ELSE 0.0 END), 4) AS match_rate,
       ROUND(SUM(w * r) / COUNT(*), 4) AS ips_value,
       ROUND(SUM(w * r) / SUM(w), 4) AS snips_value,
       ROUND(SUM(w) * SUM(w) / SUM(w * w), 2) AS ess
FROM w
"""


@register(
    "q_ips_offpolicy",
    oracle=_IPS_ORACLE,
    doc="off-policy IPS/SNIPS evaluation (E133): estimate the value of a "
    "target policy (each user's modal action, ties alphabetical) from "
    "logs under the behavior policy (empirical action frequencies as "
    "propensities) — inverse-propensity weights on matching rows, "
    "self-normalized variant, and the effective sample size (Σw)²/Σw² "
    "that tells you whether the estimate is real; one events scan + "
    "users-sized modal frame + 5-row broadcast propensities",
)
def q_ips_offpolicy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    p = ev.groupBy(F.col("event_type").alias("a")).agg(
        (F.count("*").cast("double") / F.lit(float(n))).alias("prop")
    )
    wrn = Window.partitionBy("user_id").orderBy(F.desc("cnt"), F.asc("event_type"))
    ua = (
        ev.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("cnt"))
        .withColumn("rn", F.row_number().over(wrn))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("pi_a"))
    )
    w = (
        ev.join(ua, "user_id")
        .join(F.broadcast(p), ev["event_type"] == F.col("a"))
        .select(
            F.when(F.col("event_type") == F.col("pi_a"), 1.0 / F.col("prop"))
            .otherwise(F.lit(0.0))
            .alias("w"),
            F.col("value").alias("r"),
        )
    )
    return w.agg(
        F.count("*").alias("n_events"),
        F.round(F.avg(F.when(F.col("w") > 0, 1.0).otherwise(0.0)), 4).alias(
            "match_rate"
        ),
        F.round(F.sum(F.col("w") * F.col("r")) / F.count("*"), 4).alias("ips_value"),
        F.round(F.sum(F.col("w") * F.col("r")) / F.sum("w"), 4).alias("snips_value"),
        F.round(F.sum("w") * F.sum("w") / F.sum(F.col("w") * F.col("w")), 2).alias(
            "ess"
        ),
    )


# ---------------------------------------------------------------------------
# E134: difference-in-differences + sample-ratio-mismatch check
# ---------------------------------------------------------------------------
# The other standard quasi-experimental readout next to CUPED (E126):
# DiD removes time-invariant arm differences by differencing each arm
# against its own pre-period, lift = (T_post − T_pre) − (C_post − C_pre).
# The SRM chi² (arm user counts vs the designed 50/50) is the first
# thing a trustworthy experiment dashboard checks — a skewed split
# invalidates everything downstream. Same md5 coin and pre/post pivot
# as CUPED; everything is one grouped-agg pass over events plus a
# per-arm distinct-user count.

_DID_ORACLE = f"""
WITH t AS (
  SELECT event_type, user_id, value,
         {bucket_fraction_sql(["user_id"])} < 0.5 AS treated,
         floor(epoch(ts))::BIGINT // 86400 >= {_CUPED_PIVOT_DAY} AS post
  FROM events
),
cells AS (
  SELECT event_type, treated, post, AVG(value) AS m
  FROM t GROUP BY 1, 2, 3
),
users AS (
  SELECT event_type, treated, COUNT(DISTINCT user_id)::BIGINT AS nu
  FROM t GROUP BY 1, 2
)
SELECT c.event_type,
       ut.nu AS n_treated_users, uc.nu AS n_control_users,
       ROUND((ut.nu - uc.nu) * (ut.nu - uc.nu) * 1.0 / (ut.nu + uc.nu), 4)
         AS srm_chi2,
       ROUND(tpre.m - cpre.m, 4) AS pre_gap,
       ROUND((tpost.m - tpre.m) - (cpost.m - cpre.m), 4) AS did_lift
FROM (SELECT DISTINCT event_type FROM cells) c
JOIN cells tpre  ON tpre.event_type = c.event_type AND tpre.treated AND NOT tpre.post
JOIN cells tpost ON tpost.event_type = c.event_type AND tpost.treated AND tpost.post
JOIN cells cpre  ON cpre.event_type = c.event_type AND NOT cpre.treated AND NOT cpre.post
JOIN cells cpost ON cpost.event_type = c.event_type AND NOT cpost.treated AND cpost.post
JOIN users ut ON ut.event_type = c.event_type AND ut.treated
JOIN users uc ON uc.event_type = c.event_type AND NOT uc.treated
ORDER BY c.event_type
"""


@register(
    "q_did_lift",
    oracle=_DID_ORACLE,
    doc="difference-in-differences + SRM (E134): per series, DiD lift = "
    "(T_post−T_pre)−(C_post−C_pre) removes time-invariant arm bias "
    "(companion to CUPED's variance reduction), reported with the "
    "pre-period gap it corrects and the sample-ratio-mismatch chi² of "
    "per-arm user counts vs the designed 50/50 — the validity gate every "
    "experiment readout runs first; one grouped-agg pass + a per-arm "
    "distinct-user count, md5 coin assignment",
)
def q_did_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.floor(F.unix_timestamp("ts") / F.lit(86400)).cast("long")
    t = ev.select(
        "event_type",
        "user_id",
        "value",
        (bucket_fraction(["user_id"]) < 0.5).alias("treated"),
        (day >= _CUPED_PIVOT_DAY).alias("post"),
    )
    cells = t.groupBy("event_type", "treated", "post").agg(F.avg("value").alias("m"))
    users = t.groupBy("event_type", "treated").agg(
        F.countDistinct("user_id").alias("nu")
    )

    def cell(tr: bool, po: bool, name: str) -> DataFrame:
        return cells.filter(
            (F.col("treated") == tr) & (F.col("post") == po)
        ).select("event_type", F.col("m").alias(name))

    ut = users.filter(F.col("treated")).select(
        "event_type", F.col("nu").alias("n_treated_users")
    )
    uc = users.filter(~F.col("treated")).select(
        "event_type", F.col("nu").alias("n_control_users")
    )
    out = (
        cell(True, False, "tpre")
        .join(cell(True, True, "tpost"), "event_type")
        .join(cell(False, False, "cpre"), "event_type")
        .join(cell(False, True, "cpost"), "event_type")
        .join(ut, "event_type")
        .join(uc, "event_type")
    )
    dsq = (F.col("n_treated_users") - F.col("n_control_users")) * (
        F.col("n_treated_users") - F.col("n_control_users")
    )
    return out.select(
        "event_type",
        "n_treated_users",
        "n_control_users",
        F.round(
            dsq * 1.0 / (F.col("n_treated_users") + F.col("n_control_users")), 4
        ).alias("srm_chi2"),
        F.round(F.col("tpre") - F.col("cpre"), 4).alias("pre_gap"),
        F.round(
            (F.col("tpost") - F.col("tpre")) - (F.col("cpost") - F.col("cpre")), 4
        ).alias("did_lift"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# E135: minimum detectable effect — the pre-experiment power readout
# ---------------------------------------------------------------------------
# Before launching an A/B test, the pilot data answers "what lift could
# this population even detect?": MDE = (z_{α/2} + z_β)·σ·sqrt(2/m) at
# α=0.05 two-sided, power 0.8, per-arm size m = floor(n_users/2), with
# σ the between-user standard deviation of per-user means (the actual
# experimental unit's variance, not the per-event one). Closed-form,
# two grouped-agg passes, exact on both engines.

_Z_SUM = 2.801585  # z_{0.975} + z_{0.8} = 1.959964 + 0.841621

_MDE_ORACLE = f"""
WITH um AS (
  SELECT event_type, user_id, AVG(value) AS uv
  FROM events GROUP BY 1, 2
),
st AS (
  SELECT event_type, COUNT(*)::BIGINT AS n_users,
         AVG(uv) AS mu, STDDEV_POP(uv) AS sd
  FROM um GROUP BY 1
)
SELECT event_type, n_users,
       ROUND(mu, 4) AS mean_value,
       ROUND(sd, 4) AS sigma,
       ROUND({_Z_SUM} * sd * sqrt(2.0 / (n_users // 2)), 4) AS mde_abs,
       ROUND({_Z_SUM} * sd * sqrt(2.0 / (n_users // 2)) / mu, 4) AS mde_rel
FROM st ORDER BY event_type
"""


@register(
    "q_mde_power",
    oracle=_MDE_ORACLE,
    doc="minimum detectable effect (E135): per series, the smallest lift "
    "a 50/50 experiment on this population could detect at alpha=0.05 / "
    "power 0.8 — MDE = 2.8016·sigma·sqrt(2/m) with sigma the "
    "between-USER std of per-user means (the experimental unit's "
    "variance) and m = floor(n/2) per arm; the pre-launch feasibility "
    "readout, two grouped-agg passes, closed form",
)
def q_mde_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    um = ev.groupBy("event_type", "user_id").agg(F.avg("value").alias("uv"))
    st = um.groupBy("event_type").agg(
        F.count("*").alias("n_users"),
        F.avg("uv").alias("mu"),
        F.stddev_pop("uv").alias("sd"),
    )
    m = F.floor(F.col("n_users") / 2)
    mde = F.lit(_Z_SUM) * F.col("sd") * F.sqrt(2.0 / m)
    return st.select(
        "event_type",
        "n_users",
        F.round("mu", 4).alias("mean_value"),
        F.round("sd", 4).alias("sigma"),
        F.round(mde, 4).alias("mde_abs"),
        F.round(mde / F.col("mu"), 4).alias("mde_rel"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# E136: cross-source quantile normalization
# ---------------------------------------------------------------------------
# The batch-effect remover: each source's n_chars distribution is mapped
# onto the GLOBAL distribution by rank (value -> within-source CDF ->
# global value at that CDF), so downstream length-based quality gates
# see comparable scales across sources. Everything happens on
# distinct-value rollups: per-(source, value) counts and cumulative
# CDFs over those metadata frames. The mapping itself is a BANDED
# interval equi-join (VERDICT r6 What's wrong #3 — the naive
# `gfrac >= r` non-equi broadcast join materializes, per source row,
# every global value above its rank: O(D_src x D_global) before the
# min-agg). Each global value is instead the UNIQUE answer on the
# half-open CDF interval (prev_gfrac, gfrac]; exploding that interval
# across floor(frac*B) coarse bands (total expansion D_global + B
# rows) turns the lookup into a broadcast HASH join on the band plus
# an O(1)-candidate range filter — no BroadcastNestedLoopJoin, no
# min-agg, work linear in D_src + D_global at any scale.
# CDF fractions are exact-integer divisions computed identically on
# both engines, so the interval boundaries need no rounding.

_QNORM_ORACLE = """
WITH s AS (
  SELECT source, n_chars, COUNT(*)::BIGINT AS cnt FROM documents GROUP BY 1, 2
),
sc AS (
  SELECT source, n_chars, cnt,
         SUM(cnt) OVER (PARTITION BY source ORDER BY n_chars)::DOUBLE
           / SUM(cnt) OVER (PARTITION BY source) AS r
  FROM s
),
g AS (
  SELECT n_chars, COUNT(*)::BIGINT AS cnt FROM documents GROUP BY 1
),
gc AS (
  SELECT n_chars AS gv,
         SUM(cnt) OVER (ORDER BY n_chars)::DOUBLE
           / (SELECT COUNT(*) FROM documents) AS gfrac
  FROM g
),
mapd AS (
  SELECT sc.source, sc.n_chars, sc.cnt, MIN(gc.gv) AS nv
  FROM sc JOIN gc ON gc.gfrac >= sc.r
  GROUP BY sc.source, sc.n_chars, sc.cnt
)
SELECT source,
       SUM(cnt)::BIGINT AS n_docs,
       ROUND(SUM(n_chars * cnt)::DOUBLE / SUM(cnt), 4) AS mean_before,
       ROUND(SUM(nv * cnt)::DOUBLE / SUM(cnt), 4) AS mean_after,
       ROUND(SQRT(SUM(n_chars * n_chars * cnt)::DOUBLE / SUM(cnt)
             - POW(SUM(n_chars * cnt)::DOUBLE / SUM(cnt), 2)), 4) AS sd_before,
       ROUND(SQRT(SUM(nv * nv * cnt)::DOUBLE / SUM(cnt)
             - POW(SUM(nv * cnt)::DOUBLE / SUM(cnt), 2)), 4) AS sd_after
FROM mapd
GROUP BY source
ORDER BY source
"""


@register(
    "q_quantile_normalize",
    oracle=_QNORM_ORACLE,
    doc="cross-source quantile normalization (E136): map each source's "
    "n_chars distribution onto the global one by rank (within-source "
    "CDF -> smallest global value covering it) — the batch-effect "
    "remover for per-source length-quality gates; all CDF work on "
    "distinct-value rollups with a broadcast non-equi mapping join, "
    "per-source before/after moments prove the distributions aligned",
)
def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_total = docs.count()
    s = docs.groupBy("source", "n_chars").agg(F.count("*").alias("cnt"))
    wsrc = Window.partitionBy("source").orderBy("n_chars")
    sc = s.select(
        "source",
        "n_chars",
        "cnt",
        (
            F.sum("cnt").over(wsrc).cast("double")
            / F.sum("cnt").over(Window.partitionBy("source"))
        ).alias("r"),
    )
    g = docs.groupBy("n_chars").agg(F.count("*").alias("cnt"))
    # global window over the distinct-value rollup — metadata-sized
    gc = g.select(
        F.col("n_chars").alias("gv"),
        (
            F.sum("cnt").over(
                Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
            ).cast("double")
            / F.lit(float(n_total))
        ).alias("gfrac"),
    )
    # each global value answers ranks in (prev_gfrac, gfrac]; explode
    # that interval over coarse bands so the mapping is a hash equi-join
    n_bands = 1024
    gb = (
        gc.withColumn(
            "prev", F.lag("gfrac", 1, 0.0).over(Window.orderBy("gv"))
        )
        .select(
            "gv",
            "gfrac",
            "prev",
            F.explode(
                # prev <= gfrac by construction (lag over a cumulative
                # sum); greatest-clamp keeps the bound visible so the
                # sequence can never descend
                F.sequence(
                    F.floor(F.col("prev") * n_bands).cast("long"),
                    F.greatest(
                        F.floor(F.col("gfrac") * n_bands).cast("long"),
                        F.floor(F.col("prev") * n_bands).cast("long"),
                    ),
                )
            ).alias("band"),
        )
    )
    mapd = (
        sc.withColumn("band", F.floor(F.col("r") * n_bands).cast("long"))
        .join(F.broadcast(gb), "band")
        .filter((F.col("r") > F.col("prev")) & (F.col("r") <= F.col("gfrac")))
        .select("source", "n_chars", "cnt", F.col("gv").alias("nv"))
    )
    sw = F.sum("cnt")
    mb = F.sum(F.col("n_chars") * F.col("cnt")).cast("double") / sw
    ma = F.sum(F.col("nv") * F.col("cnt")).cast("double") / sw
    return (
        mapd.groupBy("source")
        .agg(
            sw.cast("long").alias("n_docs"),
            F.round(mb, 4).alias("mean_before"),
            F.round(ma, 4).alias("mean_after"),
            F.round(
                F.sqrt(
                    F.sum(F.col("n_chars") * F.col("n_chars") * F.col("cnt")).cast(
                        "double"
                    )
                    / sw
                    - F.pow(mb, 2)
                ),
                4,
            ).alias("sd_before"),
            F.round(
                F.sqrt(
                    F.sum(F.col("nv") * F.col("nv") * F.col("cnt")).cast("double") / sw
                    - F.pow(ma, 2)
                ),
                4,
            ).alias("sd_after"),
        )
        .orderBy("source")
    )


