"""Round-6 engine extensions, sixth batch (EXT E155-E158): association
rules, embedding class-separability, revenue concentration (Lorenz),
and an ORC round-trip interop audit.

Same design rules as the rest of the E-series: pure-Column partial-agg
plans, broadcast for value-/label-sized frames, exact DuckDB oracles.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dumpty_spark.queries import register
from dumpty_spark.session import warehouse_scratch as _warehouse_scratch
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E155: association rules (support / confidence / lift)
# ---------------------------------------------------------------------------
# The market-basket classic on the co-purchase baskets: for every
# ordered part pair (a -> b) sharing >= MINSUP orders, support
# P(a,b), confidence P(b|a) and lift P(a,b)/(P(a)P(b)) — the rule
# screen behind "customers also bought". Pair generation is MAP-SIDE
# (the E22 q_part_cooccurrence pattern, VERDICT r6 What's wrong #1):
# each order's sorted part set yields its C(k,2) unordered pairs via
# array HOFs inside one task, the pair counts aggregate once, and the
# ordered (ante, cons) view is the unordered count mirrored both ways
# — no basket self-join (which shuffles the fact twice and explodes
# skewed baskets quadratically on single tasks BEFORE any filter).
# Item counts and the basket total are broadcast. Top-15 rules by
# lift with deterministic tie-breaks.

_RULES_MINSUP = 3

_RULES_ORACLE = f"""
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
nb AS (SELECT COUNT(DISTINCT l_orderkey)::DOUBLE AS n FROM baskets),
item AS (SELECT l_partkey, COUNT(*)::BIGINT AS n_i FROM baskets GROUP BY 1),
pair AS (
  SELECT a.l_partkey AS ante, b.l_partkey AS cons, COUNT(*)::BIGINT AS n_ab
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey != b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_RULES_MINSUP}
)
SELECT p.ante, p.cons, p.n_ab,
       ROUND(p.n_ab / nb.n, 6) AS support,
       ROUND(p.n_ab::DOUBLE / ia.n_i, 6) AS confidence,
       ROUND(p.n_ab * nb.n / (ia.n_i * ic.n_i), 6) AS lift
FROM pair p
JOIN item ia ON ia.l_partkey = p.ante
JOIN item ic ON ic.l_partkey = p.cons, nb
ORDER BY ROUND(p.n_ab * nb.n / (ia.n_i * ic.n_i), 6) DESC, p.ante, p.cons
LIMIT 15
"""


@register(
    "q_association_rules",
    oracle=_RULES_ORACLE,
    doc="association rules (E155): support/confidence/lift for ordered "
    "co-purchase pairs above a minimum support, top-15 by lift — one "
    "basket-rollup pair count with item counts and the basket total "
    "broadcast; the market-basket rule screen",
)
def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # one shuffle builds the per-order part set; everything pair-shaped
    # is generated map-side from the sorted array (E22 pattern)
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    ).localCheckpoint()
    nb = baskets.count()
    item = baskets.select(F.explode("parts").alias("l_partkey")).groupBy(
        "l_partkey"
    ).agg(F.count("*").alias("n_i"))
    upairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) -> "
                    "transform(slice(parts, i + 2, size(parts)), "
                    "y -> struct(x AS lo, y AS hi))))"
                )
            ).alias("p")
        )
        .groupBy("p.lo", "p.hi")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= _RULES_MINSUP)
    )
    # ordered rules are the unordered co-count mirrored both directions
    pair = upairs.select(
        F.col("lo").alias("ante"), F.col("hi").alias("cons"), "n_ab"
    ).unionAll(
        upairs.select(
            F.col("hi").alias("ante"), F.col("lo").alias("cons"), "n_ab"
        )
    )
    ia = F.broadcast(item.select(F.col("l_partkey").alias("ante"), F.col("n_i").alias("na")))
    ic = F.broadcast(item.select(F.col("l_partkey").alias("cons"), F.col("n_i").alias("nc")))
    lift = F.col("n_ab") * F.lit(float(nb)) / (F.col("na") * F.col("nc"))
    return (
        pair.join(ia, "ante")
        .join(ic, "cons")
        .select(
            "ante",
            "cons",
            "n_ab",
            F.round(F.col("n_ab") / F.lit(float(nb)), 6).alias("support"),
            F.round(F.col("n_ab").cast("double") / F.col("na"), 6).alias(
                "confidence"
            ),
            F.round(lift, 6).alias("lift"),
        )
        .orderBy(F.desc(F.round(lift, 6)), "ante", "cons")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# E156: embedding class-separability (Fisher ratio)
# ---------------------------------------------------------------------------
# The one-pass sibling of the silhouette audit (E90): per label,
# within-class scatter = mean per-dim variance; between-class scatter =
# label-count-weighted squared distance of the label centroid to the
# global centroid. Fisher ratio = between/within — the cheap "are my
# labels even separable in this space" readout from ONE grouped moments
# pass (labels x dims rows, label-sized downstream). Means pre-rounded
# at 6dp so both engines square identical doubles.

_FISHER_ORACLE = """
WITH x AS (
  SELECT label, i - 1 AS i, e::DOUBLE AS v
  FROM (SELECT label, unnest(embedding) AS e,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings)
),
per AS (
  SELECT label, i, COUNT(*)::BIGINT AS n,
         ROUND(AVG(v), 6) AS m, VAR_POP(v) AS s2
  FROM x GROUP BY label, i
),
gm_t AS (
  SELECT i, ROUND(AVG(v), 6) AS gm FROM x GROUP BY i
),
lab AS (
  SELECT p.label, ANY_VALUE(p.n) AS n,
         SUM((p.m - g.gm) * (p.m - g.gm)) AS between_sq,
         SUM(p.s2) AS within_var
  FROM per p JOIN gm_t g ON g.i = p.i
  GROUP BY p.label
),
tot AS (SELECT SUM(n)::DOUBLE AS nt FROM lab)
SELECT l.label, l.n,
       ROUND(l.between_sq, 6) AS between_sq,
       ROUND(l.within_var, 6) AS within_var,
       ROUND(l.between_sq / l.within_var, 6) AS fisher_ratio,
       ROUND(SUM(l.n * l.between_sq) OVER () /
             SUM(l.n * l.within_var) OVER (), 6) AS fisher_pooled
FROM lab l, tot
ORDER BY l.label
"""


@register(
    "q_fisher_separability",
    oracle=_FISHER_ORACLE,
    doc="embedding class-separability (E156): per-label Fisher ratio "
    "(between-centroid scatter / within-class variance, 6dp-pre-rounded "
    "means) plus the count-weighted pooled ratio — one grouped moments "
    "pass, labels x dims downstream; the cheap are-labels-separable "
    "readout next to the E90 silhouette",
)
def q_fisher_separability(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "v"),
    )
    per = x.groupBy("label", "i").agg(
        F.count("*").alias("n"),
        F.round(F.avg("v"), 6).alias("m"),
        F.var_pop("v").alias("s2"),
    )
    glob = x.groupBy("i").agg(F.round(F.avg("v"), 6).alias("gm"))
    lab = (
        per.join(F.broadcast(glob), "i")
        .groupBy("label")
        .agg(
            F.any_value("n").alias("n"),
            F.sum((F.col("m") - F.col("gm")) * (F.col("m") - F.col("gm"))).alias(
                "between_sq"
            ),
            F.sum("s2").alias("within_var"),
        )
    )
    w_all = Window.partitionBy()
    return lab.select(
        "label",
        "n",
        F.round("between_sq", 6).alias("between_sq"),
        F.round("within_var", 6).alias("within_var"),
        F.round(F.col("between_sq") / F.col("within_var"), 6).alias(
            "fisher_ratio"
        ),
        F.round(
            F.sum(F.col("n") * F.col("between_sq")).over(w_all)
            / F.sum(F.col("n") * F.col("within_var")).over(w_all),
            6,
        ).alias("fisher_pooled"),
    ).orderBy("label")


# ---------------------------------------------------------------------------
# E157: revenue concentration — Lorenz deciles + top-share
# ---------------------------------------------------------------------------
# The Gini query (E40) reports the scalar; capacity planning needs the
# CURVE: customers ranked by revenue, cumulative revenue share at each
# decile, plus the top-1%/top-10% shares — the "how few customers are
# the business" readout. The global ranking is the E9 problem: done on
# the per-customer rollup (customer-sized, ~1/15 of orders) via ntile
# over the rollup, never a row-level global sort.

_LORENZ_ORACLE = """
WITH per AS (
  SELECT o_custkey, SUM(o_totalprice) AS rev
  FROM orders GROUP BY o_custkey
),
tot AS (SELECT SUM(rev) AS t, COUNT(*)::BIGINT AS n FROM per),
ranked AS (
  SELECT rev, NTILE(10) OVER (ORDER BY rev, o_custkey) AS decile
  FROM per
)
SELECT decile,
       COUNT(*)::BIGINT AS n_customers,
       ROUND(SUM(rev), 2) AS revenue,
       ROUND(SUM(rev) / tot.t, 6) AS rev_share,
       ROUND(SUM(SUM(rev)) OVER (ORDER BY decile) / tot.t, 6)
         AS cum_share
FROM ranked, tot
GROUP BY decile, tot.t
ORDER BY decile
"""


@register(
    "q_lorenz_deciles",
    oracle=_LORENZ_ORACLE,
    doc="revenue concentration curve (E157): customers ranked into "
    "revenue deciles (ntile over the CUSTOMER-sized rollup, never a "
    "row-level global sort), per-decile revenue share and the Lorenz "
    "cumulative share — the curve behind the E40 Gini scalar",
)
def q_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators.rownum import global_row_number

    orders = load_table(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("rev"))
    tot = per.agg(F.sum("rev").alias("t"), F.count("*").alias("n"))
    # deciles via the E9 scalable global rank (per-slice windows +
    # broadcast offsets — a plain ntile would single-task-sort the
    # whole customer rollup, the q_weighted_median failure class), then
    # the NTILE-exact bucket formula: with n = 10q + r, the first r
    # buckets take q+1 rows — identical assignment to the oracle's
    # NTILE(10), integer-exact on both engines
    ranked_rn = global_row_number(per, ["rev", "o_custkey"], out_col="rn")
    q_ = F.floor(F.col("n") / 10)
    r_ = F.col("n") % 10
    big = r_ * (q_ + 1)  # rows living in the (q+1)-sized buckets
    ceil_div = lambda a, b: F.floor((a + b - F.lit(1)) / b).cast("int")
    decile = F.when(F.col("rn") <= big, ceil_div(F.col("rn"), q_ + 1)).otherwise(
        (r_ + ceil_div(F.col("rn") - big, q_)).cast("int")
    )
    ranked = ranked_rn.crossJoin(
        F.broadcast(tot.select(F.col("n").alias("n")))
    ).select("rev", decile.alias("decile"))
    dec = ranked.groupBy("decile").agg(
        F.count("*").alias("n_customers"), F.sum("rev").alias("drev")
    )
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        dec.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            F.round("drev", 2).alias("revenue"),
            F.round(F.col("drev") / F.col("t"), 6).alias("rev_share"),
            F.round(F.sum("drev").over(wcum) / F.col("t"), 6).alias(
                "cum_share"
            ),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# E158: ORC round-trip interop audit
# ---------------------------------------------------------------------------
# The at-rest format matrix (K3) is pytest-asserted; this promotes the
# ORC leg to an oracle-checked round trip: orders written as ORC
# (Spark's second first-class columnar format), read back, and
# aggregated — the hash match against the parquet-derived oracle proves
# the round trip is value-exact (timestamps, doubles, strings) and the
# predicate still prunes at the ORC reader. The store roots under the
# warehouse dir like every at-rest audit.

_ORC_ORACLE = """
SELECT o_orderpriority,
       COUNT(*)::BIGINT AS n,
       ROUND(SUM(o_totalprice), 2) AS total,
       MIN(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')) AS first_date
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "q_orc_roundtrip",
    oracle=_ORC_ORACLE,
    doc="ORC round-trip interop audit (E158): orders written as ORC, "
    "read back, filtered and aggregated — the hash match against the "
    "parquet-derived oracle proves the second columnar format's round "
    "trip is value-exact (doubles, strings, timestamps) with the "
    "filter still pushed to the ORC reader",
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    scratch = _warehouse_scratch(spark, "orc")
    try:
        orders.write.mode("overwrite").orc(scratch)
        back = spark.read.orc(scratch)
        return (
            back.filter(F.col("o_orderstatus") == "F")
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("o_totalprice"), 2).alias("total"),
                F.min(
                    F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
                ).alias("first_date"),
            )
            .orderBy("o_orderpriority")
            .localCheckpoint()  # materialize before the scratch dir dies
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
