"""Round-7 engine extensions, fifth batch (EXT E176-E177): triangle-area
time-series downsampling and item-based collaborative-filtering top-k.

Design rules: bucket-local windows only (no global sorts), the shared
co-purchase basket rollup shape, exact DuckDB oracles with rounded
ranking keys so orderings are engine-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E176: largest-triangle downsampling (LTOB) for series visualization
# ---------------------------------------------------------------------------
# The observability-pipeline reducer: shrink each event-type series to
# ~24 visually-representative points by keeping, per time bucket, the
# point forming the largest triangle with its immediate neighbors
# (Steinarsson's largest-triangle-one-bucket — the bucket-parallel
# member of the LTTB family; LTTB's previously-selected-point recursion
# is inherently sequential, LTOB keeps the plan one LAG/LEAD window +
# one argmax per bucket). Area via the cross-product formula on
# epoch-us x value, 4dp-pre-rounded so the per-bucket argmax cannot
# split on an ulp; first/last buckets keep their endpoint per the
# algorithm. One sort shuffle per series, bucket-local state.

_LTOB_BUCKETS = 24

_LTOB_ORACLE = f"""
WITH pts AS (
  SELECT event_type, epoch_us(ts) AS t, value AS v,
         event_id
  FROM events
),
ext AS (
  SELECT event_type, MIN(t) AS t0, MAX(t) AS t1 FROM pts GROUP BY 1
),
bkt AS (
  SELECT p.event_type, p.t, p.v, p.event_id,
         -- explicit FLOOR: DuckDB's ::BIGINT on a double ROUNDS while
         -- Spark's cast truncates — the one place the engines disagree
         LEAST(FLOOR(((p.t - e.t0) * {_LTOB_BUCKETS})::DOUBLE
                     / (e.t1 - e.t0 + 1))::BIGINT,
               {_LTOB_BUCKETS - 1}) AS b
  FROM pts p JOIN ext e USING (event_type)
),
tri AS (
  SELECT event_type, b, t, v, event_id,
         ROUND(ABS(
           (LAG(t) OVER w - LEAD(t) OVER w) * (v - LEAD(v) OVER w)
           - (LAG(v) OVER w - LEAD(v) OVER w) * (t - LEAD(t) OVER w)
         ) / 2e6, 4) AS area
  FROM bkt
  WINDOW w AS (PARTITION BY event_type ORDER BY t, event_id)
),
pick AS (
  SELECT event_type, b, t, v,
         ROW_NUMBER() OVER (PARTITION BY event_type, b
                            ORDER BY area DESC NULLS LAST, t, event_id)
           AS rn,
         MIN(t) OVER (PARTITION BY event_type) AS t_first,
         MAX(t) OVER (PARTITION BY event_type) AS t_last
  FROM tri
)
SELECT event_type, b AS bucket, t::BIGINT AS t_us, ROUND(v, 4) AS v
FROM pick
WHERE (b = 0 AND t = t_first)
   OR (b = {_LTOB_BUCKETS - 1} AND t = t_last)
   OR (b NOT IN (0, {_LTOB_BUCKETS - 1}) AND rn = 1)
ORDER BY event_type, bucket, t_us
"""


@register(
    "q_lttb_downsample",
    oracle=_LTOB_ORACLE,
    doc="largest-triangle downsampling (E176, LTOB): per event type, "
    "keep the max-triangle-area point per time bucket (4dp-pre-rounded "
    "areas so the argmax is engine-stable), endpoints pinned — the "
    "series reducer dashboards run before plotting; one LAG/LEAD "
    "window pass per series + bucket-local ranking, no global sort",
)
def q_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    pts = ev.select(
        "event_type", us.alias("t"), F.col("value").alias("v"), "event_id"
    )
    ext = pts.groupBy("event_type").agg(
        F.min("t").alias("t0"), F.max("t").alias("t1")
    )
    b = F.least(
        F.floor(
            (F.col("t") - F.col("t0"))
            * _LTOB_BUCKETS
            / (F.col("t1") - F.col("t0") + 1)
        ).cast("long"),
        F.lit(_LTOB_BUCKETS - 1).cast("long"),
    )
    bkt = pts.join(F.broadcast(ext), "event_type").select(
        "event_type", "t", "v", "event_id", b.alias("b")
    )
    ws = Window.partitionBy("event_type").orderBy("t", "event_id")
    area = F.round(
        F.abs(
            (F.lag("t").over(ws) - F.lead("t").over(ws))
            * (F.col("v") - F.lead("v").over(ws))
            - (F.lag("v").over(ws) - F.lead("v").over(ws))
            * (F.col("t") - F.lead("t").over(ws))
        )
        / 2e6,
        4,
    )
    wt = Window.partitionBy("event_type")
    tri = bkt.select(
        "event_type", "b", "t", "v", "event_id", area.alias("area")
    ).withColumn("t_first", F.min("t").over(wt)).withColumn(
        "t_last", F.max("t").over(wt)
    )
    wb = Window.partitionBy("event_type", "b").orderBy(
        F.desc_nulls_last("area"), "t", "event_id"
    )
    pick = tri.withColumn("rn", F.row_number().over(wb))
    last_b = _LTOB_BUCKETS - 1
    return (
        pick.filter(
            ((F.col("b") == 0) & (F.col("t") == F.col("t_first")))
            | ((F.col("b") == last_b) & (F.col("t") == F.col("t_last")))
            | (~F.col("b").isin(0, last_b) & (F.col("rn") == 1))
        )
        .select(
            "event_type",
            F.col("b").alias("bucket"),
            F.col("t").alias("t_us"),
            F.round("v", 4).alias("v"),
        )
        .orderBy("event_type", "bucket", "t_us")
    )


# ---------------------------------------------------------------------------
# E177: item-based collaborative filtering (item-kNN)
# ---------------------------------------------------------------------------
# The recommender staple over the co-purchase baskets: per part, the
# top-5 most similar parts by co-occurrence cosine co/sqrt(n_a*n_b)
# (the normalization that, unlike raw co-counts, doesn't just rank
# popular items). Pair counts are generated MAP-SIDE from the basket
# rollup (the E22/E155 pattern — no basket self-join), item counts
# broadcast, per-item ranking over the pair frame with a support>=3
# gate; 6dp-rounded similarity + id tie-break keeps rankings
# engine-stable. Restricted to the 50 highest-degree anchor items so
# the hashed surface is stable under fixture growth.

_KNN_K = 5
_KNN_MINSUP = 3
_KNN_ANCHORS = 50

_KNN_ORACLE = f"""
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
items AS (SELECT l_partkey, COUNT(*)::BIGINT AS n FROM b GROUP BY 1),
co AS (
  SELECT x.l_partkey AS a, y.l_partkey AS c, COUNT(*)::BIGINT AS n_co
  FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey
                   AND x.l_partkey < y.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {_KNN_MINSUP}
),
sym AS (
  SELECT a, c, n_co FROM co UNION ALL SELECT c, a, n_co FROM co
),
anchors AS (
  SELECT l_partkey FROM items
  ORDER BY n DESC, l_partkey LIMIT {_KNN_ANCHORS}
),
scored AS (
  SELECT s.a AS item, s.c AS rec,
         ROUND(s.n_co / SQRT(ia.n * ic.n), 6) AS cosine
  FROM sym s
  JOIN items ia ON ia.l_partkey = s.a
  JOIN items ic ON ic.l_partkey = s.c
  WHERE s.a IN (SELECT l_partkey FROM anchors)
),
ranked AS (
  SELECT item, rec, cosine,
         ROW_NUMBER() OVER (PARTITION BY item
                            ORDER BY cosine DESC, rec) AS rnk
  FROM scored
)
SELECT item, rnk::BIGINT AS rnk, rec, cosine
FROM ranked WHERE rnk <= {_KNN_K}
ORDER BY item, rnk
"""


@register(
    "q_item_knn",
    oracle=_KNN_ORACLE,
    doc="item-based collaborative filtering (E177): per anchor part, "
    "top-5 similar parts by co-occurrence cosine co/sqrt(na*nb) — "
    "map-side pair generation (E22 pattern, no basket self-join), "
    "broadcast item counts, per-item ranking window, support>=3 gate, "
    "6dp-rounded engine-stable similarity; the 'customers also bought' "
    "ranked form of the E155 rule screen",
)
def q_item_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    ).localCheckpoint()
    items = baskets.select(F.explode("parts").alias("pk")).groupBy("pk").agg(
        F.count("*").alias("n")
    )
    co = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) -> "
                    "transform(slice(parts, i + 2, size(parts)), "
                    "y -> struct(x AS a, y AS c))))"
                )
            ).alias("p")
        )
        .groupBy("p.a", "p.c")
        .agg(F.count("*").alias("n_co"))
        .filter(F.col("n_co") >= _KNN_MINSUP)
    )
    sym = co.unionAll(
        co.select(F.col("c").alias("a"), F.col("a").alias("c"), "n_co")
    )
    anchors = (
        items.orderBy(F.desc("n"), "pk")
        .limit(_KNN_ANCHORS)
        .select(F.col("pk").alias("a"))
    )
    ia = F.broadcast(items.select(F.col("pk").alias("a"), F.col("n").alias("na")))
    ic = F.broadcast(items.select(F.col("pk").alias("c"), F.col("n").alias("nc")))
    scored = (
        sym.join(F.broadcast(anchors), "a", "left_semi")
        .join(ia, "a")
        .join(ic, "c")
        .select(
            F.col("a").alias("item"),
            F.col("c").alias("rec"),
            F.round(
                F.col("n_co") / F.sqrt(F.col("na") * F.col("nc")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("item").orderBy(F.desc("cosine"), "rec")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= _KNN_K)
        .select("item", "rnk", "rec", "cosine")
        .orderBy("item", "rnk")
    )
