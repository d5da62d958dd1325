"""Round-5 engine extensions, second batch (EXT E113-E115): incremental
aggregate-view maintenance, Merkle-range diff location, split-conformal
interval calibration.

E113 closes the materialized-view loop the sketch/quantile/CMS stores
opened: EXACT per-group aggregates maintained from batch partials, never
re-reading history. E114 is the anti-entropy primitive: find WHICH rows
changed between two 100 TB snapshots by comparing range digests level by
level, scanning only flagged ranges — O(changed) data movement instead of
O(table). E115 is the modern ML-calibration step: distribution-free
prediction intervals whose coverage the oracle re-checks exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dumpty_spark.operators.sampling import bucket_fraction, bucket_fraction_sql
from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E113: incremental aggregate-view maintenance
# ---------------------------------------------------------------------------
# Two ingest batches (event_id parity), each reduced to per-group
# (count, sum, min, max) partials at rest; the readout merges partials
# only. The oracle aggregates the raw union directly — the hash match
# proves delta-maintenance ≡ full recompute.

_AGG_VIEW_ORACLE = """
SELECT event_type,
       COUNT(value)::BIGINT AS cnt,
       ROUND(SUM(value), 4) AS total,
       ROUND(MIN(value), 4) AS vmin,
       ROUND(MAX(value), 4) AS vmax,
       ROUND(SUM(value) / COUNT(value), 4) AS vavg
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q_agg_view_batches",
    oracle=_AGG_VIEW_ORACLE,
    doc="incremental aggregate-view maintenance (E113): per-group "
    "count/sum/min/max kept current from batch PARTIALS at rest "
    "(hive-partitioned per batch, idempotent re-ingest), avg derived at "
    "read time — history never re-read; oracle aggregates the raw data, "
    "so the hash match proves delta-apply ≡ full recompute",
)
def q_agg_view_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from dumpty_spark.operators import aggview as AV
    from dumpty_spark.session import warehouse_scratch

    ev = load_table(spark, sf_dir, "events")
    tmp = warehouse_scratch(spark, "aggview")
    try:
        store = f"{tmp}/aggview"
        for bid, parity in (("b0", 0), ("b1", 1)):
            AV.agg_view_append(
                ev.filter(F.col("event_id") % 2 == parity),
                store,
                ["event_type"],
                "value",
                bid,
            )
        return (
            AV.agg_view_read(spark, store, ["event_type"])
            .select(
                "event_type",
                F.col("cnt"),
                F.round("s", 4).alias("total"),
                F.round("mn", 4).alias("vmin"),
                F.round("mx", 4).alias("vmax"),
                F.round("avg", 4).alias("vavg"),
            )
            .orderBy("event_type")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# E114: Merkle-range diff locator — find the changed rows without
# scanning both snapshots
# ---------------------------------------------------------------------------
# Snapshot B is snapshot A (orders) with an in-query "update" applied to
# the hot key range [5000, 5040) (+1.00 on the total). The locator
# never diffs row-by-row globally: level-1 range digests (XOR of row
# hashes per 4096-key range) are compared first — table-sized scans but
# only digest-sized shuffles — then level-2 digests (256-key ranges) are
# computed ONLY inside flagged level-1 ranges, and the row-level diff
# join runs ONLY inside flagged level-2 ranges. At 100 TB with range-
# partitioned storage each level is a partition-pruned scan, so locating
# k changed rows moves O(k · range) data, not O(table). The emitted
# n_l1_flagged / n_l2_checked / n_l2_flagged columns make the pruning
# itself part of the hashed contract.

_L1_W = 4096
_L2_W = 256
_DIFF_LO = 5000  # the injected "update" touches keys [5000, 5040) — a
_DIFF_HI = 5040  # hot-range write, the realistic single-partition change

_MERKLE_ORACLE = f"""
WITH a AS (
  SELECT o_orderkey AS k, ROUND(o_totalprice, 2) AS price FROM orders
),
b AS (
  SELECT k,
         CASE WHEN k >= {_DIFF_LO} AND k < {_DIFF_HI}
              THEN ROUND(price + 1.0, 2) ELSE price END AS price
  FROM a
),
changed AS (
  SELECT a.k, a.price AS old_price, b.price AS new_price
  FROM a JOIN b USING (k) WHERE a.price <> b.price
),
l1_flagged AS (SELECT DISTINCT k // {_L1_W} AS l1 FROM changed),
l2_checked AS (
  SELECT DISTINCT a.k // {_L2_W} AS l2
  FROM a JOIN l1_flagged f ON a.k // {_L1_W} = f.l1
),
l2_flagged AS (SELECT DISTINCT k // {_L2_W} AS l2 FROM changed),
stats AS (
  SELECT (SELECT COUNT(DISTINCT k // {_L1_W}) FROM a)::BIGINT AS n_l1_total,
         (SELECT COUNT(*) FROM l1_flagged)::BIGINT AS n_l1_flagged,
         (SELECT COUNT(*) FROM l2_checked)::BIGINT AS n_l2_checked,
         (SELECT COUNT(*) FROM l2_flagged)::BIGINT AS n_l2_flagged
)
SELECT c.k AS o_orderkey,
       (c.k // {_L1_W})::BIGINT AS l1,
       (c.k // {_L2_W})::BIGINT AS l2,
       c.old_price, c.new_price,
       s.n_l1_total, s.n_l1_flagged, s.n_l2_checked, s.n_l2_flagged
FROM changed c CROSS JOIN stats s
ORDER BY o_orderkey
"""


def _range_digest(df: DataFrame, bucket: F.Column, alias: str) -> DataFrame:
    """XOR-of-row-hashes digest per key range — the same canonical md5
    encoding as q_dataset_fingerprint (E54), so digest equality certifies
    multiset equality of the range's rows."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("k").cast("string"),
                    F.col("price").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        df.select(bucket.alias(alias), h.alias("h"))
        .groupBy(alias)
        .agg(F.expr("bit_xor(h)").alias("digest"))
    )


@register(
    "q_merkle_diff",
    oracle=_MERKLE_ORACLE,
    doc="Merkle-range diff locator (E114): find the rows that changed "
    "between two snapshots by comparing XOR range digests coarse-to-fine "
    "(4096-key then 256-key ranges), scanning rows only inside flagged "
    "ranges — O(changed) data movement; the flagged/checked range counts "
    "are part of the hashed output, so the PRUNING is oracle-checked too",
)
def q_merkle_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.select(
        F.col("o_orderkey").alias("k"), F.round("o_totalprice", 2).alias("price")
    )
    b = a.select(
        "k",
        F.when(
            (F.col("k") >= _DIFF_LO) & (F.col("k") < _DIFF_HI),
            F.round(F.col("price") + 1.0, 2),
        )
        .otherwise(F.col("price"))
        .alias("price"),
    )

    # level 1: compare coarse digests (digest-sized join)
    d1a = _range_digest(a, F.floor(F.col("k") / _L1_W), "l1")
    d1b = _range_digest(b, F.floor(F.col("k") / _L1_W), "l1")
    l1_flagged = (
        d1a.alias("x")
        .join(d1b.alias("y"), "l1", "full_outer")
        .filter(~F.col("x.digest").eqNullSafe(F.col("y.digest")))
        .select("l1")
    )

    # level 2: digests only inside flagged level-1 ranges
    a1 = a.withColumn("l1", F.floor(F.col("k") / _L1_W)).join(
        F.broadcast(l1_flagged), "l1"
    )
    b1 = b.withColumn("l1", F.floor(F.col("k") / _L1_W)).join(
        F.broadcast(l1_flagged), "l1"
    )
    d2a = _range_digest(a1, F.floor(F.col("k") / _L2_W), "l2")
    d2b = _range_digest(b1, F.floor(F.col("k") / _L2_W), "l2")
    l2_flagged = (
        d2a.alias("x")
        .join(d2b.alias("y"), "l2", "full_outer")
        .filter(~F.col("x.digest").eqNullSafe(F.col("y.digest")))
        .select("l2")
    )

    # row-level diff only inside flagged level-2 ranges
    a2 = a1.withColumn("l2", F.floor(F.col("k") / _L2_W)).join(
        F.broadcast(l2_flagged), "l2"
    )
    b2 = b1.withColumn("l2", F.floor(F.col("k") / _L2_W)).join(
        F.broadcast(l2_flagged), "l2"
    )
    changed = (
        a2.select("k", "l1", "l2", F.col("price").alias("old_price"))
        .join(b2.select("k", F.col("price").alias("new_price")), "k")
        .filter(F.col("old_price") != F.col("new_price"))
    )

    stats = (
        a.select(F.floor(F.col("k") / _L1_W).alias("l1"))
        .agg(F.countDistinct("l1").alias("n_l1_total"))
        .crossJoin(l1_flagged.agg(F.count("*").alias("n_l1_flagged")))
        .crossJoin(
            a1.select(F.floor(F.col("k") / _L2_W).alias("l2"))
            .agg(F.countDistinct("l2").alias("n_l2_checked"))
        )
        .crossJoin(l2_flagged.agg(F.count("*").alias("n_l2_flagged")))
    )
    return (
        changed.crossJoin(F.broadcast(stats))
        .select(
            F.col("k").alias("o_orderkey"),
            "l1",
            "l2",
            "old_price",
            "new_price",
            "n_l1_total",
            "n_l1_flagged",
            "n_l2_checked",
            "n_l2_flagged",
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# E115: split-conformal prediction-interval calibration
# ---------------------------------------------------------------------------
# Distribution-free intervals, the standard post-hoc ML calibration:
# portable md5 split into train (50%) / calibration (25%) / test (25%);
# the predictor is the train mean per series; the interval half-width is
# the ⌈0.9·(n_cal+1)⌉-th smallest calibration residual (an ORDER
# STATISTIC, not an interpolated quantile — exactly portable across
# engines); the reported coverage is the test fraction inside the
# interval. Both engines pre-round the mean and residuals to 6dp so an
# ulp of aggregation order can't flip a rank or a boundary comparison.

_CONF_ALPHA = 0.1

_CONFORMAL_ORACLE = f"""
WITH split AS (
  SELECT event_type, event_id, value,
         CASE WHEN {bucket_fraction_sql(["event_id"])} < 0.5 THEN 'train'
              WHEN {bucket_fraction_sql(["event_id"])} < 0.75 THEN 'cal'
              ELSE 'test' END AS part
  FROM events
),
mu AS (
  SELECT event_type, ROUND(AVG(value), 6) AS mu
  FROM split WHERE part = 'train' GROUP BY 1
),
cal AS (
  SELECT s.event_type,
         ROUND(ABS(s.value - m.mu), 6) AS r,
         ROW_NUMBER() OVER (PARTITION BY s.event_type
                            ORDER BY ROUND(ABS(s.value - m.mu), 6), s.event_id)
           AS rnk,
         COUNT(*) OVER (PARTITION BY s.event_type) AS n_cal
  FROM split s JOIN mu m USING (event_type) WHERE s.part = 'cal'
),
qhat AS (
  SELECT event_type, n_cal, r AS q
  FROM cal
  WHERE rnk = LEAST(CEIL({1.0 - _CONF_ALPHA} * (n_cal + 1)), n_cal)
),
tst AS (
  SELECT s.event_type, COUNT(*) AS n_test,
         SUM(CASE WHEN ROUND(ABS(s.value - m.mu), 6) <= q.q
                  THEN 1 ELSE 0 END) AS covered
  FROM split s JOIN mu m USING (event_type) JOIN qhat q USING (event_type)
  WHERE s.part = 'test'
  GROUP BY 1
)
SELECT t.event_type,
       q.n_cal::BIGINT AS n_cal,
       t.n_test::BIGINT AS n_test,
       ROUND(q.q, 4) AS qhat,
       ROUND(t.covered::DOUBLE / t.n_test, 4) AS coverage
FROM tst t JOIN qhat q USING (event_type)
ORDER BY t.event_type
"""


@register(
    "q_conformal_intervals",
    oracle=_CONFORMAL_ORACLE,
    doc="split-conformal calibration (E115): train/cal/test by portable "
    "md5 split, interval half-width = the ceil(0.9·(n_cal+1))-th smallest "
    "calibration residual (order statistic — exactly portable), coverage "
    "re-measured on test; 6dp pre-rounding kills ulp-order rank flips",
)
def q_conformal_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    frac = bucket_fraction(["event_id"])
    split = ev.select(
        "event_type",
        "event_id",
        "value",
        F.when(frac < 0.5, "train").when(frac < 0.75, "cal").otherwise("test")
        .alias("part"),
    )
    mu = (
        split.filter(F.col("part") == "train")
        .groupBy("event_type")
        .agg(F.round(F.avg("value"), 6).alias("mu"))
    )
    cal = (
        split.filter(F.col("part") == "cal")
        .join(F.broadcast(mu), "event_type")
        .select(
            "event_type",
            "event_id",
            F.round(F.abs(F.col("value") - F.col("mu")), 6).alias("r"),
        )
    )
    wc = Window.partitionBy("event_type").orderBy("r", "event_id")
    wn = Window.partitionBy("event_type")
    qhat = (
        cal.withColumn("rnk", F.row_number().over(wc))
        .withColumn("n_cal", F.count("*").over(wn))
        .filter(
            F.col("rnk")
            == F.least(
                F.ceil((1.0 - _CONF_ALPHA) * (F.col("n_cal") + 1)),
                F.col("n_cal"),
            )
        )
        .select("event_type", "n_cal", F.col("r").alias("q"))
    )
    tst = (
        split.filter(F.col("part") == "test")
        .join(F.broadcast(mu), "event_type")
        .join(F.broadcast(qhat), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_test"),
            F.sum(
                F.when(
                    F.round(F.abs(F.col("value") - F.col("mu")), 6) <= F.col("q"), 1
                ).otherwise(0)
            ).alias("covered"),
            F.first("n_cal").alias("n_cal"),
            F.round(F.first("q"), 4).alias("qhat"),
        )
    )
    return tst.select(
        "event_type",
        "n_cal",
        "n_test",
        "qhat",
        F.round(F.col("covered") / F.col("n_test"), 4).alias("coverage"),
    ).orderBy("event_type")
