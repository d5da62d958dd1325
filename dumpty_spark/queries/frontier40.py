"""Round-8 engine extensions, fifteenth batch (EXT E226-E228): the
watermark-delay tuning profile, length-balanced acceptance resampling,
and the at-rest layout overlap-depth audit.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dumpty_spark.queries import register
from dumpty_spark.session import scratch_cleanup, warehouse_scratch
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E226: watermark-delay tuning profile
# ---------------------------------------------------------------------------
# The streaming family consumes watermarks (tumbling/session windows,
# dropDuplicatesWithinWatermark); this produces the number a deployment
# sets them FROM: given the observed arrival process, how many events
# would each candidate watermark delay drop? The fixture's arrival
# order is clean by construction, so lateness is PLANTED
# deterministically (the E180 planted-findings discipline): md5-keyed
# 30% of events arrive h%600 seconds late. An event is dropped at
# delay d when the high-water mark at its arrival exceeds its event
# time by more than d — one per-type arrival-order window pass (the
# watermark state machine replayed exactly), then one conditional
# rollup per candidate delay. Per-type windows keep the pass
# shuffle-partitioned; no global sort exists.

_WM_DELAYS = (60, 300, 600, 1800)

_WM_ORACLE = f"""
WITH e AS (
  SELECT event_id, event_type, floor(epoch(ts))::BIGINT AS t,
         ('0x' || substr(md5(event_id::VARCHAR), 1, 15))::BIGINT AS h
  FROM events
),
arr AS (
  SELECT event_type, t,
         t + CASE WHEN h % 10 < 3 THEN h % 600 ELSE 0 END AS arr_t,
         event_id
  FROM e
),
hw AS (
  SELECT event_type, t,
         MAX(t) OVER (PARTITION BY event_type ORDER BY arr_t, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS hwm
  FROM arr
),
lat AS (SELECT event_type, hwm - t AS late_s FROM hw),
d AS (SELECT UNNEST([{", ".join(str(d) for d in _WM_DELAYS)}]) AS delay_s)
SELECT d.delay_s::INT AS delay_s,
       COUNT(*)::BIGINT AS n_events,
       SUM((lat.late_s > d.delay_s)::INT)::BIGINT AS n_dropped,
       ROUND(SUM((lat.late_s > d.delay_s)::INT)
             / CAST(COUNT(*) AS DOUBLE), 6) AS pct_dropped
FROM lat CROSS JOIN d
GROUP BY d.delay_s
ORDER BY d.delay_s
"""


@register(
    "q_watermark_profile",
    oracle=_WM_ORACLE,
    doc="watermark-delay tuning profile (E226): the arrival process "
    "replayed through the high-water-mark state machine (one per-type "
    "arrival-order window pass — no global sort), then the would-drop "
    "count at four candidate delays; lateness planted "
    "md5-deterministically since the fixture arrives in order — the "
    "readout streaming watermarks are set FROM",
)
def q_watermark_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    t = F.unix_timestamp("ts")
    arr = ev.select(
        "event_type",
        "event_id",
        t.alias("t"),
        (
            t
            + F.when(h % 10 < 3, h % 600).otherwise(F.lit(0))
        ).alias("arr_t"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("arr_t", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lat = arr.select((F.max("t").over(w) - F.col("t")).alias("late_s"))
    d = F.explode(
        F.array(*[F.lit(x) for x in _WM_DELAYS])
    ).alias("delay_s")
    return (
        lat.select("late_s", d)
        .groupBy("delay_s")
        .agg(
            F.count("*").alias("n_events"),
            F.sum((F.col("late_s") > F.col("delay_s")).cast("int")).alias(
                "n_dropped"
            ),
            F.round(
                F.sum((F.col("late_s") > F.col("delay_s")).cast("int"))
                / F.count("*").cast("double"),
                6,
            ).alias("pct_dropped"),
        )
        .select(F.col("delay_s").cast("int").alias("delay_s"),
                "n_events", "n_dropped", "pct_dropped")
        .orderBy("delay_s")
    )


# ---------------------------------------------------------------------------
# E227: length-balanced acceptance resampling
# ---------------------------------------------------------------------------
# The distribution-matching half of the sampling family (E7 samples a
# RATE or a COUNT; this samples to a SHAPE): per length bucket, accept
# with rate min_bucket_n / bucket_n so every bucket keeps ~the smallest
# bucket's mass — the uniform-length-mix resample a curation pipeline
# runs when long docs dominate token budget. Acceptance is the
# deterministic hash-threshold discipline (E7), and the comparison is
# ALL-INTEGER: accept iff (h mod 2^30) * n_b < min_n * 2^30 — no float
# rate ever materializes, so both engines accept the identical doc
# set. Two partial-agg scans + one broadcast of a buckets-sized frame.

_RESAMPLE_ORACLE = """
WITH d AS (
  SELECT doc_id, LEAST(n_chars // 100, 5)::INT AS bin,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
           % 1073741824 AS h30
  FROM documents
),
b AS (SELECT bin, COUNT(*)::BIGINT AS n FROM d GROUP BY bin),
mn AS (SELECT MIN(n) AS min_n FROM b),
acc AS (
  SELECT d.bin, COUNT(*)::BIGINT AS n,
         SUM((d.h30 * b.n < mn.min_n * 1073741824)::INT)::BIGINT
           AS n_accepted
  FROM d JOIN b ON b.bin = d.bin CROSS JOIN mn
  GROUP BY d.bin
),
tot AS (
  SELECT SUM(n)::BIGINT AS nn, SUM(n_accepted)::BIGINT AS na FROM acc
)
SELECT acc.bin, acc.n, acc.n_accepted,
       ROUND(acc.n / CAST(tot.nn AS DOUBLE), 6) AS share,
       ROUND(acc.n_accepted / CAST(tot.na AS DOUBLE), 6) AS achieved_share
FROM acc, tot
ORDER BY acc.bin
"""


@register(
    "q_balanced_resample",
    oracle=_RESAMPLE_ORACLE,
    doc="length-balanced acceptance resampling (E227): per length "
    "bucket accept at rate min_n/n_b via the deterministic hash "
    "threshold, compared ALL-INTEGER ((h mod 2^30)·n_b < min_n·2^30) "
    "so no float rate exists — resamples the corpus toward a uniform "
    "length mix; two partial-agg scans + one buckets-sized broadcast",
)
def q_balanced_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h30 = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
        ).cast("long")
        % F.lit(1073741824)
    )
    d = docs.select(
        F.least(F.floor(F.col("n_chars") / 100), F.lit(5))
        .cast("int")
        .alias("bin"),
        h30.alias("h30"),
    )
    b = d.groupBy("bin").agg(F.count("*").alias("n"))
    mn = b.agg(F.min("n").alias("min_n"))
    acc = (
        d.join(F.broadcast(b), "bin")
        .crossJoin(F.broadcast(mn))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                (
                    F.col("h30") * F.col("n")
                    < F.col("min_n") * F.lit(1073741824)
                ).cast("int")
            ).alias("n_accepted"),
        )
    )
    tot = acc.agg(
        F.sum("n").alias("nn"), F.sum("n_accepted").alias("na")
    )
    return (
        acc.crossJoin(F.broadcast(tot))
        .select(
            "bin", "n", "n_accepted",
            F.round(F.col("n") / F.col("nn").cast("double"), 6).alias(
                "share"
            ),
            F.round(
                F.col("n_accepted") / F.col("na").cast("double"), 6
            ).alias("achieved_share"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# E228: at-rest layout overlap-depth audit
# ---------------------------------------------------------------------------
# The layout-health metric that PREDICTS skipping effectiveness before
# any query runs (the "clustering depth" in LSM/Delta OPTIMIZE
# terminology): for K probe points, how many files' [min, max] ranges
# contain each probe? A range-clustered layout answers ≤1 (pairwise-
# disjoint ranges; a probe in a data gap hits 0); a hash layout makes
# every file span ~the whole domain, so every probe hits ~all files.
# Footer statistics only — the audit never reads data pages, exactly
# like the planner that would consume it. Hashed surface: the two
# structural facts (clustered max depth ≤ 1, hash layout strictly
# deeper on average) plus exact file/probe counts.

_DEPTH_PROBES = 32

_DEPTH_ORACLE = f"""
SELECT {_DEPTH_PROBES}::INT AS n_probes,
       8::BIGINT AS clustered_files, 8::BIGINT AS hash_files,
       TRUE AS clustered_disjoint_ok, TRUE AS hash_overlaps_more
"""


@register(
    "q_layout_depth_audit",
    oracle=_DEPTH_ORACLE,
    doc="at-rest layout overlap-depth audit (E228): K probe points "
    "against per-file [min,max] footer ranges — range-clustered "
    "answers ≤1 file per probe (pairwise-disjoint), hash layout ~all "
    "files; footer metadata only, no data pages, exactly the pass a "
    "skipping planner runs; the clustering-depth health metric behind "
    "OPTIMIZE decisions",
)
def q_layout_depth_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow.parquet as pq

    from dumpty_spark.sinks.writers import write_range_clustered

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("t")
    )
    scratch = warehouse_scratch(spark, "layoutdepth")
    clu, hsh = f"{scratch}/clustered", f"{scratch}/hashed"
    try:
        write_range_clustered(ev, clu, ["t"], num_files=8)
        ev.repartition(8, "event_id").write.mode("overwrite").parquet(hsh)

        def ranges(path: str, col: str) -> list:
            out = []
            for p in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
                md = pq.read_metadata(p)
                names = [
                    md.schema.column(i).name for i in range(md.num_columns)
                ]
                ci = names.index(col)
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    mins.append(st.min)
                    maxs.append(st.max)
                out.append((min(mins), max(maxs)))
            return out

        r_clu, r_hsh = ranges(clu, "t"), ranges(hsh, "t")
        row = ev.agg(F.min("t").alias("mn"), F.max("t").alias("mx")).first()
        mn, mx = row["mn"], row["mx"]
        probes = [
            mn + (i + 1) * (mx - mn) // (_DEPTH_PROBES + 1)
            for i in range(_DEPTH_PROBES)
        ]

        def depths(rs: list) -> list:
            return [
                sum(1 for lo, hi in rs if lo <= p <= hi) for p in probes
            ]

        d_clu, d_hsh = depths(r_clu), depths(r_hsh)
        return spark.createDataFrame(
            [
                (
                    _DEPTH_PROBES,
                    len(r_clu),
                    len(r_hsh),
                    bool(max(d_clu) <= 1),
                    bool(
                        sum(d_hsh) > sum(d_clu)
                    ),
                )
            ],
            "n_probes int, clustered_files long, hash_files long, "
            "clustered_disjoint_ok boolean, hash_overlaps_more boolean",
        )
    finally:
        scratch_cleanup(spark, scratch)
