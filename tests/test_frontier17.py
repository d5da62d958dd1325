"""Round-7 batch (E176-E177) value contracts at smoke scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from dumpty_spark.queries import REGISTRY


def test_lttb_keeps_endpoints_and_one_point_per_bucket(spark, sf_smoke):
    from dumpty_spark.sources.parquet import load_table

    rows = REGISTRY["q_lttb_downsample"].fn(spark, sf_smoke).collect()
    ev = load_table(spark, sf_smoke, "events")
    bounds = {
        r["event_type"]: (r["t0"], r["t1"])
        for r in ev.select(
            "event_type", F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("u")
        )
        .groupBy("event_type")
        .agg(F.min("u").alias("t0"), F.max("u").alias("t1"))
        .collect()
    }
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, pts in by_type.items():
        ts = [p["t_us"] for p in pts]
        assert min(ts) == bounds[t][0] and max(ts) == bounds[t][1]
        buckets = [p["bucket"] for p in pts]
        # at most one pick per interior bucket
        interior = [b for b in buckets if b not in (0, 23)]
        assert len(interior) == len(set(interior))
        # output is a tiny fraction of the series
        assert len(pts) <= 26


def test_item_knn_ranked_and_symmetric_similarity(spark, sf_smoke):
    rows = REGISTRY["q_item_knn"].fn(spark, sf_smoke).collect()
    assert rows, "no recommendations at smoke scale"
    by_item: dict = {}
    for r in rows:
        by_item.setdefault(r["item"], []).append(r)
    for item, recs in by_item.items():
        assert [r["rnk"] for r in recs] == list(range(1, len(recs) + 1))
        cos = [r["cosine"] for r in recs]
        assert cos == sorted(cos, reverse=True)
        assert all(0 < c <= 1.0 for c in cos)
        assert all(r["rec"] != item for r in recs)
