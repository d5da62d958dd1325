"""Streaming maintenance of the at-rest sketch stores (E45/E51 × I-DELEG):
micro-batches fold into the HLL and quantile stores through foreachBatch,
and cross-batch estimates stay inside their error envelopes — the
streaming-ingest path for the same stores the batch queries prove exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dumpty_spark.operators import quantiles as Q
from dumpty_spark.operators import sketches as SK
from dumpty_spark.sources import load_table


def test_streaming_sketch_store_maintenance(spark, sf_smoke, tmp_path):
    from dumpty_spark.streaming.windows import read_events_stream

    hll_dir = str(tmp_path / "hll")
    q_dir = str(tmp_path / "q")
    stream = read_events_stream(spark, sf_smoke).select(
        "event_id", "event_type", "user_id", "value"
    )

    def fold(df, epoch_id):
        SK.sketch_store_append(
            df, hll_dir, ["event_type"], "user_id", f"e{epoch_id}"
        )
        Q.quantile_store_append(
            df, q_dir, ["event_type"], "value", "event_id", f"e{epoch_id}"
        )

    q = (
        stream.writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(180)

    events = load_table(spark, sf_smoke, "events")
    exact_distinct = {
        r["event_type"]: r["d"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    est_distinct = {
        r["event_type"]: r["approx_distinct"]
        for r in SK.sketch_store_estimate(
            spark, hll_dir, ["event_type"]
        ).collect()
    }
    assert set(est_distinct) == set(exact_distinct)
    for t, d in exact_distinct.items():
        assert abs(est_distinct[t] - d) / d < 0.05

    exact_median = {
        r["event_type"]: r["m"]
        for r in events.groupBy("event_type")
        .agg(F.percentile("value", F.lit(0.5)).alias("m"))
        .collect()
    }
    est_median = {
        r["event_type"]: r["est"]
        for r in Q.quantile_store_estimate(
            spark, q_dir, ["event_type"], [0.5]
        ).collect()
    }
    # sf_smoke groups fit under k, so the coordinated sample is the full
    # group and the streaming-built estimate is EXACT
    for t, m in exact_median.items():
        assert est_median[t] == m
