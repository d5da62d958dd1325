"""True streaming-execution tests: the same transformations the batch
oracle checks, driven through readStream → memory sink, plus the custom
stateful operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dumpty_spark.sources import load_table
from dumpty_spark.streaming.stateful import running_user_totals
from dumpty_spark.streaming.windows import (
    read_events_stream,
    run_to_memory,
    tumbling_agg,
    watermark_dedup,
)


def test_streaming_tumbling_equals_batch(spark, sf_smoke):
    stream = read_events_stream(spark, sf_smoke)
    assert stream.isStreaming
    run_to_memory(tumbling_agg(stream, "1 hour"), "t_tumble", "complete")
    got = {
        (r["w_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("SELECT * FROM t_tumble").collect()
    }
    batch = tumbling_agg(load_table(spark, sf_smoke, "events"), "1 hour")
    want = {
        (r["w_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in batch.collect()
    }
    assert got == want


def test_streaming_watermark_dedup(spark, sf_smoke):
    stream = read_events_stream(spark, sf_smoke)
    deduped = watermark_dedup(stream, "1 hour")
    run_to_memory(deduped.select("event_id"), "t_dedup", "append")
    n = spark.sql("SELECT count(DISTINCT event_id) AS n FROM t_dedup").collect()[0]["n"]
    total = spark.sql("SELECT count(*) AS n FROM t_dedup").collect()[0]["n"]
    expected = load_table(spark, sf_smoke, "events").select("event_id").distinct().count()
    assert n == total == expected  # no dup rows emitted, none lost


def test_stateful_running_totals(spark, sf_smoke):
    stream = read_events_stream(spark, sf_smoke)
    run_to_memory(running_user_totals(stream), "t_state", "update")
    # last update per user must equal the batch per-user aggregate
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql(
            """
            SELECT user_id, n_events, total_value FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY n_events DESC) AS rn
              FROM t_state
            ) WHERE rn = 1
            """
        ).collect()
    }
    batch = (
        load_events := load_table(spark, sf_smoke, "events")
    ).groupBy("user_id").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("v")
    )
    want = {r["user_id"]: (r["n"], r["v"]) for r in batch.collect()}
    assert got == want


def test_stream_static_join_equals_batch(spark, sf_smoke, tmp_path):
    """Enriching the event stream with a static user-dim produces exactly
    the batch join result."""
    from dumpty_spark.sources import load_table
    from dumpty_spark.streaming.windows import enrich_stream, read_events_stream

    ev_batch = load_table(spark, sf_smoke, "events")
    dim = (
        ev_batch.groupBy("user_id")
        .agg(F.count("*").alias("user_events"))
    )
    stream = read_events_stream(spark, sf_smoke)
    enriched = enrich_stream(
        stream.select("event_id", "user_id"), dim, on=["user_id"]
    )
    from dumpty_spark.streaming.windows import run_to_memory

    run_to_memory(enriched, "enriched_t", output_mode="append")
    got = {
        (r["event_id"], r["user_events"])
        for r in spark.sql("SELECT * FROM enriched_t").collect()
    }
    want = {
        (r["event_id"], r["user_events"])
        for r in ev_batch.select("event_id", "user_id").join(dim, "user_id").collect()
    }
    assert got == want


def test_foreach_batch_sink_writes_everything(spark, sf_smoke, tmp_path):
    from dumpty_spark.streaming.windows import read_events_stream, run_foreach_batch_parquet

    out = str(tmp_path / "fb_out")
    stream = read_events_stream(spark, sf_smoke).select("event_id", "user_id")
    epochs = run_foreach_batch_parquet(stream, out)
    assert epochs, "at least one micro-batch"
    n = spark.read.parquet(out).count()
    from dumpty_spark.sources import load_table

    assert n == load_table(spark, sf_smoke, "events").count()


def test_available_now_incremental(spark, sf_smoke, tmp_path):
    """First AvailableNow run drains the source; a rerun with the same
    checkpoint processes zero rows — the incremental contract."""
    from dumpty_spark.sources import load_table
    from dumpty_spark.streaming.windows import (
        read_events_stream,
        run_available_now_parquet,
    )

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = read_events_stream(spark, sf_smoke).select("event_id", "user_id")
    n1 = run_available_now_parquet(stream, out, ckpt)
    assert n1 == load_table(spark, sf_smoke, "events").count()
    stream2 = read_events_stream(spark, sf_smoke).select("event_id", "user_id")
    n2 = run_available_now_parquet(stream2, out, ckpt)
    assert n2 == 0
    assert spark.read.parquet(out).count() == n1


def test_interval_join_stream_matches_batch(spark, sf_smoke):
    """The same interval_join plan run as a true stream-stream join
    (append mode, watermarked state) emits exactly the batch result."""
    from dumpty_spark.sources import load_table
    from dumpty_spark.streaming.windows import interval_join, read_events_stream

    batch_n = interval_join(load_table(spark, sf_smoke, "events")).count()
    stream = interval_join(read_events_stream(spark, sf_smoke))
    q = (
        stream.writeStream.format("memory")
        .queryName("ij_test")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT COUNT(*) AS n FROM ij_test").first()["n"]
    assert got == batch_n and batch_n > 0


def test_stateful_running_totals_tws(spark, sf_smoke):
    """The transformWithStateInPandas (Spark 4 typed-state) variant must
    converge to the same per-user totals as the batch aggregate — and as
    the applyInPandasWithState predecessor it supersedes."""
    # the typed-state protocol speaks protobuf between the JVM state
    # server and the Python processor — not a baked-in dependency here,
    # so the variant is gated (the applyInPandasWithState op above it is
    # the tested-everywhere path)
    pytest.importorskip("google.protobuf")
    from dumpty_spark.streaming.stateful import running_user_totals_tws

    # transformWithState runs only on the RocksDB state store (the
    # scale-grade backend with changelog checkpointing); the default
    # HDFS-backed provider is not supported by the new API
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_events_stream(spark, sf_smoke)
        run_to_memory(running_user_totals_tws(stream), "t_state_tws", "update")
    finally:
        spark.conf.set(provider_key, old)
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql(
            """
            SELECT user_id, n_events, total_value FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY n_events DESC) AS rn
              FROM t_state_tws
            ) WHERE rn = 1
            """
        ).collect()
    }
    batch = load_table(spark, sf_smoke, "events").groupBy("user_id").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("v")
    )
    want = {r["user_id"]: (r["n"], r["v"]) for r in batch.collect()}
    assert got == want


def test_interval_join_left_outer_semantics(spark, sf_smoke):
    """Outer stream-stream interval join: in batch mode it equals the
    plain left join (unmatched clicks carry NULLs); in streaming mode
    outer rows only emit once the watermark passes a_ts+gap, so at
    end-of-stream the streamed output is bounded between the inner and
    the batch-outer result — the watermark-state semantics Spark
    documents, asserted rather than assumed."""
    from dumpty_spark.streaming.windows import interval_join, read_events_stream

    ev = load_table(spark, sf_smoke, "events")
    inner_n = interval_join(ev).count()
    outer = interval_join(ev, how="leftOuter")
    outer_n = outer.count()
    n_clicks = ev.filter(F.col("event_type") == "click").count()
    matched_clicks = interval_join(ev).select("a_id").distinct().count()
    # every click appears; unmatched ones exactly once with NULL right
    assert outer_n == inner_n + (n_clicks - matched_clicks)
    assert outer.filter(F.col("b_id").isNull()).count() == n_clicks - matched_clicks

    stream = interval_join(read_events_stream(spark, sf_smoke), how="leftOuter")
    run_to_memory(stream, "t_outer_ij", "append")
    streamed_n = spark.sql("SELECT COUNT(*) AS n FROM t_outer_ij").collect()[0]["n"]
    assert inner_n <= streamed_n <= outer_n


def test_chained_window_rollup_stream_matches_batch(spark, sf_smoke):
    """Two stateful window aggs chained in ONE streaming query (hourly →
    daily re-window): every emitted day matches the batch plan exactly,
    and append mode withholds only trailing days the watermark never
    passed."""
    from dumpty_spark.sources import load_table
    from dumpty_spark.streaming.windows import (
        chained_window_rollup,
        read_events_stream,
        run_to_memory,
    )

    batch = {
        (r["day"], r["event_type"], r["n_day"], r["n_hours_present"])
        for r in chained_window_rollup(
            load_table(spark, sf_smoke, "events")
        ).collect()
    }
    run_to_memory(
        chained_window_rollup(read_events_stream(spark, sf_smoke)),
        "chained_rollup",
        output_mode="append",
    )
    streamed = {
        (r["day"], r["event_type"], r["n_day"], r["n_hours_present"])
        for r in spark.sql("SELECT * FROM chained_rollup").collect()
    }
    assert streamed <= batch
    emitted_days = {d for d, *_ in streamed}
    all_days = sorted({d for d, *_ in batch})
    # everything but the watermark-trailing tail must have emitted
    assert set(all_days[:-1]) <= emitted_days


def test_foreach_batch_cdc_upsert(spark, sf_smoke, tmp_path):
    """CDC streaming merge: a store seeded with half the events, then the
    full stream upserted through foreachBatch — every event lands exactly
    once, seeded rows updated in place, the rest inserted."""
    from pyspark.sql import functions as F

    from dumpty_spark.sinks.writers import upsert_keys, write_range_clustered
    from dumpty_spark.sources import load_table
    from dumpty_spark.streaming.windows import read_events_stream

    ev = load_table(spark, sf_smoke, "events").select(
        "event_id", "event_type", "value"
    )
    n_all = ev.count()
    store = str(tmp_path / "cdc_store")
    write_range_clustered(
        ev.filter(F.col("event_id") % 2 == 0).withColumn("value", F.lit(-1.0)),
        store,
        ["event_id"],
        num_files=4,
    )

    stream = read_events_stream(spark, sf_smoke).select(
        "event_id", "event_type", "value"
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda batch, _eid: upsert_keys(spark, store, "event_id", batch)
        )
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    back = spark.read.parquet(store)
    assert back.count() == n_all                      # exactly once per key
    assert back.filter(F.col("value") == -1.0).count() == 0  # seeds updated
    assert back.select("event_id").distinct().count() == n_all
