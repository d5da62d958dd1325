"""Structured Streaming surface on the events table (SURVEY §2.7 DELEG).

The reference's incrementality is table-level only (TinyDB watermark,
main.py:88-100); the row-level streaming surface is a north-star
extension. Each transformation here is written against a plain DataFrame,
so the SAME function serves the batch oracle path (F.window on a parquet
scan) and the streaming path (readStream → writeStream) — the Spark
unified-batch-streaming idiom.

Scale notes: watermarks bound state (late events beyond the delay are
dropped); tumbling/sliding aggs keep one state row per (window, key);
session windows merge state per key. All state lives in the state store,
partitioned by the grouping key — the same shuffle-partitioning story as
batch aggs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a bounded stream (file source) — the local-test
    stand-in for a Kafka topic; one file = one micro-batch.

    The file source needs an explicit schema; take it from the parquet
    footer via a (lazy, metadata-only) batch read so the reader tracks
    whatever ts encoding the fixture generation used — TIMESTAMP(NANOS)
    read as long, or plain timestamp[us]. ts is then normalized to
    micro-precision TIMESTAMP_NTZ exactly like the batch loader.
    """
    from dumpty_spark.sources.parquet import _normalize_events_ts, table_path

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    # the file source requires a directory; glob-filter down to the one
    # table file inside the sf dir
    raw = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return _normalize_events_ts(raw)


def tumbling_agg(events: DataFrame, window: str = "1 hour", watermark: str | None = None) -> DataFrame:
    """Tumbling event-time windows: count + sum(value) per (window, type)."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("w_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_agg(
    events: DataFrame, window: str = "2 hours", slide: str = "1 hour"
) -> DataFrame:
    """Sliding windows — each event lands in window/slide windows."""
    return (
        events.groupBy(F.window("ts", window, slide), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("w_start"),
            "event_type",
            "n",
        )
    )


def session_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based session windows per user: start, size, span."""
    return (
        events.groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            "user_id",
            F.date_format("first_ts", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "total_value",
            (F.unix_timestamp("last_ts") - F.unix_timestamp("first_ts")).alias("span_sec"),
        )
    )


def watermark_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming dedup on event_id within the watermark horizon — state
    is bounded by the watermark, unlike an unbounded dropDuplicates.

    Watermarks require TimestampType (not NTZ); with the session pinned
    to UTC the cast is value-preserving."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete"):
    """Drive a bounded stream to completion into a memory sink (tests)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q


def enrich_stream(events: DataFrame, dim: DataFrame, on: list[str], how: str = "left") -> DataFrame:
    """Stream-static join: each micro-batch joins against the (batch) dim
    table — the standard streaming-enrichment shape. The static side is
    re-planned per batch, so Catalyst broadcasts a small dim exactly as
    it would in batch; no state is kept (stateless join)."""
    return events.join(dim, on, how)


def run_foreach_batch_parquet(stream_df: DataFrame, out_dir: str) -> list[int]:
    """foreachBatch sink: per-micro-batch custom write (parquet appended
    per epoch). foreachBatch is the escape hatch for sinks without a
    native streaming writer (JDBC, BQ load jobs — the reference's K3
    shape) and for multi-destination writes. Returns the epoch ids seen."""
    epochs: list[int] = []

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        epochs.append(epoch_id)
        batch_df.write.mode("append").parquet(out_dir)

    q = stream_df.writeStream.foreachBatch(write_batch).outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    return epochs


def run_available_now_parquet(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str
) -> int:
    """Batch-incremental run: Trigger.AvailableNow processes exactly the
    input not yet recorded in the checkpoint, then stops — the row-level
    version of the reference's full/incremental mode switch
    (src/dumpty/main.py:220-251, table-level there). Re-running with the
    same checkpoint is a no-op until new files arrive. Returns rows
    written this run."""
    q = (
        stream_df.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
    q.awaitTermination()
    total = 0
    for p in q.recentProgress:
        total += p["numInputRows"]
    return total


def interval_join(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    key: str = "user_id",
    gap: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: pair each ``left_type`` event with the
    same key's ``right_type`` events that occur within ``gap`` after it.

    Equi-join on the key + event-time range condition — Spark's
    stream-stream join shape. Both sides carry a watermark, which is what
    BOUNDS THE JOIN STATE: buffered rows older than (max event time −
    watermark − gap) are evicted, so state is O(key cardinality × rate ×
    horizon), not unbounded. In batch mode ``withWatermark`` is a no-op
    and the same plan is a shuffle equi-join with a residual time filter —
    the unified-API property the oracle checks.
    """
    # watermarks require TIMESTAMP (not NTZ); the session TZ is pinned UTC
    # so the cast is an identity relabeling of the event time
    a = (
        events.filter(F.col("event_type") == left_type)
        .select(
            F.col(key).alias("k"),
            F.col("ts").cast("timestamp").alias("a_ts"),
            F.col("event_id").alias("a_id"),
        )
        .withWatermark("a_ts", watermark)
    )
    b = (
        events.filter(F.col("event_type") == right_type)
        .select(
            F.col(key).alias("k2"),
            F.col("ts").cast("timestamp").alias("b_ts"),
            F.col("event_id").alias("b_id"),
        )
        .withWatermark("b_ts", watermark)
    )
    # how='leftOuter': unmatched left rows emit with NULL right side —
    # but only once the watermark passes a_ts + gap, because until then a
    # match could still arrive. End-of-stream caveat (tested): the
    # watermark never advances past max(event time) - delay, so trailing
    # unmatched rows stay buffered forever in a finite run; streaming
    # outer output is therefore inner ⊆ streamed ⊆ batch-outer.
    return a.join(
        b,
        F.expr(f"k = k2 AND b_ts >= a_ts AND b_ts <= a_ts + interval {gap}"),
        how,
    ).select(
        F.col("k").alias("user_id"), "a_id", "b_id", "a_ts", "b_ts"
    )


def chained_window_rollup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """CHAINED stateful windows in one query — hourly tumbling agg rolled
    up into daily windows by re-windowing the first agg's ``window``
    struct column (supported since Spark 3.4; with two stateful operators
    back-to-back this exercises Spark 4's multi-stateful-operator
    pipeline). State: one row per (hour, type) in op 1, one per (day,
    type) in op 2 — both watermark-bounded. In append mode a day emits
    only once the watermark passes its end, so a bounded run emits every
    day except the trailing one(s) — same end-of-stream caveat as the
    outer interval join (tested).
    """
    src = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", watermark
    )
    hourly = src.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count("*").alias("n_hour")
    )
    daily = hourly.groupBy(F.window(F.col("window"), "1 day"), "event_type").agg(
        F.sum("n_hour").alias("n_day"),
        F.count("*").alias("n_hours_present"),
    )
    return daily.select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd").alias("day"),
        "event_type",
        "n_day",
        "n_hours_present",
    )
