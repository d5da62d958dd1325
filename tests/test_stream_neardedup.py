"""Streaming ingestion of the incremental NEAR-dup MinHash store
(VERDICT r9, next-round #6): the batch store body (E14',
operators/dedup.py incremental_near_dedup) is `foreachBatch`-shaped by
design; this proves it — the documents fixture is replayed as a
3-micro-batch file stream (Trigger.AvailableNow, maxFilesPerTrigger=1,
mtime-ordered files) whose foreachBatch body IS the batch function, and
the stream-ingested store state must be IDENTICAL to the store built by
three direct batch calls in the same order: same survivor id set, same
sigs rows, same bands rows, and identical suppression verdicts for a
subsequent probe batch. Same contract as the chained-window streaming
equivalence tests (streaming/windows.py).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from dumpty_spark.operators.dedup import incremental_near_dedup
from dumpty_spark.sources import load_table


def _stage_batches(spark, sf_smoke, stage_dir: str) -> list:
    """Split documents into 3 deterministic batches, one parquet FILE
    each, mtime-ordered so the streaming file source (oldest-first)
    replays them in batch order."""
    docs = load_table(spark, sf_smoke, "documents")
    batches = []
    for i in range(3):
        b = docs.filter(F.col("doc_id") % 3 == i).localCheckpoint()
        d = os.path.join(stage_dir, f"_b{i}")
        b.coalesce(1).write.mode("overwrite").parquet(d)
        part = [
            p for p in os.listdir(d) if p.startswith("part-") and p.endswith(".parquet")
        ][0]
        dst = os.path.join(stage_dir, f"b{i}.parquet")
        os.replace(os.path.join(d, part), dst)
        # widen mtime gaps beyond fs granularity so source ordering is
        # deterministic
        t = time.time() - 300 + i * 60
        os.utime(dst, (t, t))
        batches.append(b)
    return batches


def _store_state(spark, store: str):
    sigs = {
        (r["id"], tuple(r["sig"]))
        for r in spark.read.parquet(os.path.join(store, "sigs")).collect()
    }
    bands = {
        (r["band_idx"], r["band_hash"], r["id"])
        for r in spark.read.parquet(os.path.join(store, "bands")).collect()
    }
    return sigs, bands


def test_stream_ingested_near_dup_store_equals_batch(spark, sf_smoke, tmp_path):
    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    batches = _stage_batches(spark, sf_smoke, stage)

    # --- batch path: three direct calls in order
    batch_store = str(tmp_path / "batch_store")
    batch_survivors: set = set()
    for b in batches:
        surv = incremental_near_dedup(spark, b, batch_store)
        batch_survivors |= {r["doc_id"] for r in surv.select("doc_id").collect()}

    # --- streaming path: the SAME body as a foreachBatch sink
    stream_store = str(tmp_path / "stream_store")
    stream_survivors: set = set()
    schema = spark.read.parquet(os.path.join(stage, "b0.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "b*.parquet")
        .option("maxFilesPerTrigger", 1)
        .load(stage)
    )

    def fold(df, epoch_id):
        surv = incremental_near_dedup(df.sparkSession, df, stream_store)
        stream_survivors.update(
            r["doc_id"] for r in surv.select("doc_id").collect()
        )

    q = (
        stream.writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(300)
    # one micro-batch per staged file, in mtime order
    assert q.lastProgress is not None

    # --- equivalence: survivors, sigs, and bands are identical
    assert stream_survivors == batch_survivors
    b_sigs, b_bands = _store_state(spark, batch_store)
    s_sigs, s_bands = _store_state(spark, stream_store)
    assert s_sigs == b_sigs
    assert s_bands == b_bands
    # the store did suppress something (the fixture has near-dups), and
    # kept something
    n_docs = load_table(spark, sf_smoke, "documents").count()
    assert 0 < len(batch_survivors) <= n_docs

    # --- behavioral equivalence for the NEXT batch: a probe of re-seen
    # texts under fresh ids must be suppressed identically by both stores
    probe = (
        load_table(spark, sf_smoke, "documents")
        .filter(F.col("doc_id") < 200)
        .withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
        .localCheckpoint()
    )
    surv_b = {
        r["doc_id"]
        for r in incremental_near_dedup(spark, probe, batch_store)
        .select("doc_id")
        .collect()
    }
    surv_s = {
        r["doc_id"]
        for r in incremental_near_dedup(spark, probe, stream_store)
        .select("doc_id")
        .collect()
    }
    assert surv_b == surv_s
