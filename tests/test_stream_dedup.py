"""Streaming ingestion of the incremental EXACT-dedup fingerprint store
(VERDICT r10, next-round #4): the near-dup store got its foreachBatch
proof in r10 (tests/test_stream_neardedup.py); this is the same
contract for its exact sibling (E14, operators/dedup.py
incremental_dedup) — the documents fixture replayed as a 3-micro-batch
file stream (Trigger.AvailableNow, maxFilesPerTrigger=1, mtime-ordered)
whose foreachBatch body IS the batch function, and the stream-ingested
fingerprint store must be IDENTICAL to three direct batch calls in the
same order: same survivor id set, same fingerprint rows (including
partition prefixes), and identical suppression verdicts for a probe of
re-seen texts under fresh ids."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from dumpty_spark.operators.dedup import incremental_dedup
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
            p for p in os.listdir(d)
            if p.startswith("part-") and p.endswith(".parquet")
        ][0]
        dst = os.path.join(stage_dir, f"b{i}.parquet")
        os.replace(os.path.join(d, part), dst)
        t = time.time() - 300 + i * 60
        os.utime(dst, (t, t))
        batches.append(b)
    return batches


def _fingerprints(spark, store: str) -> set:
    return {
        (r["_fp"], r["_pfx"])
        for r in spark.read.parquet(
            os.path.join(store, "fingerprints")
        ).collect()
    }


def test_stream_ingested_exact_dedup_store_equals_batch(
    spark, sf_smoke, tmp_path
):
    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    batches = _stage_batches(spark, sf_smoke, stage)

    # --- batch path: three direct calls in order
    batch_store = str(tmp_path / "batch_store")
    batch_survivors: set = set()
    for b in batches:
        surv = incremental_dedup(spark, b, batch_store)
        batch_survivors |= {
            r["doc_id"] for r in surv.select("doc_id").collect()
        }

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
        surv = incremental_dedup(df.sparkSession, df, stream_store)
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
    assert q.lastProgress is not None

    # --- equivalence: survivors and at-rest fingerprint rows identical
    assert stream_survivors == batch_survivors
    assert _fingerprints(spark, stream_store) == _fingerprints(
        spark, batch_store
    )
    n_docs = load_table(spark, sf_smoke, "documents").count()
    # at sf0.001 every normalized text is unique, so all docs survive;
    # cross-batch suppression is proven by the probe below
    assert 0 < len(batch_survivors) <= n_docs

    # --- behavioral equivalence for the NEXT batch: re-seen texts
    # under fresh ids must be suppressed identically by both stores
    probe = (
        load_table(spark, sf_smoke, "documents")
        .filter(F.col("doc_id") < 200)
        .withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
        .localCheckpoint()
    )
    surv_b = {
        r["doc_id"]
        for r in incremental_dedup(spark, probe, batch_store)
        .select("doc_id")
        .collect()
    }
    surv_s = {
        r["doc_id"]
        for r in incremental_dedup(spark, probe, stream_store)
        .select("doc_id")
        .collect()
    }
    assert surv_b == surv_s
    # every probe text was already fingerprinted -> full suppression
    assert surv_b == set()
