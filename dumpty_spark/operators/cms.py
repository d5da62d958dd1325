"""Count-min sketch store at rest (EXT E68): incremental per-key
frequency estimation without rescanning history.

Completes the mergeable-sketch family (E45 HLL distincts, E51 quantile
store, E58 KMV join sizes) with the remaining classic: "how often has
key X appeared so far?" re-asked per ingest batch. Exact per-key counts
need a keys-sized table that grows with cardinality and a shuffle per
refresh; the count-min sketch (Cormode & Muthukrishnan, J. Algorithms
2005 — public literature) is a fixed ``depth x width`` counter grid
that is LINEAR, hence mergeable by cell-wise addition: each batch
reduces to at most depth*width rows, batches live hive-partitioned at
rest, and any cross-batch estimate is a sum over sketch rows — bytes
per batch are constant regardless of row count or key cardinality.

Guarantees (all one-sided, the useful direction for over-sampling /
throttling decisions): est >= true always (counters only ever add), and
est <= true + eps*N with probability 1 - delta over the hash choice,
eps = e/width, delta = exp(-depth). Hashes here are fixed
(xxhash64 seeded by the row index), so for a given dataset the bound is
a deterministic, auditable boolean — the contract q_cms_freq_check
verifies against exact counts.

Spark shape: the depth dimension is a small ``explode`` (rows x depth),
folded immediately by a partial-aggregated groupBy(d, bucket) — the
map-side combine reduces every partition to <= depth*width cells before
the shuffle, so the exchange is sketch-sized, not data-sized. Estimates
join a keys-frame against the merged grid on (d, bucket): broadcast,
metadata-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEPTH = 4  # delta = e^-4 ~ 1.8% per-key failure probability
WIDTH = 2048  # eps = e/2048 ~ 0.13% of stream mass


def _bucket(key_col: str, d_col) -> F.Column:
    """Row of the counter grid for one (key, depth) pair: xxhash64 of
    the stringified key seeded by the depth index, folded to [0, WIDTH).
    Stringifying first makes the sketch stable across integer widths."""
    return F.pmod(F.xxhash64(F.col(key_col).cast("string"), d_col), F.lit(WIDTH))


def cms_batch(df: DataFrame, key_col: str, batch_id: str) -> DataFrame:
    """Reduce one ingest batch to its counter grid: rows
    (batch_id, d, bucket, cnt), at most DEPTH*WIDTH of them."""
    d = F.explode(F.array(*[F.lit(i) for i in range(DEPTH)])).alias("d")
    return (
        df.select(F.col(key_col).alias("__k"))
        .select("__k", d)
        .groupBy("d", _bucket("__k", F.col("d")).alias("bucket"))
        .agg(F.count("*").alias("cnt"))
        .select(F.lit(batch_id).alias("batch_id"), "d", "bucket", "cnt")
    )


def cms_store_append(
    df: DataFrame, store_dir: str, key_col: str, batch_id: str
) -> None:
    """Append one batch's grid, hive-partitioned by batch_id so
    re-running a batch overwrites only its own partition (idempotent
    re-ingest — the E14/E45 store contract)."""
    (
        cms_batch(df, key_col, batch_id)
        .coalesce(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(store_dir)
    )


def cms_store_estimate(
    spark: SparkSession,
    store_dir: str,
    keys: DataFrame,
    key_col: str,
    batches: list[str] | None = None,
) -> DataFrame:
    """Frequency estimate for each row of ``keys`` across the selected
    batches: merge the grids cell-wise (linearity), probe each key's
    DEPTH cells, take the min. Returns (key_col, est, n_total) where
    n_total is the exact merged stream mass (sum cnt / DEPTH) — the N
    in the eps*N error bound, carried so callers can audit it."""
    sk = spark.read.parquet(store_dir)
    if batches is not None:
        sk = sk.filter(F.col("batch_id").isin(batches))
    grid = sk.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))
    d = F.explode(F.array(*[F.lit(i) for i in range(DEPTH)])).alias("d")
    probes = keys.select(F.col(key_col)).distinct().select(key_col, d)
    probes = probes.select(
        key_col, "d", _bucket(key_col, F.col("d")).alias("bucket")
    )
    n_total = sk.agg((F.sum("cnt") / F.lit(DEPTH)).cast("long").alias("n"))
    return (
        probes.join(grid, ["d", "bucket"], "left")
        .groupBy(key_col)
        # a key whose cell was never touched has a NULL cnt -> est 0
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
        .crossJoin(F.broadcast(n_total))
        .select(key_col, "est", F.col("n").alias("n_total"))
    )
