"""Z-order (Morton) clustering — multi-column data skipping at rest.

``write_range_clustered`` (sinks/writers.py) solves the ONE-column case:
sort by ts, skip files on ts predicates. But a second filter column gets
no skipping at all — every file spans the full user_id range. Z-ordering
fixes that: bucket each cluster column into 2^bits equal-frequency ranks,
bit-interleave the ranks into one Morton code, and range-cluster the
write on that code. Each output file then covers a small hyper-rectangle
of the key space, so parquet min-max stats prune files for predicates on
ANY clustered column (the mechanism behind Delta/Iceberg OPTIMIZE
ZORDER).

Construction notes, all scale-driven:

- ranks come from ``approxQuantile`` boundaries (driver-side metadata,
  one pass) — equal-FREQUENCY, so skewed columns still spread over all
  2^bits buckets; the bucket index is computed per row as a fold over
  the boundary literal array (codegen'd, no UDF, no shuffle, no window).
- the interleave is a fixed chain of shift/and/or Column ops — pure
  map-side arithmetic.
- the final ``repartitionByRange(_z)`` is evaluated exactly once (a
  single write action), which is the safe use of its nondeterministic
  boundary sampling (see operators/rownum.py for the counter-case).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_numeric(df: DataFrame, col: str) -> Column:
    """Order-preserving numeric view of a column: timestamps/dates go
    through an epoch cast (TIMESTAMP_NTZ cannot cast to double
    directly), everything else casts to double."""
    dt = df.schema[col].dataType.simpleString()
    c = F.col(col)
    if dt.startswith("timestamp") or dt == "date":
        c = c.cast("timestamp")
    return c.cast("double")


def rank_bucket(x: Column, boundaries: list[float]) -> Column:
    """Equal-frequency bucket index in [0, len(boundaries)]: the number
    of boundaries <= x. Evaluated as a BINARY-SEARCH tree of WHENs over
    the sorted boundary list — log2(n) comparisons per row inside
    whole-stage codegen (the previous array-fold lambda ran ~n
    higher-order-function steps per row OUTSIDE codegen and dominated
    the whole z-order write: 74s -> ~8s for the E129 audit at sf0.1).
    NULLs land in bucket 0 (they sort first, like Spark's NULLS FIRST):
    a NULL comparison takes every otherwise-branch down to the lowest
    bucket, exactly as the fold counted 0."""

    def bs(lo: int, hi: int) -> Column:
        # invariant: the answer (count of boundaries <= x) is in [lo, hi]
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return F.when(
            x >= F.lit(float(boundaries[mid])), bs(mid + 1, hi)
        ).otherwise(bs(lo, mid))

    return bs(0, len(boundaries))


def morton_interleave(buckets: list[Column], bits: int) -> Column:
    """Interleave ``bits`` bits from each bucket column into one long:
    bit i of column d lands at position i*len(buckets)+d."""
    n = len(buckets)
    z = F.lit(0).cast("long")
    for d, b in enumerate(buckets):
        bl = b.cast("long")
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftrightunsigned(bl, i).bitwiseAND(F.lit(1)),
                    i * n + d,
                )
            )
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int = 8,
    bits: int = 8,
    relative_error: float = 0.01,
) -> str:
    """Write ``df`` as parquet range-clustered on the Morton code of
    ``cluster_cols``. Files cover near-disjoint hyper-rectangles, so a
    predicate on any clustered column skips most files on footer stats
    (asserted in tests/test_sinks_state.py)."""
    nb = (1 << bits) - 1
    probs = [i / (nb + 1) for i in range(1, nb + 1)]
    # materialize the input ONCE: three separate consumers otherwise
    # re-run the upstream scan — the quantile job, repartitionByRange's
    # boundary sampling, and the exchange itself (measured 8.5s -> 4s on
    # the E129 audit). One extra materialization beats three scans; on a
    # cluster this is scratch-disk-priced, the same trade Delta's
    # OPTIMIZE ZORDER makes.
    df = df.localCheckpoint()
    # ONE quantile job for all cluster columns (approxQuantile takes a
    # column list) — per-column jobs would re-scan the upstream plan
    # len(cluster_cols) times before the write even starts
    numerics = [as_numeric(df, c) for c in cluster_cols]
    views = df.select(
        *[n.alias(f"_x{i}") for i, n in enumerate(numerics)]
    )
    all_bounds = views.stat.approxQuantile(
        [f"_x{i}" for i in range(len(cluster_cols))], probs, relative_error
    )
    buckets = [
        rank_bucket(num, bounds) for num, bounds in zip(numerics, all_bounds)
    ]
    z = morton_interleave(buckets, bits)
    out = (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    out.write.mode("overwrite").parquet(path)
    return f"{path}/part-*"
