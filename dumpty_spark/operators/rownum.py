"""Scalable global row numbering — the operation behind the reference's
"julienne" (src/dumpty/pipeline.py:236-267) done without its bottleneck.

``ROW_NUMBER() OVER (ORDER BY k)`` with no PARTITION BY collapses the
whole dataset into ONE task in Spark — the plan warns
``WindowExec: No Partition Defined`` and at 100 TB it never finishes.
The scalable equivalent built here:

1. equal-frequency boundaries of the leading order column via
   ``approxQuantile`` (distributed Greenwald-Khanna, one pass);
2. a slice id ``__pid`` computed as a PURE FUNCTION of the row's key
   (count of boundaries below it) — NOT ``spark_partition_id()`` after
   ``repartitionByRange``, whose sampled boundaries are nondeterministic
   and, worse, can differ between two evaluations of the same subtree
   in one DAG (rows vs counts), silently corrupting offsets;
3. per-slice ``row_number`` window — parallel, each task sorts only its
   slice; rows equal in the leading column share a slice, so ordering
   across slices is total;
4. per-slice counts (metadata: one row per slice) → cumulative offsets,
   broadcast-joined back.

NULL keys get ``__pid = 0`` — first slice, matching ASC NULLS FIRST and
the reference's NULL-routing rule (pipeline.py:390-391).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add 1-based ``out_col`` numbering rows by ``order_cols`` ascending
    (ASC NULLS FIRST). Deterministic iff ``order_cols`` is a unique key —
    the same contract as SQL ROW_NUMBER without a tiebreak. The leading
    order column must be numeric (it drives the equal-frequency slicing).
    """
    lead = order_cols[0]
    n_slices = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    probs = [i / n_slices for i in range(1, n_slices)]
    bounds = sorted(set(df.stat.approxQuantile(lead, probs, 0.001))) if probs else []

    if bounds:
        barr = F.array(*[F.lit(b) for b in bounds])
        pid = F.size(F.filter(barr, lambda b: F.col(lead) > b))
    else:
        pid = F.lit(0)
    w = Window.partitionBy("__pid").orderBy(*[F.col(c).asc() for c in order_cols])
    local = df.withColumn("__pid", pid).withColumn("__local", F.row_number().over(w))

    counts = local.groupBy("__pid").agg(F.count("*").alias("__n"))
    # global window over ONE ROW PER SLICE — metadata-sized by design
    woff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid", F.coalesce(F.sum("__n").over(woff), F.lit(0)).alias("__off")
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__off") + F.col("__local")).cast("long"))
        .drop("__pid", "__local", "__off")
    )
