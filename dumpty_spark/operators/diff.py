"""Snapshot diff: keyed added / removed / changed between two table
versions.

Generalizes the reference's only correctness check — row-count
reconciliation (extract.py:36-38, main.py:270-274, SURVEY X7) — from
"same number of rows" to "exactly which keys differ and how", the audit
a CDC/mirroring pipeline actually needs.

Shape at scale: one full outer shuffle join on the key set; the value
comparison is a struct inequality evaluated inside the join's generated
code (no hashing pass, no second scan, NULL-safe via <=> on each field).
At 100 TB both sides shuffle once on the key — the minimum possible for
an exact diff — and with both snapshots bucketed on the key the exchange
disappears entirely (E12's layout applies unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """Return (keys..., status) for every key whose row was added,
    removed, or changed between ``old`` and ``new``; unchanged keys are
    dropped. Value columns are compared NULL-safely, column by column —
    two NULLs are equal, NULL vs value is a change."""
    vals = [c for c in old.columns if c not in keys]
    if set(old.columns) != set(new.columns):
        raise ValueError("snapshots must share a schema")
    o = old.select(*keys, F.struct(*vals).alias("__o"), F.lit(1).alias("__ol"))
    n = new.select(*keys, F.struct(*vals).alias("__n"), F.lit(1).alias("__nl"))
    joined = o.join(n, keys, "full_outer")
    same = F.lit(True)
    for v in vals:
        same = same & F.col(f"__o.{v}").eqNullSafe(F.col(f"__n.{v}"))
    status = (
        F.when(F.col("__ol").isNull(), F.lit("added"))
        .when(F.col("__nl").isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(*keys, "status")
    )
