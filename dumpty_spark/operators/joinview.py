"""Incremental JOIN-view maintenance (EXT E149).

E113's aggregate-view store keeps single-table rollups current; the next
warehouse primitive is a materialized JOIN view maintained by delta
joins — fact batches and dimension updates arrive independently and the
view must never re-read history it already processed:

- fact delta ΔF:        contributes  ΔF ⋈ D_current          (new rows
  joined against the dimension AS OF this batch),
- dimension delta ΔD:   contributes  F_history ⋈ (ΔD_new - ΔD_old)
  (the classic A⋈ΔB term: every PAST fact of a re-mapped dimension key
  moves its measure from the old group to the new one — emitted as a
  negative partial for the old group and a positive one for the new).

State at rest is the same hive-partitioned mergeable-partial layout as
the E113/E45 store family (one partition per batch_id, dynamic
partition overwrite -> idempotent re-ingest): per-group (rev, cnt)
partials that are closed under addition, including the NEGATIVE
correction partials — so batch order, re-splits, and re-reads cannot
change the merged view. Reading the view sums batches×groups partial
rows (KBs), never raw facts.

At 100 TB the ΔD term is the expensive one BY CONTRACT (it must touch
every past fact of the moved keys); the implementation keeps it a
semi-join-pruned scan of the fact history (broadcast the moved-key set)
rather than a re-join of everything — the delta join only produces rows
for moved keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def fact_delta_partials(
    fact_delta: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    group_col: str,
    measure_col: str,
) -> DataFrame:
    """ΔF ⋈ D_current reduced to per-group mergeable (rev, cnt) partials."""
    return (
        fact_delta.join(
            F.broadcast(dim.select(dim_key, group_col)),
            fact_delta[fact_key] == F.col(dim_key),
        )
        .groupBy(F.col(group_col).alias("grp"))
        .agg(
            F.sum(measure_col).alias("rev"),
            F.count("*").alias("cnt"),
        )
    )


def dim_move_partials(
    fact_history: DataFrame,
    moves: DataFrame,
    fact_key: str,
    dim_key: str,
    old_group: str,
    new_group: str,
    measure_col: str,
) -> DataFrame:
    """F_history ⋈ ΔD for re-mapped dimension keys: per OLD group a
    negative (rev, cnt) partial, per NEW group the matching positive —
    net zero rows moved, measures re-homed. ``moves`` is the
    (dim_key, old_group, new_group) delta frame (assumed dimension-
    delta-sized -> broadcast); the fact history scan is pruned to moved
    keys by the join itself."""
    hits = fact_history.join(
        F.broadcast(moves.filter(F.col(old_group) != F.col(new_group))),
        fact_history[fact_key] == F.col(dim_key),
    )
    per_key = hits.groupBy(old_group, new_group).agg(
        F.sum(measure_col).alias("m"), F.count("*").alias("c")
    )
    neg = per_key.select(
        F.col(old_group).alias("grp"),
        (-F.col("m")).alias("rev"),
        (-F.col("c")).alias("cnt"),
    )
    pos = per_key.select(
        F.col(new_group).alias("grp"),
        F.col("m").alias("rev"),
        F.col("c").alias("cnt"),
    )
    return neg.unionAll(pos).groupBy("grp").agg(
        F.sum("rev").alias("rev"), F.sum("cnt").alias("cnt")
    )


def view_append(partials: DataFrame, store_dir: str, batch_id: str) -> None:
    """Write one batch's partials idempotently (dynamic partition
    overwrite on batch_id — the E113 store contract)."""
    (
        partials.withColumn("batch_id", F.lit(batch_id))
        .coalesce(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(store_dir)
    )


def view_read(spark: SparkSession, store_dir: str) -> DataFrame:
    """Merge all batch partials into the current view (KB-sized read).
    Groups whose partials net to zero rows are tombstones left behind by
    dimension moves (every fact moved away) — they are not part of the
    view, exactly as a from-scratch join would never produce them."""
    return (
        spark.read.parquet(store_dir)
        .groupBy("grp")
        .agg(F.sum("rev").alias("rev"), F.sum("cnt").alias("cnt"))
        .filter(F.col("cnt") != 0)
    )
