"""Sequence packing (EXT; LLM-pretraining surface): greedily pack
documents into bins of at most ``budget`` tokens — the step that turns a
deduped/filtered corpus into fixed-size training sequences with minimal
padding waste.

Greedy next-fit, made deterministic and distributed:

- **shard** = first hex char of ``md5(id)`` → 16 independent packing
  streams. Sharding first is what makes the op scale: each shard packs
  alone, so the sequential greedy loop parallelizes across executors
  while the result stays a pure function of (ids, weights) — independent
  of partitioning, task order, or cluster size.
- **within a shard** docs are processed in ``id`` order; a doc joins the
  current bin unless that would exceed ``budget``, else it opens the
  next bin (an over-budget single doc gets a bin of its own).
- the per-shard loop runs in an Arrow-batched ``applyInPandas`` — a
  shard's rows arrive as one pandas group; the Python loop is O(rows in
  shard), not O(corpus).

The same rule is expressible as an ANSI recursive CTE (one step per
in-shard row), so the whole operator is DuckDB-oracle-checked
(queries/sampling.py::q_pack_documents).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shard_of(id_col: str) -> Column:
    """First hex char of md5(id) — bit-identical in any engine."""
    return F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)


def pack_greedy(
    df: DataFrame,
    id_col: str,
    weight_col: Column | str,
    budget: int,
) -> DataFrame:
    """Returns (id, shard, bin_idx, weight): the greedy next-fit bin
    assignment per shard. ``weight_col`` may be any integer Column
    expression (token count, byte length...)."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    base = df.select(
        F.col(id_col).alias("id"),
        shard_of(id_col).alias("shard"),
        w.cast("long").alias("weight"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        bins, fill, cur = [], 0, 0
        first = True
        for wt in pdf["weight"]:
            if first:
                first, fill = False, wt
            elif fill + wt <= budget:
                fill += wt
            else:
                cur, fill = cur + 1, wt
            bins.append(cur)
        pdf["bin_idx"] = pd.Series(bins, dtype="int64")
        return pdf[["id", "shard", "bin_idx", "weight"]]

    id_type = base.schema["id"].dataType.simpleString()
    return base.groupBy("shard").applyInPandas(
        pack, schema=f"id {id_type}, shard string, bin_idx long, weight long"
    )
