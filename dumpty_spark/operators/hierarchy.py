"""Hierarchy ancestor closure via pointer doubling (EXT E185).

Org charts, bill-of-materials trees and category taxonomies all need
subtree rollups — "total cost under every assembly". The naive plan
walks the tree one level per round (depth joins: 20-deep BOM = 20
shuffles). Pointer doubling composes the closure with itself each round
(paths of length <= 2^k after k rounds), so ANY depth <= 2^k closes in
k joins — the same log-round trick the connected-components min-label
path uses (operators/components.py), applied to rooted trees where the
result is the exact ancestor SET, not just a representative.

Output pair count is sum-of-depths (n x avg-depth) — the closure IS the
answer a rollup needs, materialized once and reused by any number of
subtree aggregates. Each round is one self-join on the ancestor key +
distinct, lineage-truncated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ancestor_closure(
    parent_edges: DataFrame,
    node_col: str = "node",
    parent_col: str = "parent",
    max_depth: int = 32,
) -> DataFrame:
    """All proper (node, anc) ancestor pairs of a forest given its
    parent edges (roots excluded or self-looped upstream — self pairs
    are never emitted). ceil(log2(max_depth)) doubling rounds.

    Raises ``ValueError`` if the true depth exceeds ``max_depth``: a
    silently truncated closure would make every downstream rollup
    quietly wrong, so when the final round still grew, one extra
    doubling probe verifies the fixpoint was actually reached.
    """
    rounds = max(1, (max_depth - 1).bit_length())
    closure = parent_edges.select(
        F.col(node_col).alias("node"), F.col(parent_col).alias("anc")
    ).filter(F.col("node") != F.col("anc")).localCheckpoint()

    def _double(base: DataFrame) -> DataFrame:
        hop = base.select(
            F.col("node").alias("anc"), F.col("anc").alias("anc2")
        )
        longer = base.join(hop, "anc").select(
            "node", F.col("anc2").alias("anc")
        )
        return base.unionAll(longer).distinct()

    converged = False
    n_prev = closure.count()
    for _ in range(rounds):
        grown = _double(closure).localCheckpoint()
        # fixpoint: stop early once no new pairs appear. The previous
        # round's size is carried over instead of recounted (r11
        # optimization, guide §2.4 — one count job per round, not two)
        n_grown = grown.count()
        done = n_grown == n_prev
        closure, n_prev = grown, n_grown
        if done:
            converged = True
            break
    if not converged and _double(closure).count() != n_prev:
        raise ValueError(
            f"ancestor_closure: hierarchy depth exceeds max_depth="
            f"{max_depth}; raise max_depth (cost is log2: one extra "
            "join round doubles the reachable depth)"
        )
    return closure
