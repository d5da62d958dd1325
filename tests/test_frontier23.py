"""E185 hierarchy closure + BOM rollup contracts."""

from __future__ import annotations

from dumpty_spark.queries import REGISTRY


def test_ancestor_closure_small_tree(spark):
    """Hand-checkable 3-level tree: 0 <- 1,2 ; 1 <- 3,4 ; 3 <- 5."""
    from dumpty_spark.operators.hierarchy import ancestor_closure

    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1), (4, 1), (5, 3), (0, 0)],
        ["node", "parent"],
    )
    got = sorted(
        (r["node"], r["anc"]) for r in ancestor_closure(edges).collect()
    )
    assert got == sorted(
        [(1, 0), (2, 0), (3, 1), (3, 0), (4, 1), (4, 0),
         (5, 3), (5, 1), (5, 0)]
    )


def test_ancestor_closure_deep_chain_log_rounds(spark):
    """A 20-deep chain closes completely (depth <= the 32 default),
    proving the doubling reaches beyond any per-round linear walk."""
    from dumpty_spark.operators.hierarchy import ancestor_closure

    edges = spark.createDataFrame(
        [(i, i - 1) for i in range(1, 21)], ["node", "parent"]
    )
    n = ancestor_closure(edges).count()
    assert n == 20 * 21 // 2  # node i has i ancestors


def test_bom_rollup_root_totals(spark, sf_smoke):
    """The root assembly (0) must aggregate every OTHER part exactly
    once: n_parts_below == n_parts - 1."""
    from dumpty_spark.sources.parquet import load_table

    rows = REGISTRY["q_bom_rollup"].fn(spark, sf_smoke).collect()
    n_parts = load_table(spark, sf_smoke, "part").count()
    by = {r["assembly"]: r for r in rows}
    assert 0 in by  # the root dominates subtree value
    assert by[0]["n_parts_below"] == n_parts - 1
    vals = [r["subtree_value"] for r in rows]
    assert vals == sorted(vals, reverse=True)
