"""Round-7 engine extensions, eleventh batch (EXT E185): hierarchical
subtree rollup (BOM/taxonomy) via log-depth pointer-doubling closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E185: BOM-style subtree rollup
# ---------------------------------------------------------------------------
# The part keys form a deterministic 4-ary assembly tree (parent =
# key / 4, root 0 — dense keys make every ancestor a real part), and the
# question is the classic CONNECT BY workload neither engine has native:
# total retail price and part count under every assembly. The ancestor
# closure comes from pointer doubling (operators/hierarchy.py): paths of
# length <= 2^k after k self-joins, so a depth-9 tree at x10 closes in
# the same 5 rounds as depth 32 — never one shuffle per level. The
# rollup is then ONE groupBy over the closure. The oracle walks the
# identical parent chain with a genuine DuckDB recursive CTE, so the
# hash match proves the log-round closure equals the depth-recursive
# definition exactly. Top-15 assemblies by subtree value.

_BOM_ORACLE = """
WITH RECURSIVE anc AS (
  SELECT p_partkey AS node, p_partkey // 4 AS anc
  FROM part WHERE p_partkey // 4 <> p_partkey
  UNION ALL
  SELECT a.node, a.anc // 4 FROM anc a WHERE a.anc // 4 <> a.anc
),
sub AS (
  SELECT a.anc AS assembly,
         COUNT(*)::BIGINT AS n_parts_below,
         SUM(p.p_retailprice) AS below
  FROM anc a JOIN part p ON p.p_partkey = a.node
  GROUP BY a.anc
)
SELECT s.assembly, s.n_parts_below,
       ROUND(s.below + own.p_retailprice, 2) AS subtree_value
FROM sub s JOIN part own ON own.p_partkey = s.assembly
ORDER BY ROUND(s.below + own.p_retailprice, 2) DESC, s.assembly
LIMIT 15
"""


@register(
    "q_bom_rollup",
    oracle=_BOM_ORACLE,
    doc="hierarchical subtree rollup (E185): total part count and "
    "retail value under every assembly of the deterministic 4-ary key "
    "tree — ancestor closure via pointer doubling (log-depth self-"
    "joins, 5 rounds for any depth <= 32, never one shuffle per "
    "level), then ONE groupBy over the closure; oracle is a genuine "
    "recursive CTE, so the hash match proves the log-round closure "
    "equals the depth-recursive definition; the CONNECT BY / BOM "
    "workload neither engine has native",
)
def q_bom_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators.hierarchy import ancestor_closure

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice"
    )
    edges = part.select(
        F.col("p_partkey").alias("node"),
        (F.col("p_partkey") / 4).cast("long").alias("parent"),
    )
    closure = ancestor_closure(edges)
    sub = (
        closure.join(
            part.select(
                F.col("p_partkey").alias("node"),
                F.col("p_retailprice").alias("price"),
            ),
            "node",
        )
        .groupBy(F.col("anc").alias("assembly"))
        .agg(
            F.count("*").alias("n_parts_below"),
            F.sum("price").alias("below"),
        )
    )
    own = part.select(
        F.col("p_partkey").alias("assembly"),
        F.col("p_retailprice").alias("own_price"),
    )
    val = F.round(F.col("below") + F.col("own_price"), 2)
    return (
        sub.join(own, "assembly")
        .select("assembly", "n_parts_below", val.alias("subtree_value"))
        .orderBy(F.desc("subtree_value"), "assembly")
        .limit(15)
    )
