"""Round-8 engine extensions, eighth batch (EXT E210): the approximate
neighborhood function (ANF / HyperBall) over the shared co-purchase
graph — reachability-curve estimation without |V| traversals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.queries import register

# ---------------------------------------------------------------------------
# E210: approximate neighborhood function N(t)
# ---------------------------------------------------------------------------
# The graph family so far measures STRUCTURE (PageRank, k-core, CC,
# triangles, BFS from a seed set); ANF measures REACH: N(t) = Σ_v
# |B(v, t)| for every radius t at once, the curve whose saturation
# point is the effective diameter. Exact N(t) is a BFS from EVERY
# node; the FM-sketch version (operators/graph.anf_estimates) is t
# rounds of one join + one bit_or groupBy over K=8 longs per node —
# the only operator shape that survives a 10^9-node graph. Portable
# md5 bit-setting makes the whole curve exact-arithmetic reproducible,
# so the oracle replays the identical sketch evolution (unrolled
# rounds) and the driver hash-checks VALUES, not an envelope; the
# sketch-vs-exact accuracy question is separately answered by the
# t=1 row, where the truth is exactly degree+1 (audited in tests).

_ANF_ROUNDS = 3
_ANF_K = 8


def _anf_oracle() -> str:
    mask_cols = ",\n         ".join(
        f"(('0x' || substr(md5('{j}:' || node::VARCHAR), 1, 15))::BIGINT)"
        f" & -(('0x' || substr(md5('{j}:' || node::VARCHAR), 1, 15))::BIGINT)"
        f" AS m{j}"
        for j in range(_ANF_K)
    )
    ors = ", ".join(f"bit_or(p.m{j}) AS m{j}" for j in range(_ANF_K))
    r_sum = " + ".join(f"bit_count(m{j} & ~(m{j} + 1))" for j in range(_ANF_K))
    est = (
        f"CAST(ROUND(10000.0 * POW(2.0, ({r_sum}) / {float(_ANF_K)}) "
        f"/ 0.77351, 0) AS BIGINT)"
    )
    ctes = [
        f"""WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),
nodes AS (SELECT DISTINCT u AS node FROM edges),
hop AS (SELECT u, v FROM edges UNION ALL SELECT node, node FROM nodes),
r0 AS (
  SELECT node,
         {mask_cols}
  FROM nodes
)"""
    ]
    for t in range(1, _ANF_ROUNDS + 1):
        ctes.append(
            f"""r{t} AS (
  SELECT h.u AS node, {ors}
  FROM hop h JOIN r{t-1} p ON p.node = h.v
  GROUP BY h.u
)"""
        )
    unions = "\nUNION ALL\n".join(
        f"SELECT {t} AS t, {est} AS est_micro FROM r{t}"
        for t in range(_ANF_ROUNDS + 1)
    )
    return (
        ",\n".join(ctes)
        + f""",
ests AS (
{unions}
)
SELECT t::INT AS t, COUNT(*)::BIGINT AS n_nodes,
       SUM(est_micro)::BIGINT AS nf_sum_micro,
       ROUND(SUM(est_micro) / (10000.0 * COUNT(*)), 4) AS avg_ball
FROM ests GROUP BY t ORDER BY t"""
    )


@register(
    "q_neighborhood_function",
    oracle=_anf_oracle(),
    doc="approximate neighborhood function / HyperBall (E210): per-node "
    "K=8 Flajolet-Martin masks over the shared co-purchase graph, t=0..3 "
    "rounds of one join + one map-side bit_or groupBy each — N(t) for "
    "every radius at once (the effective-diameter curve) without |V| "
    "BFS traversals; portable md5 bit-setting makes the curve "
    "hash-checkable end-to-end, per-node estimates integerized to 1e-4 "
    "units so the corpus sums are exact BIGINTs",
)
def q_neighborhood_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators.graph import anf_estimates
    from dumpty_spark.queries.shared_graph import copurchase_symmetric

    edges = copurchase_symmetric(spark, sf_dir)
    ests = anf_estimates(edges, rounds=_ANF_ROUNDS, k_masks=_ANF_K)
    return (
        ests.groupBy("t")
        .agg(
            F.count("*").alias("n_nodes"),
            F.sum("est_micro").alias("nf_sum_micro"),
            F.round(
                F.sum("est_micro") / (10000.0 * F.count("*")), 4
            ).alias("avg_ball"),
        )
        .select(F.col("t").cast("int").alias("t"), "n_nodes",
                "nf_sum_micro", "avg_ball")
        .orderBy("t")
    )
