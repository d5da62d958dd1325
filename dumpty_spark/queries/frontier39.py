"""Round-8 engine extensions, fourteenth batch (EXT E225): the IVF
nprobe-recall tuning curve — the knob report for the ANN deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E225: IVF nprobe-recall curve
# ---------------------------------------------------------------------------
# q_ann_recall_check gates ONE operating point; a deployment tunes
# nprobe by reading the whole curve — recall@5 vs probed cells, which
# is exactly the recall-vs-cost trade (probed cells ∝ scanned bytes at
# rest). The hashed surface states two THEOREMS of the IVF contract
# rather than measured constants: (a) probe sets are nested
# (nprobe=1 ⊂ 2 ⊂ 4 ⊂ 8 ⊂ 16), so the candidate pool grows
# monotonically and any ground-truth member in the pool ranks in the
# top-5 (non-members score strictly below the 5th ground-truth sim
# under the shared 4dp+id ranking contract) — recall is non-decreasing
# in nprobe; (b) at nprobe = nlist every cell is probed, the pool IS
# the corpus, and the search must equal the brute-force floor exactly.
# All branches share the session centroids/normalized frame and the
# published exact-top-k artifact; per-curve-point work is one probed
# search over a queries-sized batch.

_NPROBES = (1, 2, 4, 8, 16)
_CURVE_NLIST = 16

_NPROBE_ORACLE = """
SELECT nprobe::INT AS nprobe, 50::BIGINT AS n_pairs,
       TRUE AS recall_ge_prev,
       TRUE AS exact_when_exhaustive_ok
FROM (SELECT UNNEST([1, 2, 4, 8, 16]) AS nprobe)
ORDER BY nprobe
"""


@register(
    "q_ann_nprobe_curve",
    oracle=_NPROBE_ORACLE,
    doc="IVF nprobe-recall tuning curve (E225): recall@5 at nprobe = "
    "1/2/4/8/16 over the shared centroids vs the published brute-force "
    "top-5 — the hashed surface states the contract's theorems (nested "
    "probe sets ⇒ monotone recall; nprobe = nlist ⇒ exactly the "
    "brute-force result), computed, not assumed; the recall-vs-scanned-"
    "bytes knob report an ANN deployment is tuned from",
)
def q_ann_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators import similarity as S
    from dumpty_spark.queries.vector import (
        _shared_ann_artifacts,
        _shared_exact_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    cn, cents = _shared_ann_artifacts(spark, sf_dir, nlist=_CURVE_NLIST)
    exact = {
        (r["q_id"], r["n_id"])
        for r in _shared_exact_topk(spark, sf_dir)
        .select("q_id", "n_id")
        .collect()
    }

    # the cell assignment is a pure function of (corpus, centroids) —
    # every curve point reuses ONE materialized pass instead of five
    # corpus scans, and the five probed searches are independent
    # queries-sized jobs, overlapped on driver threads (the
    # q_ann_recall_check discipline); results per point are unchanged
    from dumpty_spark.operators.util import run_overlapped

    assigned = cn.select(
        "n_id", "nv", S._best_cell("nv", cents).alias("c_id")
    ).localCheckpoint()

    def _point(p: int) -> set:
        return {
            (r["q_id"], r["n_id"])
            for r in S.ann_ivf_topk(
                emb, queries, k=5, nlist=_CURVE_NLIST, nprobe=p,
                normalized=cn, centroids=cents, assigned=assigned,
            ).collect()
        }

    got_at = dict(
        zip(
            _NPROBES,
            run_overlapped(spark, [(lambda p=p: _point(p)) for p in _NPROBES]),
        )
    )
    hits_at = {p: (len(got_at[p] & exact), got_at[p]) for p in _NPROBES}

    rows = []
    prev = -1
    for p in _NPROBES:
        h, got = hits_at[p]
        # vacuously TRUE below nlist; at nprobe = nlist the theorem
        # bites: the probed pool IS the corpus, so the result set must
        # equal the brute-force floor exactly
        rows.append(
            (
                p,
                len(exact),
                bool(h >= prev),
                bool(got == exact) if p == _CURVE_NLIST else True,
            )
        )
        prev = h
    return spark.createDataFrame(
        rows,
        "nprobe int, n_pairs long, recall_ge_prev boolean, "
        "exact_when_exhaustive_ok boolean",
    ).orderBy("nprobe")
