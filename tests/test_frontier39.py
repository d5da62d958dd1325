"""Round-8 batch 14: IVF nprobe-recall curve."""

from dumpty_spark.queries import REGISTRY


def test_nprobe_curve_theorems(spark, sf_smoke):
    rows = REGISTRY["q_ann_nprobe_curve"].fn(spark, sf_smoke).collect()
    assert [r["nprobe"] for r in rows] == [1, 2, 4, 8, 16]
    assert all(r["recall_ge_prev"] for r in rows)
    # exhaustive probe must reproduce the brute-force result EXACTLY
    # (vacuously TRUE below nlist, load-bearing on the last row)
    assert all(r["exact_when_exhaustive_ok"] for r in rows)
    assert all(r["n_pairs"] >= 1 for r in rows)
