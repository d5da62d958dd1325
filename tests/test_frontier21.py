"""Round-7 batch (E181-E182) value contracts at smoke scale."""

from __future__ import annotations

from dumpty_spark.queries import REGISTRY


def test_text_tiling_depth_accounting(spark, sf_smoke):
    rows = REGISTRY["q_text_tiling"].fn(spark, sf_smoke).collect()
    assert rows, "no docs long enough at smoke scale"
    for r in rows:
        assert r["n_gaps"] >= 2  # >= 3 blocks
        assert 0 <= r["n_boundaries"] <= r["n_gaps"]
        assert 0 <= r["max_depth_u6"] <= r["depth_sum_u6"]
        # depth in micro-units is bounded by 2 (two full cosine drops)
        assert r["max_depth_u6"] <= 2_000_000


def test_embedding_drift_identities(spark, sf_smoke):
    row = REGISTRY["q_embedding_drift"].fn(spark, sf_smoke).first()
    assert row["centroid_shift"] >= 0
    assert -1.0 <= row["centroid_cosine"] <= 1.0
    assert row["trace_ratio"] > 0
    assert 0 < row["min_dim_var_ratio"] <= row["max_dim_var_ratio"]
