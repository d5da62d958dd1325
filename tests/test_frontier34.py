"""Round-8 batch 9: binaryFile source, Good-Turing, dedup threshold curve."""

from dumpty_spark.queries import REGISTRY


def test_binaryfile_roundtrip(spark, sf_smoke):
    rows = REGISTRY["q_binaryfile_ingest"].fn(spark, sf_smoke).collect()
    assert len(rows) >= 1
    for r in rows:
        assert r["roundtrip_ok"]
        assert r["n_files"] == 1
        # tab + newline + id digits accounted: strictly more bytes than chars
        assert r["total_bytes"] > r["n_docs"] * 2


def test_binaryfile_scratch_cleaned(spark, sf_smoke):
    import glob

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file://"
    ).removeprefix("file:")
    REGISTRY["q_binaryfile_ingest"].fn(spark, sf_smoke).collect()
    assert glob.glob(f"{warehouse}/_binaryfile_scratch_*") == []


def test_good_turing_invariants(spark, sf_smoke):
    rows = REGISTRY["q_good_turing"].fn(spark, sf_smoke).collect()
    assert len(rows) >= 1
    for r in rows:
        assert r["n_tokens"] >= r["vocab"] >= 1
        assert r["vocab"] >= r["n1"] + r["n2"] + r["n3"] + r["n4"]
        assert 0.0 <= r["unseen_mass"] <= 1.0
        for k in ("rstar_1", "rstar_2", "rstar_3"):
            assert r[k] is None or r[k] >= 0.0


def test_threshold_curve_monotone(spark, sf_smoke):
    rows = REGISTRY["q_dedup_threshold_curve"].fn(spark, sf_smoke).collect()
    assert [r["tau"] for r in rows] == [0.5, 0.7, 0.9]
    for lo, hi in zip(rows, rows[1:]):
        # tightening the threshold can only remove edges/clustered docs
        assert hi["n_edges"] <= lo["n_edges"]
        assert hi["n_docs_clustered"] <= lo["n_docs_clustered"]
        assert hi["max_cluster"] <= lo["max_cluster"]
        assert hi["n_dropped"] <= lo["n_dropped"]
    for r in rows:
        assert r["n_dropped"] == r["n_docs_clustered"] - r["n_clusters"]
