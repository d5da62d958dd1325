"""Round-8 batch 15: watermark profile, balanced resample, layout depth."""

from dumpty_spark.queries import REGISTRY


def test_watermark_drop_curve_monotone(spark, sf_smoke):
    rows = REGISTRY["q_watermark_profile"].fn(spark, sf_smoke).collect()
    assert [r["delay_s"] for r in rows] == [60, 300, 600, 1800]
    n0 = rows[0]["n_events"]
    assert all(r["n_events"] == n0 for r in rows)
    drops = [r["n_dropped"] for r in rows]
    # a longer grace period can only drop fewer events
    assert drops == sorted(drops, reverse=True)
    for r in rows:
        assert 0.0 <= r["pct_dropped"] <= 1.0
        assert r["n_dropped"] <= r["n_events"]


def test_balanced_resample_flattens_distribution(spark, sf_smoke):
    rows = REGISTRY["q_balanced_resample"].fn(spark, sf_smoke).collect()
    assert len(rows) >= 2
    for r in rows:
        assert 0 <= r["n_accepted"] <= r["n"]
    raw = [r["share"] for r in rows]
    ach = [r["achieved_share"] for r in rows]
    # the resample moves the mix toward uniform: spread shrinks
    assert max(ach) - min(ach) <= max(raw) - min(raw) + 1e-9
    # every bucket lands near the smallest bucket's mass (binomial noise)
    min_n = min(r["n"] for r in rows)
    for r in rows:
        assert r["n_accepted"] <= r["n"]
        if r["n"] == min_n:
            assert r["n_accepted"] == r["n"]  # rate 1 bucket keeps all


def test_layout_depth_flags(spark, sf_smoke):
    row = REGISTRY["q_layout_depth_audit"].fn(spark, sf_smoke).first()
    assert row["clustered_disjoint_ok"]
    assert row["hash_overlaps_more"]
    assert row["clustered_files"] == row["hash_files"] == 8
