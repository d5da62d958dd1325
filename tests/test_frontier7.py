"""Unit tests for the round-6 second batch (E132-E136) on crafted
fixtures with hand-computed answers."""

from __future__ import annotations

import math
import tempfile

from pyspark.sql import functions as F

from dumpty_spark.queries import REGISTRY


def test_clustering_coefficient_hand_graph(spark):
    """Orders {1,2,3} and {3,4} build edges 1-2,1-3,2-3,3-4. Degrees
    1:2, 2:2, 3:3, 4:1. The only triangle is (1,2,3), so lcc(1)=lcc(2)=1
    (bin 3), lcc(3)=2/(3*2)=0.3333 (bin 1), node 4 excluded (d<2)."""
    with tempfile.TemporaryDirectory() as tmp:
        rows = [(1, 1), (1, 2), (1, 3), (2, 3), (2, 4)]
        spark.createDataFrame(
            rows, "l_orderkey long, l_partkey long"
        ).write.parquet(f"{tmp}/lineitem.parquet")
        out = {
            r["bin"]: r
            for r in REGISTRY["q_clustering_coefficient"].fn(spark, tmp).collect()
        }
        assert set(out) == {1, 3}
        assert out[3]["n_nodes"] == 2 and out[3]["avg_lcc"] == 1.0
        assert out[1]["n_nodes"] == 1 and out[1]["avg_lcc"] == 0.3333
        assert out[1]["avg_degree"] == 3.0


def test_ips_hand_case(spark):
    """u1 logs [A,A,B] (modal A), u2 logs [B] (modal B); p(A)=p(B)=0.5.
    Weights: 2,2,0,2 on rewards 1,2,4,3 -> IPS 12/4=3, SNIPS 12/6=2,
    ESS 36/12=3, match rate 3/4."""
    with tempfile.TemporaryDirectory() as tmp:
        rows = [
            (1, "A", 1.0),
            (1, "A", 2.0),
            (1, "B", 4.0),
            (2, "B", 3.0),
        ]
        spark.createDataFrame(
            rows, "user_id long, event_type string, value double"
        ).write.parquet(f"{tmp}/events.parquet")
        r = REGISTRY["q_ips_offpolicy"].fn(spark, tmp).first()
        assert r["n_events"] == 4
        assert r["match_rate"] == 0.75
        assert r["ips_value"] == 3.0
        assert r["snips_value"] == 2.0
        assert r["ess"] == 3.0


def test_mde_closed_form(spark):
    """User means [15, 30, 45]: sigma_pop = sqrt(150), m = floor(3/2)=1,
    MDE = 2.801585 * sigma * sqrt(2)."""
    with tempfile.TemporaryDirectory() as tmp:
        rows = [
            (1, "X", 10.0),
            (1, "X", 20.0),
            (2, "X", 30.0),
            (3, "X", 45.0),
        ]
        spark.createDataFrame(
            rows, "user_id long, event_type string, value double"
        ).write.parquet(f"{tmp}/events.parquet")
        r = REGISTRY["q_mde_power"].fn(spark, tmp).first()
        sd = math.sqrt(150.0)
        want = round(2.801585 * sd * math.sqrt(2.0), 4)
        assert r["n_users"] == 3
        assert r["sigma"] == round(sd, 4)
        assert r["mde_abs"] == want
        assert r["mde_rel"] == round(want / 30.0, 4)


def test_quantile_normalize_aligns_sources(spark):
    """s1 has lengths [1,2], s2 has [10,20]; global sorted [1,2,10,20].
    Rank mapping sends both sources to {2, 20}, so the normalized means
    coincide at 11 while the raw means differ 10x."""
    with tempfile.TemporaryDirectory() as tmp:
        rows = [
            (1, "s1", 1),
            (2, "s1", 2),
            (3, "s2", 10),
            (4, "s2", 20),
        ]
        spark.createDataFrame(
            rows, "doc_id long, source string, n_chars long"
        ).write.parquet(f"{tmp}/documents.parquet")
        out = {
            r["source"]: r
            for r in REGISTRY["q_quantile_normalize"].fn(spark, tmp).collect()
        }
        assert out["s1"]["mean_before"] == 1.5
        assert out["s2"]["mean_before"] == 15.0
        assert out["s1"]["mean_after"] == out["s2"]["mean_after"] == 11.0


def test_did_identity_on_smoke(spark, sf_smoke):
    """DiD lift must equal the recomputed four-cell arithmetic on the
    same assignment/pivot, independently derived here from raw events."""
    from dumpty_spark.operators.sampling import bucket_fraction
    from dumpty_spark.queries.frontier5 import _CUPED_PIVOT_DAY
    from dumpty_spark.sources.parquet import load_table

    ev = load_table(spark, sf_smoke, "events")
    day = F.floor(F.unix_timestamp("ts") / F.lit(86400)).cast("long")
    cells = {
        (r["treated"], r["post"]): r["m"]
        for r in ev.select(
            (bucket_fraction(["user_id"]) < 0.5).alias("treated"),
            (day >= _CUPED_PIVOT_DAY).alias("post"),
            "value",
        )
        .filter(F.col("event_type").isNull() | F.lit(True))
        .groupBy("treated", "post")
        .agg(F.avg("value").alias("m"))
        .collect()
    }
    # recompute overall DiD (all types pooled) and compare to the
    # per-type query aggregated the same way on one chosen type
    one = (
        REGISTRY["q_did_lift"].fn(spark, sf_smoke).orderBy("event_type").first()
    )
    ev1 = ev.filter(F.col("event_type") == one["event_type"])
    c1 = {
        (r["treated"], r["post"]): r["m"]
        for r in ev1.select(
            (bucket_fraction(["user_id"]) < 0.5).alias("treated"),
            (day >= _CUPED_PIVOT_DAY).alias("post"),
            "value",
        )
        .groupBy("treated", "post")
        .agg(F.avg("value").alias("m"))
        .collect()
    }
    want = round(
        (c1[(True, True)] - c1[(True, False)])
        - (c1[(False, True)] - c1[(False, False)]),
        4,
    )
    assert one["did_lift"] == want
