"""Round-8 batch 4: grid DBSCAN, conformal intervals, propensity ATT,
frequent triples — contract pins beyond the oracle hashes."""

from pyspark.sql import functions as F

from dumpty_spark.queries import REGISTRY


def test_grid_dbscan_partition_identity(spark, sf_smoke):
    r = REGISTRY["q_grid_dbscan"].fn(spark, sf_smoke).first()
    assert r["core_pts"] + r["border_pts"] + r["noise_pts"] == r["n_points"]
    assert r["n_core_cells"] <= r["n_cells"]
    assert 1 <= r["n_clusters"] <= r["n_core_cells"]
    assert r["max_cluster_pts"] <= r["core_pts"]


def test_grid_dbscan_hand_grid(spark):
    """Two dense 3x3 blocks separated by an empty gap must form two
    clusters; a lone far cell stays noise. Runs the cell machinery on a
    hand-built cell frame via the same offsets/CC composition."""
    from dumpty_spark.operators.dedup import connected_components

    cells = []
    for bx in (0, 10):
        for dx in range(3):
            for dy in range(3):
                cells.append((bx + dx, dy, 5))
    cells.append((100, 100, 1))  # isolated sparse cell
    cdf = spark.createDataFrame(cells, "cx long, cy long, n long")
    offsets = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
        "dx long, dy long",
    )
    shifted = cdf.crossJoin(F.broadcast(offsets)).select(
        (F.col("cx") + F.col("dx")).alias("tx"),
        (F.col("cy") + F.col("dy")).alias("ty"),
        "n",
    )
    mass = shifted.groupBy("tx", "ty").agg(F.sum("n").alias("mass"))
    nb = cdf.join(
        mass, (F.col("cx") == F.col("tx")) & (F.col("cy") == F.col("ty"))
    ).select("cx", "cy", "n", "mass")
    core = nb.filter(F.col("mass") >= 20).select(
        "cx", "cy", (F.col("cx") * 1000 + F.col("cy")).alias("id")
    )
    tgt = core.crossJoin(F.broadcast(offsets)).select(
        F.col("id").alias("u"),
        (F.col("cx") + F.col("dx")).alias("tx"),
        (F.col("cy") + F.col("dy")).alias("ty"),
    )
    edges = tgt.join(
        core.select(
            F.col("cx").alias("tx"), F.col("cy").alias("ty"),
            F.col("id").alias("v"),
        ),
        ["tx", "ty"],
    ).select("u", "v")
    comp = connected_components(edges, a_col="u", b_col="v")
    n_clusters = comp.select("cluster_id").distinct().count()
    assert n_clusters == 2
    assert core.count() == 18  # the lone far cell is not core


def test_conformal_coverage_near_nominal(spark, sf_smoke):
    rows = REGISTRY["q_conformal_interval"].fn(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r["n_covered"] <= r["n_test"]
        # split conformal guarantees >= 90% marginal coverage in
        # expectation; on finite per-type slices allow wide slack but
        # catch a broken qhat (e.g. 0 coverage or trivial 100% with
        # tiny qhat)
        assert 0.6 <= r["coverage"] <= 1.0
        assert r["qhat"] >= 0


def test_propensity_att_identities(spark, sf_smoke):
    r = REGISTRY["q_propensity_att"].fn(spark, sf_smoke).first()
    assert r["n_treated"] > 0 and r["n_control"] > 0
    assert 1 <= r["n_strata_used"] <= 5
    assert abs(r["att"] - r["att_micro"] / 1e6) < 1e-9


def test_frequent_triples_support_floor_and_order(spark, sf_t2):
    rows = REGISTRY["q_frequent_triples"].fn(spark, sf_t2).collect()
    assert rows  # 12 triples at sf0.01
    ns = [r["n_abc"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    for r in rows:
        assert r["n_abc"] >= 2
        assert r["pa"] < r["pb"] < r["pc"]
        assert r["lift3"] > 0
