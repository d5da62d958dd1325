"""Round-8 batch 12: PrefixSpan-lite, hubness audit, source KL."""

from pyspark.sql import functions as F

from dumpty_spark.queries import REGISTRY


def test_prefixspan_subsequence_semantics(spark):
    """Gap-allowed ordered triples, one support per user, on a frame
    with a known answer."""
    import datetime as dt

    rows = []
    t0 = dt.datetime(2024, 1, 1)
    # user 1: a b x c  -> supports a>b>c (with gap), a>b>x? no: a>b>x
    # is also a real subsequence; the point is gap-allowance
    for i, t in enumerate(["a", "b", "x", "c"]):
        rows.append((1, i, t0 + dt.timedelta(minutes=i), t))
    # user 2: c b a (reverse order) -> supports c>b>a only
    for i, t in enumerate(["c", "b", "a"]):
        rows.append((2, 10 + i, t0 + dt.timedelta(minutes=i), t))
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    df.createOrReplaceTempView("__seq_probe")

    # replicate the query's core expression on the probe frame
    seqs = (
        df.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("s")
        )
        .select("user_id", F.col("s.event_type").alias("a"))
    )
    n = F.size("a")
    triples = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 2),
            lambda i: F.flatten(
                F.transform(
                    F.sequence(i + 1, n - 1),
                    lambda j: F.transform(
                        F.sequence(j + 1, n),
                        lambda k: F.concat_ws(
                            ">",
                            F.element_at("a", i),
                            F.element_at("a", j),
                            F.element_at("a", k),
                        ),
                    ),
                )
            ),
        )
    )
    got = {
        (r["user_id"], r["pattern"])
        for r in seqs.filter(n >= 3)
        .select("user_id", F.explode(F.array_distinct(triples)).alias("pattern"))
        .collect()
    }
    assert (1, "a>b>c") in got  # gap over x
    assert (1, "a>x>c") in got
    assert (2, "c>b>a") in got
    assert (2, "a>b>c") not in got  # order matters


def test_prefixspan_support_bounds(spark, sf_smoke):
    from dumpty_spark.sources import load_table

    rows = REGISTRY["q_prefixspan_triples"].fn(spark, sf_smoke).collect()
    assert 1 <= len(rows) <= 15
    n_users = (
        load_table(spark, sf_smoke, "events").select("user_id").distinct()
        .count()
    )
    sups = [r["support"] for r in rows]
    assert sups == sorted(sups, reverse=True)
    assert all(1 <= s <= n_users for s in sups)


def test_hubness_histogram_mass(spark, sf_smoke):
    from dumpty_spark.sources import load_table

    rows = REGISTRY["q_hubness_audit"].fn(spark, sf_smoke).collect()
    n_vecs = load_table(spark, sf_smoke, "embeddings").count()
    # histogram masses: vectors partition over k; top-1 edges total n_vecs
    assert sum(r["n_vectors"] for r in rows) == n_vecs
    assert sum(r["k_occ"] * r["n_vectors"] for r in rows) == n_vecs
    ks = [r["k_occ"] for r in rows]
    assert ks == sorted(ks)


def test_hubness_ann_composed_all_green(spark, sf_smoke):
    rows = REGISTRY["q_hubness_ann_composed"].fn(spark, sf_smoke).collect()
    assert [r["metric"] for r in rows] == [
        "coverage_complete",
        "hist_l1_le_100",
        "top1_agreement_ge_085",
    ]
    assert all(r["ok"] for r in rows)


def test_hubness_shared_tail_identity(spark, sf_smoke):
    """The composed audit and the brute audit share hubness_hist_from_top1:
    feeding the brute top-1s through the shared tail must reproduce
    q_hubness_audit exactly."""
    from pyspark.sql import functions as F

    from dumpty_spark.operators import similarity as S
    from dumpty_spark.queries.frontier37 import (
        _HUB_SLICE,
        hubness_hist_from_top1,
    )
    from dumpty_spark.sources import load_table

    emb = load_table(spark, sf_smoke, "embeddings").filter(
        F.col("vec_id") < _HUB_SLICE
    )
    nv = S._normalized_corpus(emb, "vec_id", "embedding").localCheckpoint()
    bf1 = (
        S.brute_force_topk(emb, emb, k=2, normalized=nv)
        .filter(F.col("q_id") != F.col("n_id"))
        .groupBy("q_id")
        .agg(
            F.expr("max_by(n_id, named_struct('s', sim, 'i', -n_id))").alias(
                "n_id"
            )
        )
    )
    via_tail = [
        (r["k_occ"], r["n_vectors"])
        for r in hubness_hist_from_top1(spark, bf1, nv.count()).collect()
    ]
    audit = [
        (r["k_occ"], r["n_vectors"])
        for r in REGISTRY["q_hubness_audit"].fn(spark, sf_smoke).collect()
    ]
    assert via_tail == audit


def test_source_kl_nonneg_and_self_zero(spark, sf_smoke):
    rows = REGISTRY["q_source_kl_divergence"].fn(spark, sf_smoke).collect()
    assert len(rows) >= 1
    for r in rows:
        # KL >= 0 up to micro-nat rounding of individual terms
        assert r["kl_nats"] >= -0.001
        assert r["n_tokens"] >= 1
