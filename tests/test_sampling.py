"""Invariants of deterministic hash sampling (operators/sampling.py):
membership is a pure function of the data — identical across runs AND
partitionings — fractions land near target, and splits partition the
input exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from dumpty_spark.operators import sampling as SM
from dumpty_spark.sources import load_table


def test_sample_fraction_and_determinism(spark, sf_t2):
    li = load_table(spark, sf_t2, "lineitem")
    n = li.count()
    s1 = SM.sample_hash(li, ["l_orderkey", "l_linenumber"], 0.2)
    got = s1.count()
    assert abs(got / n - 0.2) < 0.02
    # repartitioning must not change membership (df.sample would)
    s2 = SM.sample_hash(li.repartition(7), ["l_orderkey", "l_linenumber"], 0.2)
    assert s2.count() == got
    ids1 = {tuple(r) for r in s1.select("l_orderkey", "l_linenumber").collect()}
    ids2 = {tuple(r) for r in s2.select("l_orderkey", "l_linenumber").collect()}
    assert ids1 == ids2


def test_sample_nesting_monotone(spark, sf_t2):
    """A 5% sample is a subset of the 20% sample — hash thresholds nest,
    so growing the corpus subset never resamples (critical for data
    ablations)."""
    li = load_table(spark, sf_t2, "lineitem")
    small = SM.sample_hash(li, ["l_orderkey", "l_linenumber"], 0.05)
    big = SM.sample_hash(li, ["l_orderkey", "l_linenumber"], 0.20)
    assert small.join(big, ["l_orderkey", "l_linenumber"], "left_anti").count() == 0


def test_split_disjoint_exhaustive(spark, sf_t2):
    docs = load_table(spark, sf_t2, "documents")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    labeled = docs.withColumn("split", SM.split_column(["doc_id"], w))
    counts = {r["split"]: r["n"] for r in labeled.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == docs.count()  # exhaustive, disjoint by construction
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / docs.count() - 0.8) < 0.1


def test_stratified_rates(spark, sf_t2):
    ev = load_table(spark, sf_t2, "events")
    out = SM.stratified_sample_hash(
        ev, ["event_id"], "event_type", {"click": 0.02, "view": 0.5}, default=1.0
    )
    base = {r["event_type"]: r["n"] for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    got = {r["event_type"]: r["n"] for r in out.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert got.get("click", 0) / base["click"] < 0.08
    assert abs(got["view"] / base["view"] - 0.5) < 0.1
    assert got["error"] == base["error"]  # default 1.0 keeps everything


def test_pack_greedy_rule_and_partition_invariance(spark):
    """Greedy next-fit semantics: within a shard (in id order) a doc
    joins the current bin iff it fits, an over-budget doc gets its own
    bin, and the assignment is identical no matter how the input is
    partitioned (the shard+order are md5/id-derived, not physical)."""
    from dumpty_spark.operators.packing import pack_greedy

    rows = [(i, "x " * w) for i, w in enumerate([5, 5, 5, 20, 3, 9, 9, 9, 1])]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from dumpty_spark.functions.text import word_count

    out = pack_greedy(df, "doc_id", word_count("text"), budget=10)
    got = {r["id"]: (r["shard"], r["bin_idx"], r["weight"]) for r in out.collect()}
    assert set(got) == set(range(9))
    # each weight is correct
    assert [got[i][2] for i in range(9)] == [5, 5, 5, 20, 3, 9, 9, 9, 1]
    # greedy invariants, checked per shard against a reference packing
    import hashlib
    from collections import defaultdict

    by_shard = defaultdict(list)
    for i in range(9):
        by_shard[hashlib.md5(str(i).encode()).hexdigest()[0]].append(i)
    for shard, ids in by_shard.items():
        fill, cur, first = 0, 0, True
        for i in sorted(ids):
            w = got[i][2]
            if first:
                first, fill = False, w
            elif fill + w <= 10:
                fill += w
            else:
                cur, fill = cur + 1, w
            assert got[i][:2] == (shard, cur), (i, got[i], (shard, cur))

    # physical-layout invariance
    re1 = pack_greedy(df.repartition(7), "doc_id", word_count("text"), budget=10)
    assert {tuple(r) for r in re1.collect()} == {tuple(r) for r in out.collect()}


def test_pack_greedy_properties_hypothesis(spark):
    """Property: for arbitrary weight lists, (a) no bin exceeds the
    budget unless it holds exactly one oversized doc, (b) bin indices
    per shard are contiguous from 0, (c) every doc is assigned exactly
    once. Driven by Hypothesis over the weight distribution; the Spark
    job runs once per example set, so examples are kept small."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dumpty_spark.operators.packing import pack_greedy

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=30),
        st.integers(min_value=5, max_value=25),
    )
    def run(weights, budget):
        rows = [(i, "w " * w) for i, w in enumerate(weights)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        from dumpty_spark.functions.text import word_count

        out = pack_greedy(df, "doc_id", word_count("text"), budget=budget).collect()
        assert sorted(r["id"] for r in out) == list(range(len(weights)))
        from collections import defaultdict

        fills = defaultdict(int)
        members = defaultdict(int)
        shard_bins = defaultdict(set)
        for r in out:
            fills[(r["shard"], r["bin_idx"])] += r["weight"]
            members[(r["shard"], r["bin_idx"])] += 1
            shard_bins[r["shard"]].add(r["bin_idx"])
        for key, fill in fills.items():
            assert fill <= budget or members[key] == 1, (key, fill)
        for shard, bins in shard_bins.items():
            assert bins == set(range(len(bins))), (shard, bins)

    run()


def test_split_and_weighted_sample_properties_hypothesis(spark, sf_smoke):
    """Properties over arbitrary split weights and fractions: every row
    gets exactly one NON-NULL label drawn from the weights dict (the
    labels partition the rows), and hash-sampling is MONOTONE: the
    f1-sample is a subset of the f2-sample whenever f1 <= f2 (the
    property that makes deterministic sampling composable across
    pipeline stages)."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dumpty_spark.operators import sampling as SM
    from dumpty_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents").select("doc_id").cache()
    n_total = docs.count()

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.floats(min_value=0.05, max_value=1.0), min_size=2, max_size=4
        ),
        st.floats(min_value=0.0, max_value=1.0),
        st.floats(min_value=0.0, max_value=1.0),
    )
    def run(raw_weights, f1, f2):
        total = sum(raw_weights)
        weights = {f"s{i}": w / total for i, w in enumerate(raw_weights)}
        labels = [
            r["split"]
            for r in docs.withColumn(
                "split", SM.split_column(["doc_id"], weights)
            ).collect()
        ]
        # exhaustive (one label per row), no NULLs, only known labels
        assert len(labels) == n_total
        counts = Counter(labels)
        assert None not in counts and set(counts) <= set(weights)
        assert sum(counts.values()) == n_total

        lo, hi = sorted([f1, f2])
        small = {r["doc_id"] for r in SM.sample_hash(docs, ["doc_id"], lo).collect()}
        big = {r["doc_id"] for r in SM.sample_hash(docs, ["doc_id"], hi).collect()}
        assert small <= big  # monotone nesting

    run()


def test_sample_exact_k_invariants(spark, sf_smoke):
    """exact-k: returns exactly k, stable under repartitioning, nested
    (k=10 sample ⊆ k=40 sample), and compiled to TakeOrderedAndProject."""
    import contextlib
    import io

    from dumpty_spark.operators import sampling as SM
    from dumpty_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents")
    s40 = SM.sample_exact_k(docs, ["doc_id"], 40)
    ids40 = [r["doc_id"] for r in s40.collect()]
    assert len(ids40) == 40
    ids40_rep = [
        r["doc_id"]
        for r in SM.sample_exact_k(docs.repartition(7), ["doc_id"], 40).collect()
    ]
    assert ids40 == ids40_rep
    ids10 = [r["doc_id"] for r in SM.sample_exact_k(docs, ["doc_id"], 10).collect()]
    assert ids10 == ids40[:10]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        s40.explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()


def test_sample_weighted_k_invariants(spark, sf_smoke):
    """weighted exact-k: exactly k rows, partition-invariant, weight-
    proportional (mean weight of winners > corpus mean), non-positive
    weights excluded, and still TakeOrderedAndProject."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from dumpty_spark.operators import sampling as SM
    from dumpty_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents")
    sel = SM.sample_weighted_k(docs, ["doc_id"], F.col("n_chars"), 30)
    ids = sorted(r["doc_id"] for r in sel.collect())
    assert len(ids) == 30
    ids_rep = sorted(
        r["doc_id"]
        for r in SM.sample_weighted_k(
            docs.repartition(7), ["doc_id"], F.col("n_chars"), 30
        ).collect()
    )
    assert ids == ids_rep

    mean_all = docs.agg(F.avg("n_chars")).first()[0]
    mean_sel = sel.agg(F.avg("n_chars")).first()[0]
    assert mean_sel > mean_all  # selection prob ∝ n_chars

    # zero/negative weights can never win
    rigged = docs.withColumn(
        "w", F.when(F.col("doc_id") % 2 == 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    )
    win = SM.sample_weighted_k(rigged, ["doc_id"], F.col("w"), 20)
    assert all(r["doc_id"] % 2 == 1 for r in win.collect())

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sel.explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()
