"""Round-8 batch 6: boilerplate n-gram census and the text-lines source."""

from pyspark.sql import functions as F

from dumpty_spark.queries import REGISTRY


def test_positional_ngrams_edges(spark):
    from dumpty_spark.functions.text import positional_ngrams, words

    df = spark.createDataFrame(
        [
            ("a b c d e",),   # 2 overlapping 4-grams, in order
            ("a b c d",),     # exactly one
            ("a b c",),       # shorter than n -> empty
            ("a",),           # single word -> empty
            ("",),            # empty -> empty
            ("a a a a a",),   # duplicates KEPT (census unit)
        ],
        "text string",
    ).select(positional_ngrams(words("text"), 4).alias("g"))
    got = [r["g"] for r in df.collect()]
    assert got[0] == ["a b c d", "b c d e"]
    assert got[1] == ["a b c d"]
    assert got[2] == [] and got[3] == [] and got[4] == []
    assert got[5] == ["a a a a", "a a a a"]


def test_boilerplate_census_no_expand_and_topk(spark, sf_smoke):
    df = REGISTRY["q_boilerplate_ngrams"].fn(spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the stacked two-level agg must NOT plan a count-distinct Expand
    assert "Expand" not in plan
    # top-k compiles to a driver-merged heap, not a global sort
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert len(rows) <= 20
    freqs = [r["doc_freq"] for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    assert all(r["n_occurrences"] >= r["doc_freq"] >= 2 for r in rows)


def test_textlines_roundtrip_all_sources_ok(spark, sf_smoke):
    df = REGISTRY["q_textlines_ingest"].fn(spark, sf_smoke)
    rows = df.collect()
    assert len(rows) >= 1
    assert all(r["roundtrip_ok"] for r in rows)
    assert all(r["n_docs"] >= 1 and r["sum_chars"] > 0 for r in rows)


def test_textlines_scratch_cleaned(spark, sf_smoke):
    import glob

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file://"
    ).removeprefix("file:")
    REGISTRY["q_textlines_ingest"].fn(spark, sf_smoke).collect()
    leftovers = glob.glob(f"{warehouse}/_textlines_scratch_*")
    assert leftovers == []
