"""Round-7 batch (E186-E187) value contracts at smoke scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from dumpty_spark.queries import REGISTRY


def test_template_dedup_accounting(spark, sf_smoke):
    rows = REGISTRY["q_template_dedup"].fn(spark, sf_smoke).collect()
    for r in rows:
        assert 0 < r["n_kept"] <= r["n_templates"] <= r["n_docs"]
        assert 0.0 <= r["template_dup_frac"] < 1.0


def test_template_dedup_catches_slot_variants(spark):
    """Docs differing only in digit slots collapse to one template."""
    df = spark.createDataFrame(
        [
            (1, "s", "order 123 shipped to bay 7"),
            (2, "s", "order 999 shipped to bay 42"),
            (3, "s", "completely different text"),
        ],
        ["doc_id", "source", "text"],
    )
    tpl = F.md5(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower("text"), "[0-9]+", "#"),
                "[^a-z#]+",
                " ",
            )
        )
    )
    n = df.select(tpl.alias("t")).distinct().count()
    assert n == 2


def test_nested_roundtrip_values(spark, sf_smoke):
    from dumpty_spark.sources.parquet import load_table

    rows = REGISTRY["q_nested_roundtrip"].fn(spark, sf_smoke).collect()
    ev = load_table(spark, sf_smoke, "events")
    n_users = ev.select("user_id").distinct().count()
    assert len(rows) == n_users
    for r in rows[:10]:
        assert r["first_us"] <= r["last_us"]
        assert r["n"] >= 1
        ids = r["first_ids_csv"].split(",")
        assert 1 <= len(ids) <= 5
        assert ids == sorted(ids, key=int)
