"""CSV malformed-row quarantine source (sources/csv_source.py, S7)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dumpty_spark.sources.csv_source import read_csv_quarantine

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def write_lines(path: str, lines: list[str]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def test_split_is_exact_and_lossless(spark, tmp_path):
    csv_dir = str(tmp_path / "in")
    write_lines(
        os.path.join(csv_dir, "a.csv"),
        [
            "id,name,score",
            "1,alice,0.5",
            "2,bob,NOT_A_NUMBER",
            "3,carol,0.75",
            "garbage line with no structure at all",
            "5,eve,1.25",
        ],
    )
    clean, quarantined = read_csv_quarantine(
        spark, csv_dir, SCHEMA, quarantine_dir=str(tmp_path / "quar")
    )
    got = sorted((r["id"], r["name"], r["score"]) for r in clean.collect())
    assert got == [(1, "alice", 0.5), (3, "carol", 0.75), (5, "eve", 1.25)]
    bad = sorted(r["raw_line"] for r in quarantined.collect())
    assert bad == [
        "2,bob,NOT_A_NUMBER",
        "garbage line with no structure at all",
    ]
    # quarantine sink holds the same rows and points at the source file
    q = spark.read.parquet(str(tmp_path / "quar"))
    assert sorted(r["raw_line"] for r in q.collect()) == bad
    assert all(r["src_file"].endswith("a.csv") for r in q.collect())


def test_all_clean_and_all_bad_edges(spark, tmp_path):
    ok_dir = str(tmp_path / "ok")
    write_lines(os.path.join(ok_dir, "f.csv"), ["id,name,score", "1,a,1.0"])
    clean, quarantined = read_csv_quarantine(spark, ok_dir, SCHEMA)
    assert clean.count() == 1 and quarantined.count() == 0

    bad_dir = str(tmp_path / "bad")
    write_lines(os.path.join(bad_dir, "f.csv"), ["id,name,score", "x,y,z"])
    clean, quarantined = read_csv_quarantine(spark, bad_dir, SCHEMA)
    assert clean.count() == 0 and quarantined.count() == 1
    assert clean.columns == ["id", "name", "score"]
