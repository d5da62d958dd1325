"""Round-7 engine extensions, eighth batch (EXT E180): Luhn-validated
payment-number scanning — checksum-verified PII detection for crawl
corpora (the validation step the regex-only E4 PII scrub cannot do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E180: Luhn checksum scan
# ---------------------------------------------------------------------------
# A digit run that LOOKS like a card number usually isn't one; the Luhn
# mod-10 checksum separates real payment numbers from ids/timestamps,
# which is the difference between a compliance gate and a false-positive
# storm. Candidate runs are maximal digit sequences of card length
# (13-16 — maximality from a greedy [0-9]+ extract, no lookarounds, so
# the regex is RE2/Java portable); each run's checksum is one
# explode-by-position fold (alternate-double-from-the-right, subtract 9
# over 9), all pure Column arithmetic. Deterministic injection (the
# E152 defect-seeding pattern): docs %37 gain a Luhn-VALID test number,
# docs %41 a Luhn-INVALID one, so the oracle provably counts exactly
# the planted findings on both sides of the checksum. Per-source valid/
# invalid run counts + affected docs; runs-sized state after one scan.

_CC_VALID = "4532015112830366"
_CC_INVALID = "4532015112830367"

_LUHN_ORACLE = f"""
WITH seeded AS (
  SELECT doc_id, source,
         text
         || CASE WHEN doc_id % 37 = 0 THEN ' {_CC_VALID}' ELSE '' END
         || CASE WHEN doc_id % 41 = 0 THEN ' {_CC_INVALID}' ELSE '' END
           AS text
  FROM documents
),
runs AS (
  SELECT doc_id, source, r.run
  FROM seeded,
       UNNEST(regexp_extract_all(text, '[0-9]+')) AS r(run)
  WHERE LENGTH(r.run) BETWEEN 13 AND 16
),
digits AS (
  SELECT doc_id, source, run,
         (LENGTH(run) - p)::INTEGER AS rpos,
         substr(run, p, 1)::INTEGER AS d
  FROM runs, UNNEST(generate_series(1, LENGTH(run))) AS t(p)
),
checked AS (
  SELECT doc_id, source, run,
         (SUM(CASE WHEN rpos % 2 = 1
                   THEN CASE WHEN d * 2 > 9 THEN d * 2 - 9 ELSE d * 2 END
                   ELSE d END) % 10 = 0) AS luhn_ok
  FROM digits
  GROUP BY doc_id, source, run
)
SELECT source,
       COUNT(DISTINCT CASE WHEN luhn_ok THEN doc_id END)::BIGINT
         AS docs_with_valid,
       SUM(CASE WHEN luhn_ok THEN 1 ELSE 0 END)::BIGINT AS valid_runs,
       SUM(CASE WHEN NOT luhn_ok THEN 1 ELSE 0 END)::BIGINT AS invalid_runs
FROM checked
GROUP BY source
ORDER BY source
"""


@register(
    "q_luhn_scan",
    oracle=_LUHN_ORACLE,
    doc="Luhn checksum payment-number scan (E180): maximal 13-16 digit "
    "runs (greedy extract, RE2/Java-portable) validated by the mod-10 "
    "alternate-double fold in pure Column arithmetic — the checksum "
    "step that turns regex PII detection into a compliance gate; "
    "deterministic valid/invalid seeding proves both checksum branches; "
    "per-source valid/invalid counts, runs-sized state after one scan",
)
def q_luhn_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 37 == 0, F.lit(f" {_CC_VALID}")).otherwise(
                F.lit("")
            ),
            F.when(
                F.col("doc_id") % 41 == 0, F.lit(f" {_CC_INVALID}")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    runs = (
        seeded.select(
            "doc_id",
            "source",
            F.explode(
                F.expr("regexp_extract_all(text, '[0-9]+', 0)")
            ).alias("run"),
        )
        .filter(F.length("run").between(13, 16))
    )
    digits = runs.select(
        "doc_id",
        "source",
        "run",
        F.explode(F.sequence(F.lit(1), F.length("run"))).alias("p"),
    ).select(
        "doc_id",
        "source",
        "run",
        (F.length("run") - F.col("p")).alias("rpos"),
        F.expr("CAST(substring(run, p, 1) AS INT)").alias("d"),
    )
    doubled = F.when(
        F.col("rpos") % 2 == 1,
        F.when(F.col("d") * 2 > 9, F.col("d") * 2 - 9).otherwise(
            F.col("d") * 2
        ),
    ).otherwise(F.col("d"))
    checked = (
        digits.groupBy("doc_id", "source", "run")
        .agg((F.sum(doubled) % 10 == 0).alias("luhn_ok"))
    )
    return (
        checked.groupBy("source")
        .agg(
            F.countDistinct(
                F.when(F.col("luhn_ok"), F.col("doc_id"))
            ).alias("docs_with_valid"),
            F.sum(F.col("luhn_ok").cast("int")).alias("valid_runs"),
            F.sum((~F.col("luhn_ok")).cast("int")).alias("invalid_runs"),
        )
        .orderBy("source")
    )
