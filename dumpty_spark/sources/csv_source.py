"""CSV source with malformed-row quarantine (EXT S7).

The reference ingests from databases, where the driver guarantees row
shape; file-based ingestion has no such guarantee, and the standard
failure mode at 100 TB is ten bad lines in a billion aborting (FAILFAST)
or silently nulling out (naive PERMISSIVE). This source makes the messy
middle explicit:

- read PERMISSIVE with ``columnNameOfCorruptRecord`` so unparseable
  lines survive as raw text instead of killing the scan,
- route them to a quarantine sink (raw line + source file, so the bad
  byte ranges are findable upstream),
- hand clean, schema-true rows onward.

Both halves stay lazy DataFrames; the split predicate is "corrupt-record
column is null", evaluated map-side on the scan. Parse counts come from
one aggregation over a cached scan, not a second file read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    quarantine_dir: str | None = None,
    header: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Returns (clean, quarantined).

    ``clean`` has exactly ``schema``'s columns, only fully-parsed rows.
    ``quarantined`` is (raw line, source file) for every row that failed
    to parse; if ``quarantine_dir`` is given it is also written there
    (one partition per call — bad rows are few by assumption; if they
    aren't, the pipeline has a bigger problem than file sizing).

    Spark caveat encoded here so callers can't trip it: the corrupt-
    record column must be part of the read schema, and filtering on it
    requires the scan to be materialized via a cache or checkpoint —
    a raw ``df.filter(corrupt.isNotNull())`` on a lazy CSV scan returns
    empty because the parser prunes the referenced columns.
    """
    # NB: StructType.add MUTATES self as well as returning it — build a
    # fresh struct so the caller's schema object is never modified
    read_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    df = (
        spark.read.schema(read_schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
        .withColumn("_src_file", F.input_file_name())
        .localCheckpoint()  # see docstring: required for the corrupt filter
    )
    clean = df.filter(F.col(CORRUPT_COL).isNull()).select(
        *[f.name for f in schema.fields]
    )
    quarantined = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line"), F.col("_src_file").alias("src_file")
    )
    if quarantine_dir is not None:
        quarantined.coalesce(1).write.mode("overwrite").parquet(quarantine_dir)
    return clean, quarantined
