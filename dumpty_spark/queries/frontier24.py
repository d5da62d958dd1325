"""Round-7 engine extensions, twelfth batch (EXT E186-E187):
template-normalized dedup and a nested-type parquet round-trip audit.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.session import warehouse_scratch
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E186: template-normalized dedup
# ---------------------------------------------------------------------------
# Instruction/synthetic corpora are full of near-identical documents
# that differ only in slot VALUES ("order 1234 shipped" / "order 5678
# shipped") — exact dedup misses them, MinHash wastes candidates on
# them. Normalizing the slots (digit runs -> #, collapsed whitespace,
# lowercase) and hashing the TEMPLATE catches the family in one
# map-side expression + one partial-agg shuffle. Report: per source,
# docs vs distinct templates vs docs surviving template-keep-first,
# plus the corpus's top-5 most duplicated templates — the
# synthetic-data redundancy screen before mixing.

_TEMPLATE_ORACLE = """
WITH t AS (
  SELECT doc_id, source,
         md5(trim(regexp_replace(regexp_replace(lower(text),
             '[0-9]+', '#', 'g'), '[^a-z#]+', ' ', 'g'))) AS tpl
  FROM documents
),
k AS (
  SELECT tpl, MIN(doc_id) AS keeper, COUNT(*)::BIGINT AS n
  FROM t GROUP BY tpl
)
SELECT t.source,
       COUNT(*)::BIGINT AS n_docs,
       COUNT(DISTINCT t.tpl)::BIGINT AS n_templates,
       SUM(CASE WHEN t.doc_id = k.keeper THEN 1 ELSE 0 END)::BIGINT
         AS n_kept,
       ROUND(1 - COUNT(DISTINCT t.tpl)::DOUBLE / COUNT(*), 6)
         AS template_dup_frac
FROM t JOIN k ON k.tpl = t.tpl
GROUP BY t.source
ORDER BY t.source
"""


@register(
    "q_template_dedup",
    oracle=_TEMPLATE_ORACLE,
    doc="template-normalized dedup (E186): digit runs masked to #, "
    "punctuation collapsed, lowercase -> template hash; per-source "
    "docs / distinct templates / keep-first survivors and the template "
    "duplication fraction — the slot-value near-dup family exact dedup "
    "misses and MinHash wastes candidates on; one map-side expression "
    "+ one partial-agg shuffle",
)
def q_template_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tpl = F.md5(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower("text"), "[0-9]+", "#"),
                "[^a-z#]+",
                " ",
            )
        )
    )
    t = docs.select("doc_id", "source", tpl.alias("tpl"))
    k = t.groupBy("tpl").agg(F.min("doc_id").alias("keeper"))
    return (
        t.join(k, "tpl")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("tpl").alias("n_templates"),
            F.sum((F.col("doc_id") == F.col("keeper")).cast("int")).alias(
                "n_kept"
            ),
            F.round(
                1 - F.countDistinct("tpl").cast("double") / F.count("*"), 6
            ).alias("template_dup_frac"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# E187: nested-type parquet round trip
# ---------------------------------------------------------------------------
# Long-lived lake tables carry structs, arrays and maps — none of which
# the flat NDJSON/ORC round trips (K1/E158) exercise at rest. Build a
# deterministic nested row per user from events (struct<first,last>,
# sorted event-id array slice, type->count map), write parquet, read
# back, FLATTEN relationally and hash — proving nested
# encode/decode/pushdown survive the columnar round trip value-exact.
# The oracle computes the same flattened surface from raw events.

_NESTED_ORACLE = """
WITH per AS (
  SELECT user_id,
         MIN(epoch_us(ts)) AS first_us,
         MAX(epoch_us(ts)) AS last_us,
         COUNT(*)::BIGINT AS n
  FROM events GROUP BY user_id
),
ids AS (
  SELECT user_id, LIST(event_id ORDER BY event_id)[1:5] AS first_ids
  FROM events GROUP BY user_id
),
tc AS (
  SELECT user_id, event_type, COUNT(*)::BIGINT AS c
  FROM events GROUP BY user_id, event_type
)
SELECT p.user_id,
       p.first_us, p.last_us, p.n,
       ARRAY_TO_STRING(i.first_ids, ',') AS first_ids_csv,
       (SELECT c FROM tc WHERE tc.user_id = p.user_id
        AND tc.event_type = 'click') AS n_click,
       (SELECT c FROM tc WHERE tc.user_id = p.user_id
        AND tc.event_type = 'purchase') AS n_purchase
FROM per p JOIN ids i ON i.user_id = p.user_id
ORDER BY p.user_id
"""


@register(
    "q_nested_roundtrip",
    oracle=_NESTED_ORACLE,
    doc="nested-type parquet round trip (E187): per-user "
    "struct<first,last,n> + sorted id-array slice + type->count map "
    "written to parquet and read back, flattened relationally — proves "
    "struct/array/map encode+decode survive the columnar round trip "
    "value-exact (the nested surface the flat NDJSON/ORC round trips "
    "never touch); store on warehouse scratch",
)
def q_nested_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    nested = (
        ev.select("user_id", us.alias("us"), "event_id", "event_type")
        .groupBy("user_id")
        .agg(
            F.struct(
                F.min("us").alias("first_us"),
                F.max("us").alias("last_us"),
                F.count("*").alias("n"),
            ).alias("span"),
            F.slice(F.sort_array(F.collect_list("event_id")), 1, 5).alias(
                "first_ids"
            ),
        )
    )
    counts = (
        ev.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("c"))
        .groupBy("user_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("event_type", "c"))
            ).alias("type_counts")
        )
    )
    full = nested.join(counts, "user_id")
    scratch = warehouse_scratch(spark, "nested")
    try:
        full.write.parquet(f"{scratch}/store")
        back = spark.read.parquet(f"{scratch}/store")
        return (
            back.select(
                "user_id",
                F.col("span.first_us").alias("first_us"),
                F.col("span.last_us").alias("last_us"),
                F.col("span.n").alias("n"),
                F.array_join(
                    F.transform("first_ids", lambda x: x.cast("string")), ","
                ).alias("first_ids_csv"),
                F.col("type_counts")["click"].alias("n_click"),
                F.col("type_counts")["purchase"].alias("n_purchase"),
            )
            .orderBy("user_id")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
