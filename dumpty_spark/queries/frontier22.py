"""Round-7 engine extensions, tenth batch (EXT E183-E184): the last two
unexercised Pandas/Arrow API surfaces — cogrouped applyInPandas (per-key
two-sided custom merge) and mapInArrow (RecordBatch-native transforms).

Both carry exact oracles: the cogrouped merge reproduces the E6 as-of
join (so the hash match proves the API path is semantics-identical to
the relational plan), and the Arrow kernel pass reproduces plain SQL
length arithmetic — API-surface parity evidence, not new semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.sources import load_table

# ---------------------------------------------------------------------------
# E183: cogrouped applyInPandas — per-key two-sided custom merge
# ---------------------------------------------------------------------------
# The DataFrame API's escape hatch for per-key merges no join expresses
# (bespoke matching, per-entity model state, sequence alignment):
# ``a.groupBy(k).cogroup(b.groupBy(k)).applyInPandas`` hands each key's
# TWO frames to one Arrow-batched pandas function. Here the function is
# pandas.merge_asof — deliberately reproducing q_asof_join's exact
# surface, so the DuckDB ASOF oracle proves the cogroup path returns
# byte-identical results to the pure-relational union-merge plan (E6).
# Scale shape: one co-partitioned shuffle on the key, per-key state =
# that user's rows only; the global BatchEvalPython ban does not apply
# (FlatMapCoGroupsInPandas is Arrow-batched). Bounded to a 30-user
# slice: the query is API-parity EVIDENCE (the relational E6 plan is
# the scale path for as-of semantics; cogroup exists for merges no
# join expresses), and per-group pandas dispatch across every user
# made the full corpus the suite's most expensive query (23s) while
# proving nothing extra.

_COGROUP_ORACLE = """
WITH p AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'purchase' AND user_id < 30
),
c AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE event_type = 'click' AND user_id < 30
)
SELECT p.event_id AS purchase_id, p.user_id,
       STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       c.event_id AS click_id,
       STRFTIME(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       ROUND(c.value, 4) AS click_value
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY purchase_id
"""


@register(
    "q_cogroup_asof",
    oracle=_COGROUP_ORACLE,
    doc="cogrouped applyInPandas merge (E183): per-user two-sided "
    "pandas.merge_asof through cogroup().applyInPandas, reproducing "
    "q_asof_join's exact surface — the hash match proves the Arrow "
    "cogroup path is semantics-identical to the relational union-merge "
    "plan; one co-partitioned shuffle, per-key state only",
)
def q_cogroup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("cts"),
        "value",
    )

    def merge(pdf_p, pdf_c):
        import pandas as pd

        if pdf_p.empty:
            return pd.DataFrame(
                columns=["purchase_id", "user_id", "ts", "click_id",
                         "cts", "value"]
            )
        pdf_p = pdf_p.sort_values(["ts", "purchase_id"])
        if pdf_c.empty:
            out = pdf_p.copy()
            out["click_id"] = pd.array([None] * len(out), dtype="Int64")
            out["cts"] = pd.NaT
            out["value"] = float("nan")
            return out[["purchase_id", "user_id", "ts", "click_id",
                        "cts", "value"]]
        pdf_c = pdf_c.sort_values(["cts", "click_id"]).rename(
            columns={"cts": "ts"}
        )
        out = pd.merge_asof(
            pdf_p,
            pdf_c.drop(columns=["user_id"]),
            on="ts",
            direction="backward",
            suffixes=("", "_c"),
        )
        # merge_asof folds the right ts into the join key; recover the
        # matched click timestamp from the click frame by id
        m = pdf_c.set_index("click_id")["ts"]
        out["cts"] = out["click_id"].map(m)
        out["click_id"] = out["click_id"].astype("Int64")
        return out[["purchase_id", "user_id", "ts", "click_id",
                    "cts", "value"]]

    joined = (
        p.groupBy("user_id")
        .cogroup(c.groupBy("user_id"))
        .applyInPandas(
            merge,
            schema="purchase_id long, user_id long, ts timestamp, "
            "click_id long, cts timestamp, value double",
        )
    )
    return joined.select(
        "purchase_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        "click_id",
        F.date_format("cts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.round("value", 4).alias("click_value"),
    ).orderBy("purchase_id")


# ---------------------------------------------------------------------------
# E184: mapInArrow — RecordBatch-native columnar transform
# ---------------------------------------------------------------------------
# The zero-pandas fast path for columnar kernels: each partition's
# Arrow RecordBatches flow straight through pyarrow.compute (vectorized
# C++) with no pandas materialization — the right API tier for byte-
# level featurization (the multimodal family's mapInPandas without the
# DataFrame overhead). Kernels: utf8 char length vs encoded byte
# length per doc, rolled up per source; the oracle is plain SQL length
# arithmetic, so the hash match proves the Arrow path end to end.

_ARROW_ORACLE = """
SELECT source,
       COUNT(*)::BIGINT AS n_docs,
       SUM(LENGTH(text))::BIGINT AS chars,
       SUM(OCTET_LENGTH(ENCODE(text)))::BIGINT AS bytes,
       SUM(CASE WHEN OCTET_LENGTH(ENCODE(text)) > LENGTH(text)
                THEN 1 ELSE 0 END)::BIGINT AS n_multibyte
FROM documents
GROUP BY source
ORDER BY source
"""


@register(
    "q_arrow_lengths",
    oracle=_ARROW_ORACLE,
    doc="mapInArrow columnar kernels (E184): per-batch pyarrow.compute "
    "utf8_length / binary byte length with no pandas materialization — "
    "the RecordBatch-native API tier below mapInPandas; per-source "
    "char/byte mass + multibyte-doc counts, oracle is plain SQL length "
    "arithmetic",
)
def q_arrow_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "text")

    def kernels(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            text = batch.column("text")
            chars = pc.utf8_length(text)
            raw = pc.cast(text, pa.binary())
            nbytes = pc.binary_length(raw)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("source"),
                    pc.cast(chars, pa.int64()),
                    pc.cast(nbytes, pa.int64()),
                    pc.cast(pc.greater(nbytes, chars), pa.int32()),
                ],
                ["source", "chars", "bytes", "mb"],
            )

    feats = docs.mapInArrow(
        kernels, schema="source string, chars long, bytes long, mb int"
    )
    return (
        feats.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("chars").alias("chars"),
            F.sum("bytes").alias("bytes"),
            F.sum("mb").cast("long").alias("n_multibyte"),
        )
        .orderBy("source")
    )
