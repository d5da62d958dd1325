"""Round-7 engine extensions, first batch (EXT E162-E163): the last two
tests-only store contracts promoted to driver-oracle-proven queries
(VERDICT r6 next-round tasks 4-5).

E162 promotes the incremental NEAR-dup store (E14'): three document
batches sequenced through one MinHash sketch store at rest; the oracle
re-derives the portable md5/universal-hash sketches, band candidates and
the signature-estimated Jaccard gate in SQL (the q_minhash_lsh_pairs
oracle already proved the band math portable) and unrolls the three-batch
survivor recursion as chained CTEs — so a hash match proves cross-run
suppression from sketches alone (history text is NEVER re-read) returns
exactly the committed state.

E163 promotes small-files compaction (E17): a 64-file write compacted to
a byte-budget chosen so the ceil arithmetic lands on exactly 3 files; the
oracle recomputes the row count and XOR table fingerprint from the raw
table and pins the file counts as literals — proving the rewrite changed
layout and ONLY layout.

Store queries root their scratch under spark.sql.warehouse.dir (shared
storage on a real deployment — the E129 discipline) and materialize via
localCheckpoint before the scratch dir is removed.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.session import warehouse_scratch
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E162: incremental NEAR-dup store audit (E14' promoted from tests-only)
# ---------------------------------------------------------------------------
# Semantics under audit (operators/dedup.py:incremental_near_dedup): per
# batch, a doc is suppressed iff some PRIOR doc shares an LSH band with
# it AND their 32-hash signature agreement is >= 0.8 — where "prior"
# means any same-batch doc with a smaller id (candidates come from the
# whole batch's bands), or any SURVIVOR of an earlier batch (only
# survivors' sketches were appended to the store). Docs too short to
# shingle have no sketch and always survive. The estimator fraction
# k/32 is a dyadic rational, so the >= 0.8 comparison is bit-portable.
# Deterministic half-slice (even doc_ids, batched by (id % 6) / 2): the
# audit measures the store CONTRACT — suppression, band pruning, append
# semantics — and volume scaling is the x10 sweep's job (the E129/E131
# slicing rationale); full-corpus sketching 3x made this the suite's
# most expensive query for no extra evidence.

_ND_HASHES = 32
_ND_BANDS = 8
_ND_THRESHOLD = 0.8


def _neardedup_oracle() -> str:
    from dumpty_spark.operators.dedup import MINHASH_P, minhash_params
    from dumpty_spark.queries.dedup import _WORDS_SQL

    rpb = _ND_HASHES // _ND_BANDS
    params = minhash_params(_ND_HASHES)
    mins = ",\n         ".join(
        f"MIN(({a} * hb + {b}) % {MINHASH_P}) AS h{i}"
        for i, (a, b) in enumerate(params)
    )
    band_rows = "\n  UNION ALL\n  ".join(
        f"SELECT id, {b} AS band_idx, md5("
        + " || '|' || ".join(f"h{b * rpb + r}::VARCHAR" for r in range(rpb))
        + ") AS band_hash FROM sig"
        for b in range(_ND_BANDS)
    )
    agree = " + ".join(
        f"(sa.h{i} = sb.h{i})::INT" for i in range(_ND_HASHES)
    )
    return f"""
WITH words AS (
  SELECT doc_id AS id, {_WORDS_SQL} AS w FROM documents WHERE doc_id % 2 = 0
),
sh AS (
  SELECT DISTINCT id, array_to_string(w[p:p+2], ' ') AS shingle
  FROM words, UNNEST(generate_series(1, GREATEST(len(w)-2, 0))) AS t(p)
  WHERE len(w) >= 3
),
hx AS (
  SELECT id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {MINHASH_P} AS hb
  FROM sh
),
sig AS (
  SELECT id, {mins}
  FROM hx GROUP BY id
),
bands AS (
  {band_rows}
),
cand AS (
  SELECT DISTINCT x.id AS p, y.id AS d
  FROM bands x JOIN bands y
    ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
   AND x.id <> y.id
),
agr AS (
  SELECT c.p, c.d
  FROM cand c
  JOIN sig sa ON sa.id = c.p
  JOIN sig sb ON sb.id = c.d
  WHERE ({agree})::DOUBLE / {_ND_HASHES} >= {_ND_THRESHOLD}
),
d3 AS (SELECT doc_id AS id, (doc_id % 6) // 2 AS batch FROM documents
       WHERE doc_id % 2 = 0),
s0 AS (
  SELECT y.id FROM d3 y WHERE y.batch = 0
  AND NOT EXISTS (SELECT 1 FROM agr JOIN d3 x ON x.id = agr.p
                  WHERE agr.d = y.id AND x.batch = 0 AND x.id < y.id)
),
s1 AS (
  SELECT y.id FROM d3 y WHERE y.batch = 1
  AND NOT EXISTS (SELECT 1 FROM agr JOIN d3 x ON x.id = agr.p
                  WHERE agr.d = y.id AND x.batch = 1 AND x.id < y.id)
  AND NOT EXISTS (SELECT 1 FROM agr JOIN s0 ON s0.id = agr.p
                  WHERE agr.d = y.id)
),
s2 AS (
  SELECT y.id FROM d3 y WHERE y.batch = 2
  AND NOT EXISTS (SELECT 1 FROM agr JOIN d3 x ON x.id = agr.p
                  WHERE agr.d = y.id AND x.batch = 2 AND x.id < y.id)
  AND NOT EXISTS (SELECT 1 FROM agr JOIN s0 ON s0.id = agr.p
                  WHERE agr.d = y.id)
  AND NOT EXISTS (SELECT 1 FROM agr JOIN s1 ON s1.id = agr.p
                  WHERE agr.d = y.id)
),
surv AS (
  SELECT 0 AS batch, id FROM s0
  UNION ALL SELECT 1, id FROM s1
  UNION ALL SELECT 2, id FROM s2
),
nin AS (SELECT batch, COUNT(*)::BIGINT AS n_in FROM d3 GROUP BY 1)
SELECT s.batch::BIGINT AS batch, nin.n_in,
       COUNT(*)::BIGINT AS n_survivors,
       bit_xor(('0x' || substr(md5(s.id::VARCHAR), 1, 15))::BIGINT)
         AS survivor_set_hash,
       MIN(s.id)::BIGINT AS min_id,
       MAX(s.id)::BIGINT AS max_id
FROM surv s JOIN nin ON nin.batch = s.batch
GROUP BY s.batch, nin.n_in
ORDER BY s.batch
"""


@register(
    "q_incremental_neardedup_store",
    oracle=_neardedup_oracle(),
    doc="incremental NEAR-dup store audit (E162, E14' promoted from "
    "tests-only): three document batches through one MinHash sketch "
    "store at rest — per batch, the XOR hash of the exact survivor id "
    "set must equal the oracle's unrolled recomputation of band "
    "candidates + signature-estimated Jaccard (>= 0.8 over 32 portable "
    "universal hashes), proving cross-run suppression works from "
    "sketches alone, history text never re-read",
)
def q_incremental_neardedup_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators.dedup import incremental_near_dedup

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 2 == 0)
        .select("doc_id", "text")
    )
    batch_col = ((F.col("doc_id") % 6) / 2).cast("long")
    scratch = warehouse_scratch(spark, "incnd")
    store = f"{scratch}/store"
    try:
        outs = []
        h = F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
        ).cast("bigint")
        for b in (0, 1, 2):
            batch = docs.filter(batch_col == b)
            surv = incremental_near_dedup(
                spark,
                batch,
                store,
                num_hashes=_ND_HASHES,
                bands=_ND_BANDS,
                threshold=_ND_THRESHOLD,
            )
            outs.append(
                surv.select(F.col("doc_id"), h.alias("h")).agg(
                    F.lit(b).cast("long").alias("batch"),
                    F.count("*").alias("n_survivors"),
                    F.expr("bit_xor(h)").alias("survivor_set_hash"),
                    F.min("doc_id").alias("min_id"),
                    F.max("doc_id").alias("max_id"),
                )
            )
        per_batch = outs[0].unionAll(outs[1]).unionAll(outs[2])
        n_in = docs.groupBy(batch_col.alias("batch")).agg(
            F.count("*").alias("n_in")
        )
        return (
            per_batch.join(F.broadcast(n_in), "batch")
            .select(
                "batch", "n_in", "n_survivors", "survivor_set_hash",
                "min_id", "max_id",
            )
            .orderBy("batch")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


# ---------------------------------------------------------------------------
# E163: small-files compaction audit (E17 promoted from tests-only)
# ---------------------------------------------------------------------------
# compact_parquet's contract: rewrite to ceil(observed_bytes /
# target_bytes) files and change NOTHING else. File counts are made
# deterministic by construction — 64 explicit round-robin partitions in,
# and a target of observed//3 + 1 bytes, for which ceil(observed/t) = 3
# exactly (2t < observed <= 3t for any observed >= 6) regardless of what
# the codec did to the bytes. The oracle pins both counts as literals
# and recomputes the row count + XOR table fingerprint from raw orders:
# a match proves the rewrite changed layout and only layout.

_COMPACT_ORACLE = """
WITH base AS (
  SELECT o_orderkey AS k, o_orderstatus AS status,
         ROUND(o_totalprice, 2) AS price
  FROM orders WHERE o_orderkey % 4 = 1
)
SELECT COUNT(*)::BIGINT AS n_rows,
       bit_xor(('0x' || substr(md5(k::VARCHAR || '|' || status || '|' ||
                                   price::VARCHAR), 1, 15))::BIGINT)
         AS table_hash,
       64::BIGINT AS n_files_before,
       3::BIGINT AS n_files_after
FROM base
"""


@register(
    "q_compaction_audit",
    oracle=_COMPACT_ORACLE,
    doc="small-files compaction audit (E163, E17 promoted from "
    "tests-only): a 64-file orders slice compacted under a byte budget "
    "whose ceil arithmetic lands on exactly 3 files — post-compaction "
    "row count and XOR table fingerprint must match the oracle's "
    "from-raw rebuild (nothing lost, nothing duplicated, nothing "
    "mutated), file counts pinned as literals",
)
def q_compaction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.sinks.writers import compact_parquet

    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 4 == 1)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.round("o_totalprice", 2).alias("price"),
        )
    )
    scratch = warehouse_scratch(spark, "compact")
    path = f"{scratch}/store"
    try:
        base.repartition(64).write.parquet(path)
        files = [
            p
            for p in glob.glob(os.path.join(path, "part-*"))
            if os.path.isfile(p)
        ]
        observed = sum(os.path.getsize(p) for p in files)
        target = observed // 3 + 1  # ceil(observed/target) == 3
        n_before, n_after = compact_parquet(spark, path, target_bytes=target)
        back = spark.read.parquet(path)
        row_h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("k").cast("string"),
                        F.col("status"),
                        F.col("price").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        return (
            back.select(row_h.alias("h"))
            .agg(
                F.count("*").alias("n_rows"),
                F.expr("bit_xor(h)").alias("table_hash"),
                F.lit(int(n_before)).cast("long").alias("n_files_before"),
                F.lit(int(n_after)).cast("long").alias("n_files_after"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
