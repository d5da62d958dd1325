"""Pure-Column Bloom filter for join prefiltering.

The 100 TB problem this solves: a semi join of a huge fact against a
selective dim shuffles the ENTIRE fact before the join drops 99% of it.
A Bloom filter built from the dim's keys and evaluated map-side on the
fact removes almost all non-matching rows BEFORE the exchange, so the
shuffle carries only (matches + epsilon false positives). The exact join
that follows makes the result provably identical to the plain join —
the filter is a transparent physical optimization, which is why the
DuckDB oracle for queries using it is just the plain join.

Everything is JVM-side Column arithmetic — no UDF, no py4j sketch
objects that can't be serialized to executors:

- k hash functions = ``xxhash64(key, seed=i)`` for i in 0..k-1, reduced
  mod m bits.
- build: explode the k bucket ids per dim row, aggregate ``bit_or(1 <<
  (bucket % 64))`` per 64-bit word — a tiny shuffle of at most
  n_dim_rows * k rows into m/64 groups — and collect the words to the
  driver (m = 2^16 bits -> 1 KiB of longs).
- probe: the word array is inlined as a foldable literal (Catalyst
  constant-folds CreateArray-of-literals to a single array literal), and
  each probe row tests ``bit_get(element_at(words, bucket/64 + 1),
  bucket%64)`` for all k hashes. Per-row cost: k hashes + k array loads.

The reference has no analog — it never joins (SURVEY §2.5); this is the
scale pattern its BigQuery backend would apply as a runtime semi-join
filter. Spark's own runtime row-level filtering does this for some plans
(spark.sql.optimizer.runtime.bloomFilter.enabled), but only when the
planner detects the shape; this operator makes it explicit and portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_M_BITS = 1 << 16
DEFAULT_K = 5


def _buckets(key: Column, m_bits: int, k: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)
    ]


def bloom_build(df: DataFrame, key: str, m_bits: int = DEFAULT_M_BITS,
                k: int = DEFAULT_K) -> list[int]:
    """Aggregate the build side's k bucket ids into a bitmap of
    ``m_bits / 64`` longs, collected to the driver (1 KiB at the default
    m). One narrow shuffle of n*k rows into m/64 groups."""
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    rows = (
        df.select(F.explode(F.array(*_buckets(F.col(key), m_bits, k))).alias("bkt"))
        .groupBy(F.floor(F.col("bkt") / 64).cast("int").alias("word"))
        .agg(
            # Python-API shiftleft only takes a literal shift; the SQL
            # function accepts a column
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bkt % 64 AS INT))")
            ).alias("bits")
        )
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r["word"]] = r["bits"]
    return words


def bloom_might_contain(key: Column, words: list[int], m_bits: int = DEFAULT_M_BITS,
                        k: int = DEFAULT_K) -> Column:
    """Membership predicate: all k bits set. ``words`` is inlined as a
    foldable literal array, so executors never see a broadcast object —
    the bitmap rides inside the serialized plan."""
    # F.lit(list) emits a single array Literal — unlike
    # CreateArray(1024 literals), nothing to evaluate per row even
    # before constant folding
    arr = F.lit([int(w) for w in words])
    pred = F.lit(True)
    for bkt in _buckets(key, m_bits, k):
        word = F.element_at(arr, F.floor(bkt / 64).cast("int") + F.lit(1))
        pred = pred & (F.bit_get(word, (bkt % 64).cast("int")) == 1)
    return pred


def file_bloom_index_build(
    spark,
    data_path: str,
    key_col: str,
    index_dir: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> int:
    """Per-FILE Bloom skipping index at rest (EXT E48) — the needle-in-
    haystack complement to footer min-max skipping. Min-max prunes files
    only when the key is clustered (z-order/range); a point lookup on an
    UNCLUSTERED high-cardinality column still scans every file. This
    index stores, per data file, a Bloom bitmap of its key values
    (Delta's bloom-filter index shape, public design); a lookup consults
    sidecar rows only and reads just the files that might contain the
    key — no false negatives, so results are provably identical to the
    full scan.

    One corpus pass builds it: explode k buckets per row, aggregate
    ``bit_or`` per (file, word) — the index is (files × set words) rows,
    written as parquet next to the data (never collected). Returns the
    number of files indexed."""
    import json
    import os

    rows = (
        spark.read.parquet(data_path)
        .select(
            F.input_file_name().alias("file"),
            F.explode(F.array(*_buckets(F.col(key_col), m_bits, k))).alias("bkt"),
        )
        .groupBy(
            "file", F.floor(F.col("bkt") / 64).cast("int").alias("word")
        )
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bkt % 64 AS INT))")
            ).alias("bits")
        )
    )
    rows.write.mode("overwrite").parquet(os.path.join(index_dir, "blooms"))
    n_files = spark.read.parquet(os.path.join(index_dir, "blooms")).select(
        "file"
    ).distinct().count()
    # pin the key's NATIVE type: xxhash64 is type-sensitive (int 7 and
    # bigint 7 hash differently), so probes must hash with the exact
    # type the index was built from or every lookup false-negatives
    key_type = spark.read.parquet(data_path).schema[key_col].dataType.simpleString()
    with open(os.path.join(index_dir, "meta.json"), "w") as fh:
        json.dump(
            {"m_bits": m_bits, "k": k, "key_col": key_col, "key_type": key_type},
            fh,
        )
    return n_files


def file_bloom_candidate_files(
    spark, index_dir: str, keys: list
) -> list[str]:
    """Files that MIGHT contain any of ``keys``: compute the probe
    buckets with the same JVM xxhash64 (a keys-sized local frame), pull
    only the index rows for those words (k×|keys|×files max), and test
    all-k-bits per (file, key) driver-side."""
    import json
    import os

    with open(os.path.join(index_dir, "meta.json")) as fh:
        meta = json.load(fh)
    m_bits, k = meta["m_bits"], meta["k"]
    key_type = meta.get("key_type", "long")
    probe = spark.createDataFrame([(x,) for x in keys], f"k {key_type}").select(
        "k", *[b.alias(f"b{i}") for i, b in enumerate(_buckets(F.col("k"), m_bits, k))]
    )
    probes = [
        [int(r[f"b{i}"]) for i in range(k)] for r in probe.collect()
    ]
    words_needed = sorted({b // 64 for bs in probes for b in bs})
    idx = (
        spark.read.parquet(os.path.join(index_dir, "blooms"))
        .filter(F.col("word").isin(words_needed))
        .collect()
    )
    by_file: dict[str, dict[int, int]] = {}
    for r in idx:
        by_file.setdefault(r["file"], {})[r["word"]] = r["bits"]
    out = []
    for f, words in by_file.items():
        for bs in probes:
            if all(words.get(b // 64, 0) >> (b % 64) & 1 for b in bs):
                out.append(f)
                break
    return sorted(out)


def file_bloom_lookup(
    spark, data_path: str, index_dir: str, key_col: str, keys: list
) -> DataFrame:
    """Point lookup through the skipping index: read ONLY candidate
    files, exact-filter to kill false positives. Empty candidate set →
    empty frame with the store's schema."""
    cand = file_bloom_candidate_files(spark, index_dir, keys)
    if not cand:
        return spark.read.parquet(data_path).filter(F.lit(False))
    return spark.read.parquet(*cand).filter(F.col(key_col).isin(keys))


def bloom_prefilter_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Semi join with a Bloom prefilter on the fact side.

    Result rows are EXACTLY ``fact`` semi-joined to ``dim`` (the bloom
    admits false positives; the semi join removes them, and a Bloom
    filter has no false negatives). The prefilter is evaluated map-side
    before any exchange, so at scale the shuffled fact volume shrinks to
    ~selectivity * |fact|."""
    words = bloom_build(dim, dim_key, m_bits, k)
    pre = fact.filter(bloom_might_contain(F.col(fact_key), words, m_bits, k))
    return pre.join(
        dim.select(F.col(dim_key).alias("__bk")).distinct(),
        pre[fact_key] == F.col("__bk"),
        "left_semi",
    )
