"""Round-8 engine extensions, fifth batch (EXT E203): the banded-LSH
parameter planner — the design-time cost model of the E2b MinHash
pipeline, with the candidate-volume trade empirically verified on the
live corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E203: LSH parameter planner
# ---------------------------------------------------------------------------
# Choosing (bands, rows) for a MinHash deployment IS the dedup cost
# model: capture probability at similarity s is 1-(1-s^r)^b — more
# bands buy recall at the near-dup threshold but leak low-similarity
# candidate pairs, and candidate volume is the shuffle you pay at
# 100 TB. The planner enumerates every (b, r) split of the 32-hash
# sketch, scores capture at the target (s=0.8) and the noise floor
# (s=0.5), and picks the config with the LOWEST noise capture among
# those with target capture >= 0.95 — which derives the shipped E2b
# default (8 bands x 4 rows) from first principles. The trade is then
# verified empirically: exact bucket-join candidate counts on the live
# corpus for the chosen config and the next-richer one (16 bands),
# whose extra candidates buy ~nothing (capture 0.985 -> ~1.0) — both
# banding passes share ONE signature frame. POWER closed forms are
# single expressions (6dp); counts are exact integers.

_LSH_N_HASHES = 32
_LSH_TARGET_S = 0.8
_LSH_NOISE_S = 0.5
_LSH_TARGET_FLOOR = 0.95
_LSH_SPLITS = [1, 2, 4, 8, 16, 32]


def _capture(s: float, b: int) -> float:
    r = _LSH_N_HASHES // b
    return 1.0 - (1.0 - s**r) ** b


def _chosen_bands() -> int:
    feasible = [b for b in _LSH_SPLITS
                if _capture(_LSH_TARGET_S, b) >= _LSH_TARGET_FLOOR]
    return min(feasible, key=lambda b: _capture(_LSH_NOISE_S, b))


def _measured_bands() -> list[int]:
    chosen = _chosen_bands()
    richer = [b for b in _LSH_SPLITS if b > chosen]
    return [chosen, min(richer)] if richer else [chosen]


def _cand_count_sql(bands: int) -> str:
    """Scalar subquery: exact candidate count of the md5 MinHash
    banding at ``bands`` — the E2b oracle front-end with the verify
    tail dropped."""
    from dumpty_spark.operators.dedup import MINHASH_P, minhash_params

    rpb = _LSH_N_HASHES // bands
    params = minhash_params(_LSH_N_HASHES)
    mins = ", ".join(
        f"MIN(({a} * hb + {b}) % {MINHASH_P}) AS h{i}"
        for i, (a, b) in enumerate(params)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT id, {b} AS band_idx, md5("
        + " || '|' || ".join(f"h{b * rpb + r}::VARCHAR" for r in range(rpb))
        + ") AS band_hash FROM sig"
        for b in range(bands)
    )
    words = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')"
    return f"""(
  WITH words AS (SELECT doc_id AS id, {words} AS w FROM documents),
  sh AS (
    SELECT DISTINCT id, array_to_string(w[p:p+2], ' ') AS shingle
    FROM words, UNNEST(generate_series(1, GREATEST(len(w)-2, 0))) AS t(p)
    WHERE len(w) >= 3
  ),
  hx AS (
    SELECT id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {MINHASH_P} AS hb
    FROM sh
  ),
  sig AS (SELECT id, {mins} FROM hx GROUP BY id),
  bands AS ({band_rows})
  SELECT COUNT(*)::BIGINT FROM (
    SELECT DISTINCT x.id, y.id
    FROM bands x JOIN bands y
      ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
     AND x.id < y.id
  )
)"""


def _planner_oracle() -> str:
    chosen = _chosen_bands()
    measured = _measured_bands()
    rows = []
    for b in _LSH_SPLITS:
        r = _LSH_N_HASHES // b
        cand = (
            f"{_cand_count_sql(b)}" if b in measured else "NULL::BIGINT"
        )
        rows.append(
            f"SELECT {b}::BIGINT AS bands, {r}::BIGINT AS rows_per_band, "
            f"ROUND(1 - POWER(1 - POWER({_LSH_TARGET_S}, {r}), {b}), 6)"
            f" AS capture_at_target, "
            f"ROUND(1 - POWER(1 - POWER({_LSH_NOISE_S}, {r}), {b}), 6)"
            f" AS capture_at_noise, "
            f"{'TRUE' if b == chosen else 'FALSE'} AS chosen, "
            f"{cand} AS candidates"
        )
    return "\nUNION ALL\n".join(rows) + "\nORDER BY bands"


@register(
    "q_lsh_param_planner",
    oracle=_planner_oracle(),
    doc="banded-LSH parameter planner (E203): capture probability "
    "1-(1-s^r)^b for every (b, r) split of the 32-hash sketch at the "
    "0.8 target and 0.5 noise floor; chosen = lowest noise capture "
    "subject to target capture >= 0.95 — derives the shipped E2b "
    "8x4 default from first principles; the candidate-volume trade is "
    "verified with exact bucket-join counts for the chosen and "
    "next-richer configs over ONE shared signature frame (the shuffle "
    "cost the planner exists to bound at 100 TB)",
)
def q_lsh_param_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    sig = D.minhash_signatures(
        docs, "doc_id", "text", _LSH_N_HASHES, 3
    ).localCheckpoint()

    def cand_count(bands: int) -> int:
        banded = sig.select(
            "id",
            F.posexplode(
                D.minhash_band_hashes(F.col("sig"), _LSH_N_HASHES, bands)
            ).alias("band_idx", "band_hash"),
        )
        return (
            banded.alias("x")
            .join(banded.alias("y"), ["band_idx", "band_hash"])
            .filter(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
            .distinct()
            .count()
        )

    chosen = _chosen_bands()
    # the measured band counts are independent joins over the one
    # checkpointed signature frame — overlap them on driver threads
    # (the q_ann_recall_check discipline); each count is unchanged
    from dumpty_spark.operators.util import run_overlapped

    mb = _measured_bands()
    measured = dict(
        zip(mb, run_overlapped(spark, [(lambda b=b: cand_count(b)) for b in mb]))
    )
    rows = []
    for b in _LSH_SPLITS:
        r = _LSH_N_HASHES // b
        rows.append(
            (
                b, r,
                round(_capture(_LSH_TARGET_S, b), 6),
                round(_capture(_LSH_NOISE_S, b), 6),
                b == chosen,
                measured.get(b),
            )
        )
    return spark.createDataFrame(
        rows,
        "bands long, rows_per_band long, capture_at_target double, "
        "capture_at_noise double, chosen boolean, candidates long",
    ).orderBy("bands")
