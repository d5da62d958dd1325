"""Round-8 engine extensions, sixteenth batch (EXT E229): the
approx-percentile accuracy ladder — the sketch-size knob report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E229: approx-percentile accuracy ladder
# ---------------------------------------------------------------------------
# Completes the knob-report family (E213 dedup threshold, E225 ANN
# nprobe): Spark's Greenwald-Khanna `approx_percentile(col, q, acc)`
# guarantees RANK error ≤ n/acc, and `acc` is the memory knob a
# deployment sizes the sketch with. The ladder runs acc = 100 / 1000 /
# 10000 for p50/p90/p99 in TWO scans total — one partial-agg scan
# computes all nine sketch answers at once, one more computes the nine
# EXACT ranks of those answers (conditional count ≤ value) — and hashes
# the guarantee booleans |rank(approx)/n − q| ≤ 1/acc. The oracle
# states the guarantee as constants; the booleans are measured, which
# is the same contract shape as every accuracy-contract query (E10).

_LADDER_ACCS = (100, 1000, 10000)
_LADDER_QS = (0.5, 0.9, 0.99)

_LADDER_ORACLE = f"""
SELECT acc::INT AS accuracy,
       (SELECT COUNT(*) FROM events)::BIGINT AS n_rows,
       TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
FROM (SELECT UNNEST([{", ".join(str(a) for a in _LADDER_ACCS)}]) AS acc)
ORDER BY acc
"""


@register(
    "q_quantile_accuracy_ladder",
    oracle=_LADDER_ORACLE,
    doc="approx-percentile accuracy ladder (E229): GK sketches at "
    "accuracy 100/1000/10000 for p50/p90/p99 in ONE partial-agg scan, "
    "exact ranks of all nine answers in ONE more — hashes the rank-"
    "error guarantee |rank/n - q| <= 1/acc per point; the sketch-"
    "memory knob report next to the dedup-threshold and nprobe curves",
)
def q_quantile_accuracy_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("value")

    aggs = []
    for acc in _LADDER_ACCS:
        for q in _LADDER_QS:
            aggs.append(
                F.expr(f"approx_percentile(value, {q}, {acc})").alias(
                    f"a_{acc}_{int(q * 100)}"
                )
            )
    approx = ev.agg(*aggs).first()

    # a returned value with duplicates occupies a RANK INTERVAL
    # [count(<v), count(<=v)] — the guarantee holds when that interval
    # intersects [q - 1/acc, q + 1/acc]
    rank_aggs = [F.count("*").alias("n")]
    for acc in _LADDER_ACCS:
        for q in _LADDER_QS:
            v = approx[f"a_{acc}_{int(q * 100)}"]
            tag = f"{acc}_{int(q * 100)}"
            rank_aggs.append(
                F.sum((F.col("value") <= F.lit(v)).cast("long")).alias(
                    f"le_{tag}"
                )
            )
            rank_aggs.append(
                F.sum((F.col("value") < F.lit(v)).cast("long")).alias(
                    f"lt_{tag}"
                )
            )
    ranks = ev.agg(*rank_aggs).first()
    n = ranks["n"]

    rows = []
    for acc in _LADDER_ACCS:
        oks = []
        for q in _LADDER_QS:
            tag = f"{acc}_{int(q * 100)}"
            lo, hi = ranks[f"lt_{tag}"] / n, ranks[f"le_{tag}"] / n
            oks.append(
                bool(lo <= q + 1.0 / acc + 1e-12
                     and hi >= q - 1.0 / acc - 1e-12)
            )
        rows.append((acc, n, *oks))
    return spark.createDataFrame(
        rows,
        "accuracy int, n_rows long, p50_ok boolean, p90_ok boolean, "
        "p99_ok boolean",
    ).orderBy("accuracy")
