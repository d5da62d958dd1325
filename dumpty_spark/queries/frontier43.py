"""Round-9 engine extensions (EXT E231): Cohen's kappa inter-rater
agreement — the one statistics-family operator the r1-r8 surface did
not already cover (CUSUM, Mann-Whitney, BH-FDR, KS, PSI, chi-square,
MAD census, skyline and mutual information all ship since earlier
rounds: q_cusum_alarm/q_changepoint, q_mannwhitney_drift,
q_fdr_weekday, q_ks_twosample, q_psi_value_drift,
q_chi2_independence, q_mad_outliers, q_pareto_frontier,
q_mutual_information).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E231: Cohen's kappa inter-rater agreement
# ---------------------------------------------------------------------------
# Label-QA primitive for any annotation pipeline: chance-corrected
# agreement between two raters, kappa = (p_o - p_e) / (1 - p_e)
# (Cohen 1960). The raters here are two deterministic quality rules
# over documents (the E4'' filter family): R1 = "long enough"
# (n_chars above the corpus median), R2 = "lexically dense"
# (distinct-word ratio above 0.5). One scan to the 2x2 contingency
# (four BIGINTs), kappa a closed form of exact integers — the operator
# IS the contingency builder; any real rater pair (two model versions,
# annotator vs heuristic) drops into the same plan. At 100 TB: one
# partial-agg scan, a 1-row result.

_KAPPA_ORACLE = """
WITH med AS (SELECT quantile_cont(n_chars, 0.5) AS m FROM documents),
lab AS (
  SELECT COALESCE(d.n_chars > med.m, FALSE)::INT AS r1,
         COALESCE(LENGTH(TRIM(d.text)) > 0 AND
          CAST(LENGTH(list_distinct(list_filter(
              string_split_regex(lower(d.text), '[^a-z0-9]+'),
              x -> x != ''))) AS DOUBLE)
          / GREATEST(LENGTH(list_filter(
              string_split_regex(lower(d.text), '[^a-z0-9]+'),
              x -> x != '')), 1) > 0.5, FALSE)::INT AS r2
  FROM documents d, med
),
ct AS (
  SELECT COUNT(*)::BIGINT AS n,
         SUM((r1 = 1 AND r2 = 1)::INT)::BIGINT AS a,
         SUM((r1 = 1 AND r2 = 0)::INT)::BIGINT AS b,
         SUM((r1 = 0 AND r2 = 1)::INT)::BIGINT AS c,
         SUM((r1 = 0 AND r2 = 0)::INT)::BIGINT AS d
  FROM lab
)
SELECT n, a, b, c, d,
       ROUND((a + d) / CAST(n AS DOUBLE), 6) AS p_observed,
       ROUND(((a + b) * (a + c) + (c + d) * (b + d))
             / CAST(n AS DOUBLE) / n, 6) AS p_expected,
       ROUND(((a + d) / CAST(n AS DOUBLE)
              - ((a + b) * (a + c) + (c + d) * (b + d))
                / CAST(n AS DOUBLE) / n)
             / (1 - ((a + b) * (a + c) + (c + d) * (b + d))
                    / CAST(n AS DOUBLE) / n), 6) AS kappa
FROM ct
"""


@register(
    "q_cohens_kappa",
    oracle=_KAPPA_ORACLE,
    doc="Cohen's kappa inter-rater agreement (E231): two deterministic "
    "document quality raters (length above corpus median; distinct-word "
    "ratio > 0.5) reduced to one 2x2 integer contingency in one scan, "
    "kappa = (p_o - p_e)/(1 - p_e) as a closed form of four BIGINTs — "
    "the annotation-QA primitive",
)
def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    med = docs.agg(F.expr("percentile(n_chars, 0.5)").alias("m"))
    wordsarr = F.filter(
        F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != ""
    )
    lab = docs.crossJoin(F.broadcast(med)).select(
        F.coalesce(F.col("n_chars") > F.col("m"), F.lit(False))
        .cast("int")
        .alias("r1"),
        F.coalesce(
            (F.length(F.trim("text")) > 0)
            & (
                F.size(F.array_distinct(wordsarr)).cast("double")
                / F.greatest(F.size(wordsarr), F.lit(1))
                > 0.5
            ),
            F.lit(False),
        )
        .cast("int")
        .alias("r2"),
    )
    ct = lab.agg(
        F.count("*").alias("n"),
        F.sum(((F.col("r1") == 1) & (F.col("r2") == 1)).cast("int"))
        .cast("long")
        .alias("a"),
        F.sum(((F.col("r1") == 1) & (F.col("r2") == 0)).cast("int"))
        .cast("long")
        .alias("b"),
        F.sum(((F.col("r1") == 0) & (F.col("r2") == 1)).cast("int"))
        .cast("long")
        .alias("c"),
        F.sum(((F.col("r1") == 0) & (F.col("r2") == 0)).cast("int"))
        .cast("long")
        .alias("d"),
    )
    po = (F.col("a") + F.col("d")) / F.col("n").cast("double")
    pe = (
        (F.col("a") + F.col("b")) * (F.col("a") + F.col("c"))
        + (F.col("c") + F.col("d")) * (F.col("b") + F.col("d"))
    ) / F.col("n").cast("double") / F.col("n")
    return ct.select(
        "n",
        "a",
        "b",
        "c",
        "d",
        F.round(po, 6).alias("p_observed"),
        F.round(pe, 6).alias("p_expected"),
        F.round((po - pe) / (1 - pe), 6).alias("kappa"),
    )
