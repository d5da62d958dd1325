"""UDF-surface t2 queries (SURVEY §2.8): scalar pandas UDF, grouped-agg
pandas UDF (UDAF), and a Python UDTF — each against a plain-SQL oracle.

The reference has ZERO custom functions (its one GenericFunction,
count_big, compiles server-side — src/dumpty/util.py:25-52); this is the
DELEG surface. Hot-path guidance stands: built-ins first, Arrow-batched
pandas UDFs when Python is unavoidable, row-based UDTFs only for 1→N
shapes built-ins can't express.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from dumpty_spark.queries import register
from dumpty_spark.sources import load_table

_SCALAR_ORACLE = """
SELECT o_orderpriority,
       ROUND(AVG(LN(1 + o_totalprice)), 4) AS avg_log_price,
       COUNT(*) AS n
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "q_pandas_scalar_udf",
    oracle=_SCALAR_ORACLE,
    doc="vectorized scalar pandas UDF (Arrow batches, numpy kernel) — "
    "log1p feature column, aggregated against a plain-SQL oracle",
)
def q_pandas_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    @pandas_udf("double")
    def log1p_price(s: pd.Series) -> pd.Series:
        return pd.Series(np.log1p(s.to_numpy()))

    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn("lp", log1p_price("o_totalprice"))
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.avg("lp"), 4).alias("avg_log_price"),
            F.count("*").alias("n"),
        )
        .orderBy("o_orderpriority")
    )


_GEOMEAN_ORACLE = """
SELECT l_returnflag,
       ROUND(EXP(AVG(LN(l_extendedprice))), 2) AS geo_mean_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register(
    "q_pandas_grouped_agg",
    oracle=_GEOMEAN_ORACLE,
    doc="grouped-agg pandas UDF (UDAF): geometric mean per group — "
    "partial-aggregation-free custom aggregate, SQL oracle EXP(AVG(LN))",
)
def q_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    @pandas_udf("double")
    def geo_mean(s: pd.Series) -> float:
        return float(np.exp(np.mean(np.log(s.to_numpy()))))

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(geo_mean("l_extendedprice"), 2).alias("geo_mean_price"))
        .orderBy("l_returnflag")
    )


_UDTF_ORACLE = """
SELECT t.word, COUNT(*) AS n
FROM documents d,
     UNNEST(list_filter(string_split_regex(lower(d.text), '[^a-z0-9]+'),
                        x -> len(x) >= 8)) AS t(word)
WHERE d.doc_id < 100
GROUP BY t.word
ORDER BY n DESC, t.word
LIMIT 20
"""


@register(
    "q_udtf_long_words",
    oracle=_UDTF_ORACLE,
    doc="Python UDTF (1→N table function) exploding words of 8+ chars per doc, "
    "lateral-joined — top-20 by frequency vs an UNNEST oracle",
)
def q_udtf_long_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re

    from pyspark.sql.functions import udtf

    # useArrow: UDTF rows cross Python in Arrow batches, not pickled
    # one-at-a-time (the plan guard in test_plans.py bans BatchEvalPython
    # everywhere, including here)
    @udtf(returnType="word: string", useArrow=True)
    class LongWords:
        def eval(self, text: str):
            if text:
                for w in re.split(r"[^a-z0-9]+", text.lower()):
                    if len(w) >= 8:
                        yield (w,)

    spark.udtf.register("long_words", LongWords)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    docs.createOrReplaceTempView("docs_udtf")
    return spark.sql(
        """
        SELECT t.word, COUNT(*) AS n
        FROM docs_udtf, LATERAL long_words(text) t
        GROUP BY t.word
        ORDER BY n DESC, t.word
        LIMIT 20
        """
    )
