"""Local mirror of the driver's t2 comparison: run a registered Spark query
and its DuckDB oracle on the same parquet, canonicalize (sort columns by
name, sort rows), and compare values exactly.

Exact comparison is deliberate — the driver hashes values, so a float that
differs in the last bit FAILS there too. Queries must round on both sides.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from dumpty_spark.sources.parquet import TABLES


def run_duckdb(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.sql(sql).df()
    finally:
        con.close()


def _canon_value(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # keep the float/int distinction visible: 7949.0 must NOT equal
        # 7949 here (the driver hashes typed values, so it wouldn't there)
        return f"f:{v!r}"
    if hasattr(v, "item"):  # numpy scalar
        return _canon_value(v.item())
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    return v


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_value(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows, key=repr)


def compare(spark_df, oracle_pd: pd.DataFrame) -> tuple[bool, str]:
    spark_pd = spark_df.toPandas()
    if sorted(spark_pd.columns) != sorted(oracle_pd.columns):
        return False, f"schema mismatch: spark={sorted(spark_pd.columns)} oracle={sorted(oracle_pd.columns)}"
    if len(spark_pd) != len(oracle_pd):
        return False, f"row count mismatch: spark={len(spark_pd)} oracle={len(oracle_pd)}"
    a, b = canon_rows(spark_pd), canon_rows(oracle_pd)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, "ok"
