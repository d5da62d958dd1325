"""Vector column functions (EXT E3/E5) — built-in higher-order functions,
no UDFs: ``zip_with`` + ``aggregate`` compile to codegen'd loops over the
array, so cosine similarity runs JVM-side at scan speed.

The left-to-right fold order of ``aggregate`` is deterministic, which is
what makes the DuckDB oracle (list_cosine_similarity, same order)
hash-stable after 4dp rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def normalize(a: Column) -> Column:
    """Unit-normalize, so Euclidean LSH bucketing approximates cosine ANN:
    ||u-v||² = 2-2cos(u,v) for unit vectors."""
    n = norm(a)
    return F.transform(a, lambda x: x / n)
