"""dumpty_spark — a PySpark-native analytics/ELT engine.

A from-scratch re-expression of the capabilities of stanfordmed/dumpty
(reference surveyed in SURVEY.md) on idiomatic Spark: declarative
DataFrame/SQL plans optimized by Catalyst, with small pure-Python
planning modules for the decisions the reference hand-rolled
(partition planning, type mapping, state, validation), plus the
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal columns) the reference never had.

Layout:
    session      — SparkSession builder with pinned, scale-aware confs
    plans        — partition planner, introspection stats, cross-run state
    sources      — parquet/JDBC scans (SURVEY §2.1 S1-S5)
    sinks        — NDJSON/parquet sinks with sizing feedback (K1-K5, X6)
    functions    — scalar/text/vector column functions (§2.6 + EXT)
    operators    — relational + dedup + similarity + multimodal ops
    streaming    — Structured Streaming surfaces on the events table
    queries      — the t2 oracle-checked query registry
"""

__version__ = "0.1.0"
