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

# ---------------------------------------------------------------------------
# Allocator pinning (OPTIMIZATION_r11 §1 — guide §5, memory):
# numpy >= 1.17 madvises MADV_HUGEPAGE on every allocation over ~4 MB.
# On hosts where transparent-huge-page faults are serviced slowly
# (virtualized/lazy-paged guests with `defrag=madvise`: each 2 MB fault
# can stall hundreds of ms in synchronous compaction), that turns every
# FIRST touch of a large numpy array — toPandas() conversion buffers,
# the driver-regime graph mat-vecs, pandas-UDF batches in the Python
# workers — into seconds of kernel time. Measured here: np.full(38 MB)
# first-touch 7.9s with the madvise, 0.02s without; a 2M-row
# toPandas() 13.7s -> 1.4s. Plain 4 KB faults on this class of host are
# normal (~2.5 us), so disabling the madvise costs nothing when THP is
# healthy and removes a 100-400x stall when it is not.
#
# Must be set BEFORE numpy's first import anywhere in the process —
# importing dumpty_spark (which every entry point does first) is that
# point. setdefault: an operator who wants huge pages back can export
# NUMPY_MADVISE_HUGEPAGE=1. The env propagates to local-mode Python
# workers through the JVM's inherited environment, so Arrow/pandas UDF
# batches on the executor side are covered by the same pin.
import os as _os

_os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
