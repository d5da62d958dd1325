from dumpty_spark.operators import (
    bloom,
    dedup,
    diff,
    graph,
    joins,
    multimodal,
    packing,
    rownum,
    sampling,
    similarity,
    temporal,
    zorder,
)

__all__ = [
    "bloom",
    "dedup",
    "diff",
    "graph",
    "joins",
    "multimodal",
    "packing",
    "rownum",
    "sampling",
    "similarity",
    "temporal",
    "zorder",
]
