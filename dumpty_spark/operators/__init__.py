from dumpty_spark.operators import (
    dedup,
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
    "dedup",
    "joins",
    "multimodal",
    "packing",
    "rownum",
    "sampling",
    "similarity",
    "temporal",
    "zorder",
]
