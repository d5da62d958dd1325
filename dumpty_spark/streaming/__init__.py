from dumpty_spark.streaming.windows import (
    read_events_stream,
    run_to_memory,
    session_agg,
    sliding_agg,
    tumbling_agg,
    watermark_dedup,
)

__all__ = [
    "read_events_stream",
    "run_to_memory",
    "session_agg",
    "sliding_agg",
    "tumbling_agg",
    "watermark_dedup",
]
