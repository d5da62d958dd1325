from dumpty_spark.sinks.writers import (
    advise_partitions,
    sink_size_bytes,
    write_empty_table,
    write_ndjson,
    write_parquet,
    write_schema_sidecar,
)

__all__ = [
    "advise_partitions",
    "sink_size_bytes",
    "write_empty_table",
    "write_ndjson",
    "write_parquet",
    "write_schema_sidecar",
]
