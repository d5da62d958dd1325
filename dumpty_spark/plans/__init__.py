from dumpty_spark.plans.planner import (
    PartitionPlan,
    TableStats,
    exact_julienne_boundaries,
    introspect_stats,
    plan_partitions,
    predicates_from_boundaries,
    slice_predicates_as_columns,
)
from dumpty_spark.plans.types import (
    map_source_type,
    normalize_df,
    normalize_str,
    spark_schema_to_bq,
)

__all__ = [
    "PartitionPlan",
    "TableStats",
    "exact_julienne_boundaries",
    "introspect_stats",
    "plan_partitions",
    "predicates_from_boundaries",
    "slice_predicates_as_columns",
    "map_source_type",
    "normalize_df",
    "normalize_str",
    "spark_schema_to_bq",
]
