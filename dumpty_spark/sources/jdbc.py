"""JDBC scans (SURVEY §2.1 S1-S3) — the reference's three extraction
shapes, parameterized by a PartitionPlan.

No database exists in this container, so these are exercised by option-
construction tests plus the shared plan-application path (the parquet
fixtures drive the same PartitionPlan through typed Column slices in
tests/test_planner.py). The option surface mirrors the production knobs
the reference pins: fetchsize (config.yaml.example:52) and dirty-read
isolation via sessionInitStatement (config.yaml.example:45).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from dumpty_spark.plans.planner import PartitionPlan

DEFAULT_FETCHSIZE = 2000  # reference config.yaml.example:52


@dataclass
class JdbcSource:
    url: str
    table: str
    properties: dict[str, str] = field(default_factory=dict)
    fetchsize: int = DEFAULT_FETCHSIZE
    dirty_read: bool = True

    def options(self) -> dict[str, Any]:
        opts: dict[str, Any] = {
            "url": self.url,
            "dbtable": self.table,
            "fetchsize": str(self.fetchsize),
            **self.properties,
        }
        if self.dirty_read:
            # don't lock the source: READ UNCOMMITTED, like the reference
            opts["sessionInitStatement"] = (
                "SET TRANSACTION ISOLATION LEVEL READ UNCOMMITTED"
            )
        return opts


def scan_options(src: JdbcSource, plan: PartitionPlan) -> dict[str, Any]:
    """Resolve a PartitionPlan into spark.read.format('jdbc') options:
    bounds → partitionColumn/lowerBound/upperBound/numPartitions (S1);
    single → plain scan (S3). The predicates path (S2) must go through
    ``scan`` (the predicates list isn't an option string)."""
    opts = src.options()
    if plan.strategy == "bounds":
        opts.update(
            partitionColumn=plan.column,
            lowerBound=str(plan.lower),
            upperBound=str(plan.upper),
            numPartitions=str(plan.partitions),
        )
    return opts


def scan(spark: SparkSession, src: JdbcSource, plan: PartitionPlan) -> DataFrame:
    """Execute the planned scan. One Spark task per range/predicate, each
    opening its own JDBC cursor — the reference's parallel extract
    (pipeline.py:424-459) expressed through the identical public API."""
    if plan.strategy == "predicates":
        return spark.read.jdbc(
            url=src.url,
            table=src.table,
            predicates=plan.predicates,
            properties={k: str(v) for k, v in src.options().items() if k not in ("url", "dbtable")},
        )
    reader = spark.read.format("jdbc")
    for k, v in scan_options(src, plan).items():
        reader = reader.option(k, v)
    return reader.load()
