"""JDBC scans (SURVEY §2.1 S1-S5) — the reference's extraction shapes,
parameterized by a PartitionPlan, plus the catalog and change-tracking
queries.

The full introspect → plan → scan → sink loop is exercised END-TO-END
against an embedded Apache Derby database (ships on the Spark classpath)
in tests/test_jdbc_e2e.py: live cursors, all three scan strategies, the
catalog list (S4), and the change-tracking query (S5). The option
surface mirrors the production knobs the reference pins: fetchsize
(config.yaml.example:52) and dirty-read isolation via
sessionInitStatement (config.yaml.example:45).
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


def _query_source(src: JdbcSource, sql: str) -> JdbcSource:
    """A JdbcSource whose dbtable is a derived-table subquery, so the SQL
    executes INSIDE the database and only its (tiny) result crosses the
    wire — how the reference pushes introspection to the source instead
    of pulling rows (pipeline.py:328-339)."""
    return JdbcSource(
        url=src.url,
        table=f"({sql}) dumpty_q",
        properties=src.properties,
        fetchsize=src.fetchsize,
        dirty_read=src.dirty_read,
    )


def run_query(spark: SparkSession, src: JdbcSource, sql: str) -> DataFrame:
    """Run ``sql`` on the source database through one JDBC cursor and
    return the result as a DataFrame (single partition — meant for
    metadata-sized results: counts, catalogs, change logs)."""
    from dumpty_spark.plans.planner import PartitionPlan

    return scan(spark, _query_source(src, sql), PartitionPlan(strategy="single"))


def introspect_jdbc(spark: SparkSession, src: JdbcSource, pk: str | None):
    """SURVEY A1 against a live source: COUNT/MIN/MAX pushed down as ONE
    SQL statement executed by the database (reference pipeline.py:328-339
    runs exactly this query server-side). Returns TableStats ready for
    ``plan_partitions``. Never pulls table rows through the wire."""
    from dumpty_spark.plans.planner import TableStats

    # positional access: databases fold unquoted aliases to their own
    # preferred case (Derby: upper), so names are not portable here.
    if pk is None:
        row = run_query(
            spark, src, f"SELECT COUNT(*) AS n_rows FROM {src.table}"
        ).collect()[0]
        return TableStats(rows=row[0])
    row = run_query(
        spark,
        src,
        f"SELECT COUNT(*) AS n_rows, MIN({pk}) AS mn, MAX({pk}) AS mx FROM {src.table}",
    ).collect()[0]
    df = run_query(spark, src, f"SELECT {pk} FROM {src.table} WHERE 1=0")
    from pyspark.sql import types as T

    # positional here too: the probe selects only the pk column, and the
    # database folds the unquoted identifier to its own case (Derby upper,
    # Postgres lower) so df.schema[pk] would KeyError on a non-folded name.
    numeric = isinstance(df.schema.fields[0].dataType, T.NumericType)
    return TableStats(
        rows=row[0], min=row[1], max=row[2], pk=pk, pk_numeric=numeric
    )


# S4: catalog/table-list scan. ANSI INFORMATION_SCHEMA by default (MSSQL,
# Postgres, MySQL...); Derby predates INFORMATION_SCHEMA and exposes the
# same facts through SYS.SYSTABLES.  Both templates take {schema}.
INFORMATION_SCHEMA_TABLES = (
    "SELECT table_name FROM INFORMATION_SCHEMA.TABLES "
    "WHERE table_schema = '{schema}' AND table_type = 'BASE TABLE'"
)
DERBY_TABLES = (
    "SELECT t.tablename AS table_name FROM SYS.SYSTABLES t "
    "JOIN SYS.SYSSCHEMAS s ON t.schemaid = s.schemaid "
    "WHERE s.schemaname = '{schema}' AND t.tabletype = 'T'"
)


def list_tables(
    spark: SparkSession,
    src: JdbcSource,
    schema: str,
    query: str = INFORMATION_SCHEMA_TABLES,
) -> list[str]:
    """S4: the reference's ``inspector.get_table_names(schema)``
    (pipeline.py:577) as a catalog query on the live connection. Returns
    lowercase table names, sorted, matching the reconcile path's
    case-insensitive contract (validate.reconcile_table_lists)."""
    df = run_query(spark, src, query.format(schema=schema))
    name_col = df.columns[0]
    return sorted(r[name_col].strip().lower() for r in df.collect())


# W1 boundary query templates ({pk}/{table}/{width}). ROW_NUMBER is the
# reference's exact SQL (runs on MSSQL/Postgres/MySQL 8); Derby's window
# support has no ORDER BY clause, so its template ranks with a SQL-92
# correlated count — identical result, O(n^2) server-side, test-scale
# only.
ROWNUM_JULIENNE = (
    "SELECT DISTINCT {pk} AS b FROM ("
    "SELECT {pk}, ROW_NUMBER() OVER (ORDER BY {pk}) AS rn "
    "FROM {table}) t WHERE MOD(rn, {width}) = 0"
)
DERBY_JULIENNE = (
    "SELECT DISTINCT {pk} AS b FROM ("
    "SELECT {pk}, (SELECT COUNT(*) FROM {table} t2 "
    "WHERE t2.{pk} <= t1.{pk}) AS rn "
    "FROM {table} t1 WHERE {pk} IS NOT NULL) t WHERE MOD(rn, {width}) = 0"
)


def julienne_boundaries_jdbc(
    spark: SparkSession,
    src: JdbcSource,
    pk: str,
    width: int,
    query: str = ROWNUM_JULIENNE,
) -> list:
    """W1 server-side: the reference's exact equal-frequency boundary
    query (every ``width``-th pk value by global row rank,
    pipeline.py:236-267) executed ON the source database, where its
    engine owns the sort — only the boundary list (partitions-sized)
    crosses the wire. Semantics identical to
    planner.exact_julienne_boundaries on a DataFrame; at Spark-side
    scale use planner.approx_boundaries instead."""
    df = run_query(
        spark, src, query.format(pk=pk, table=src.table, width=width)
    )
    col = df.columns[0]
    return sorted(r[col] for r in df.collect())


def changed_tables_jdbc(
    spark: SparkSession,
    src: JdbcSource,
    query_template: str,
    watermark: str,
) -> list[str]:
    """S5: the reference's change-tracking incremental source — a
    user-supplied change-log query with the last successful watermark
    substituted (main.py:224-233 renders ``tables_query`` with
    ``last_run``). The query must return one column of table names; the
    result feeds validate.select_incremental exactly like the filesystem
    mtime variant in cli.changed_tables."""
    df = run_query(spark, src, query_template.format(watermark=watermark))
    name_col = df.columns[0]
    return sorted(r[name_col].strip().lower() for r in df.collect())
