"""A custom PySpark DataSource for the engine's own interchange format:
gzipped NDJSON part-files + the K2 `_schema.json` BigQuery sidecar
(reference pipeline.py:466-467 + :525-533 — its GCS landing format).

``spark.read.format("dumpty_ndjson").load(path)`` reads a sink directory
back with the SIDEBAR SCHEMA AS AUTHORITY — no sampling, no inference:
the BigQuery JSON schema is inverse-mapped to Spark types and the pinned
``yyyy-MM-dd HH:mm:ss`` timestamp format (writers.TIMESTAMP_FORMAT) is
parsed exactly. One InputPartition per part-file, so the read
parallelizes across files like any splittable source.

Scale note: this reader parses JSON in Python (Arrow-batched by the
DataSource API, but still the slow path). Its value is semantic — the
sidecar-authoritative schema and timestamp contract; for bulk re-reads
use ``spark.read.schema(sidecar_schema(path)).json(...)`` which keeps
parsing in the JVM. Both paths are asserted equal in
tests/test_ndjson_source.py.
"""

from __future__ import annotations

import base64
import datetime as _dt
import glob
import gzip
import json
import os

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from dumpty_spark.sinks.writers import TIMESTAMP_FORMAT  # noqa: F401  (contract)

_PY_TS_FORMAT = "%Y-%m-%d %H:%M:%S"  # TIMESTAMP_FORMAT in strptime form

# inverse of plans.types._SPARK_TO_BQ for the scalar lattice. NUMERIC /
# BIGNUMERIC sidecars drop (p, s), so the inverse defaults to the widest
# lossless Spark decimal for each class — documented narrowing.
_BQ_TO_SPARK: dict[str, T.DataType] = {
    "INT64": T.LongType(),
    "FLOAT64": T.DoubleType(),
    "STRING": T.StringType(),
    "BOOL": T.BooleanType(),
    "DATETIME": T.TimestampNTZType(),
    "DATE": T.DateType(),
    "BYTES": T.BinaryType(),
    "NUMERIC": T.DecimalType(38, 9),
    "BIGNUMERIC": T.DecimalType(38, 18),
}


def sidecar_schema(path: str) -> T.StructType:
    """Parse the K2 `_schema.json` sidecar into a Spark StructType —
    shared by the custom source and the JVM-json fast path."""
    with open(os.path.join(path, "_schema.json")) as fh:
        fields = json.load(fh)
    out = []
    for f in fields:
        base = _BQ_TO_SPARK.get(f["type"], T.StringType())
        dt: T.DataType = (
            T.ArrayType(base) if f.get("mode") == "REPEATED" else base
        )
        out.append(T.StructField(f["name"], dt, f.get("mode") != "REQUIRED"))
    return T.StructType(out)


def _convert(value, dt: T.DataType):
    if value is None:
        return None
    if isinstance(dt, T.ArrayType):
        return [_convert(v, dt.elementType) for v in value]
    if isinstance(dt, (T.TimestampNTZType, T.TimestampType)):
        return _dt.datetime.strptime(value, _PY_TS_FORMAT)
    if isinstance(dt, T.DateType):
        return _dt.date.fromisoformat(value)
    if isinstance(dt, T.BinaryType):
        return base64.b64decode(value)
    if isinstance(dt, T.DecimalType):
        from decimal import Decimal

        return Decimal(str(value))
    if isinstance(dt, T.LongType):
        return int(value)
    if isinstance(dt, T.DoubleType):
        return float(value)
    if isinstance(dt, T.BooleanType):
        return bool(value)
    return value


class _FilePartition(InputPartition):
    def __init__(self, file_path: str):
        self.file_path = file_path


class _NdjsonReader(DataSourceReader):
    def __init__(self, schema: T.StructType, path: str):
        self.schema = schema
        self.path = path

    def partitions(self):
        files = sorted(
            glob.glob(os.path.join(self.path, "part-*"))
        )
        # empty-table sinks (K4) still carry the sidecar; one empty
        # partition keeps the scan well-formed
        return [_FilePartition(f) for f in files] or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        if not partition.file_path:
            return
        opener = (
            gzip.open if partition.file_path.endswith(".gz") else open
        )
        names = [f.name for f in self.schema.fields]
        dts = [f.dataType for f in self.schema.fields]
        with opener(partition.file_path, "rt") as fh:
            for line in fh:
                if not line.strip():
                    continue
                rec = json.loads(line)
                yield tuple(
                    _convert(rec.get(n), dt) for n, dt in zip(names, dts)
                )


class DumptyNdjsonDataSource(DataSource):
    """`format("dumpty_ndjson")` — sidecar-schema'd NDJSON-gzip reader."""

    @classmethod
    def name(cls) -> str:
        return "dumpty_ndjson"

    def schema(self):
        return sidecar_schema(self.options["path"])

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return _NdjsonReader(schema, self.options["path"])


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(DumptyNdjsonDataSource)
