"""SparkSession construction with pinned, scale-aware configuration.

The reference builds its session at src/dumpty/pipeline.py:154-163 from a
user-supplied conf dict (master local[n]); its production conf
(config.yaml.example:13-40) pins a session timezone, JSON null handling,
task retries and memory fractions. We keep the spirit — one well-configured
session, every knob explicit — but default to the settings a 100 TB
cluster job would want: AQE on (runtime partition coalescing + skew-join
handling), Arrow transfers for the Pandas-UDF paths, shuffle partitions
sized to the machine rather than Spark's legacy 200.

For DuckDB-oracle comparison the session timezone must be UTC (DuckDB
timestamps are UTC-naive); the reference's America/Los_Angeles pin
(config.yaml.example:25) is preserved as an option for NDJSON parity runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs every job gets. Values chosen for local[n] testing but each one is
# the same knob you would set on a 1000-executor cluster (where
# shuffle.partitions scales to ~2-3x total cores and maxPartitionBytes
# keeps scan tasks ~128MB).
DEFAULT_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # keep nulls in JSON output — reference parity (config.yaml.example:26)
    "spark.sql.jsonGenerator.ignoreNullFields": "false",
    # scan parallelism: one ~128MB task per input split
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # small-dim joins should broadcast; 64MB is generous for dims like
    # region/nation/supplier even at sf1000
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.parquet.compression.codec": "zstd",
    # the events fixture stores TIMESTAMP(NANOS) which Spark's reader rejects;
    # read as long and convert (sources/parquet.py) — DuckDB equally truncates
    # nanos to micros, so both engines see identical values
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.ui.enabled": "false",
    # Python-worker daemon with numpy/pandas/pyarrow PRELOADED before
    # fork (dumpty_spark/python_daemon.py): fresh workers inherit the
    # initialized modules copy-on-write instead of each paying the
    # ~1-2s import — the measured 63-fork wave inside one concurrent
    # ANN audit stage becomes fork-priced. Env-overridable; an EMPTY
    # SPARK_GRAFT_PY_DAEMON selects the stock daemon explicitly
    # (PythonWorkerFactory uses the conf value verbatim, so '' would
    # launch `python -m ''` and break every Python-worker stage —
    # ADVICE r11 #1).
    "spark.python.daemon.module": (
        os.environ.get("SPARK_GRAFT_PY_DAEMON", "dumpty_spark.python_daemon")
        or "pyspark.daemon"
    ),
    # FileOutputCommitter v2 (r11 optimization, guide §6/§5-driver): task
    # commit moves files straight to the destination instead of leaving
    # them for a SEQUENTIAL driver-side rename pass at job commit. Job
    # commit goes from O(files) driver renames to O(1); measured here a
    # 16-file parquet write drops ~40% (2.7-5.8s -> 1.9-3.2s at 32
    # parts, 0.6-0.9s -> 0.3-0.4s single-file). On a real cluster
    # writing thousands of files per job — especially to object stores
    # where rename is copy — this is the standard production setting
    # (long the default on EMR). Trade-off: a failed task's partial
    # files are cleaned by attempt-id naming rather than directory
    # atomicity; Spark's own retry semantics already assume this.
    "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": os.environ.get(
        "SPARK_GRAFT_COMMITTER_ALGO", "2"
    ),
    # bucketed-table metastore location (write_bucketed/bucketed tables);
    # keep it out of the source tree — on a cluster this is the real
    # warehouse path
    "spark.sql.warehouse.dir": os.environ.get(
        "SPARK_GRAFT_WAREHOUSE", "/tmp/dumpty_spark_warehouse"
    ),
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def warehouse_scratch(spark: SparkSession, tag: str) -> str:
    """A per-call scratch directory under ``spark.sql.warehouse.dir``.

    Every at-rest store a registered query builds must live on the
    engine's durable SHARED location — the warehouse root, which on a
    real deployment is cluster-visible storage (HDFS/object store) —
    never a driver-local tempdir, which only happens to work in
    local[n] because driver and executors share a filesystem. Caller
    removes the directory in a ``finally`` after materializing any
    result that reads from it — via :func:`scratch_cleanup`, which
    deletes through the Hadoop FileSystem API and therefore works for
    ANY warehouse URI (hdfs://, s3a://, file:). ``shutil.rmtree`` is an
    acceptable substitute only on local-filesystem warehouses (the
    test/bench configuration): on a remote URI it silently no-ops.
    """
    import uuid

    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for scheme in ("file://", "file:"):
        if wh.startswith(scheme):
            wh = wh[len(scheme):]
            break
    return f"{wh.rstrip('/')}/_{tag}_scratch_{uuid.uuid4().hex}"


def scratch_cleanup(spark: SparkSession, path: str) -> None:
    """Recursively delete a :func:`warehouse_scratch` directory through
    the Hadoop FileSystem API, so the cleanup contract holds for any
    warehouse URI (hdfs://, s3a://, gs-compatible, file:) — not just
    local POSIX paths the way ``shutil.rmtree`` does. Missing paths are
    a no-op (mirrors ``rmtree(ignore_errors=True)``)."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    fs = jpath.getFileSystem(hconf)
    if fs.exists(jpath):
        fs.delete(jpath, True)


def get_session(
    app_name: str = "dumpty_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``shuffle_partitions`` defaults to the core count locally; on a real
    cluster pass ~2-3x total executor cores (AQE coalesces the excess).
    """
    cores = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        # Driver heap sized to the WORKLOAD, committed up front (r11
        # optimization, guide §5): the previous 32g lazy heap let G1
        # evacuate into never-touched regions for the whole session, and
        # on lazily-paged VM hosts every such first touch is a slow
        # guest fault — measured here as 45% SYSTEM CPU and 16s GC
        # pauses on a query whose live set is a few hundred MB
        # (q_ann_composed_retrieval: 81-163s wall; with a pre-touched
        # heap: 9-17s, GC 0.5s, sys 3%). AlwaysPreTouch faults the
        # whole heap once at startup (seconds, paid once per session) so
        # steady state never depends on host fault latency — the
        # standard production setting for latency-sensitive JVMs. Both
        # knobs stay env-overridable for hosts/workloads that want the
        # big-heap configuration.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS", "-XX:+AlwaysPreTouch"),
        )
    )
    for k, v in DEFAULT_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
