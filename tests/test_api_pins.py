"""API-stability pins (VERDICT r8 next-round #7).

The graph family passes a StorageLevel POSITIONALLY to
DataFrame.localCheckpoint (operators/graph.py:100,503,523) — cheap
insurance that a PySpark minor-version signature change fails loudly
in CI, not silently by binding the StorageLevel to the wrong
parameter on a 1000-executor deployment.
"""

import inspect

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def test_local_checkpoint_signature_pin(spark):
    sig = inspect.signature(DataFrame.localCheckpoint)
    params = list(sig.parameters)
    assert params[:3] == ["self", "eager", "storageLevel"], params
    # and functionally: an explicit-StorageLevel checkpoint round-trips
    df = spark.range(3).localCheckpoint(True, StorageLevel.MEMORY_AND_DISK)
    assert df.count() == 3


def test_input_file_name_survives_broadcast_join(spark, tmp_path):
    """The one-job mutation rewrite (sinks/writers.py) groups by
    input_file_name() AFTER a broadcast join — pin that the file name
    is still bound to the scan (no exchange between scan and the
    map-side partial agg)."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "pin_store")
    spark.range(100).withColumn("k", F.col("id")).write.parquet(p)
    keys = spark.createDataFrame([(i,) for i in range(0, 100, 7)], "k long")
    got = (
        spark.read.parquet(p)
        .join(F.broadcast(keys), "k", "left_semi")
        .groupBy(F.input_file_name().alias("f"))
        .count()
        .collect()
    )
    assert got and all(r["f"].startswith("file:") and r["f"] for r in got)
