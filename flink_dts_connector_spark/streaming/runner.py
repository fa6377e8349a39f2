"""Bounded streaming execution helpers.

The reference's streaming tests run against a live DTS endpoint; ours run
Structured Streaming queries to completion over the driver's parquet tables
with ``trigger(availableNow=True)`` — real streaming machinery (watermarks,
state store, append semantics), bounded input, synchronous result.
"""

from __future__ import annotations

import atexit
import contextlib
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession


def scratch_dir(prefix: str) -> str:
    """mkdtemp registered for removal at interpreter exit. Streaming queries
    stage wave/checkpoint directories on local disk; a multi-query sweep in
    one process (or repeated bench runs) would otherwise accumulate parquet
    copies of the changelog indefinitely. Queries whose results are
    materialized (localCheckpoint) may additionally rmtree eagerly."""
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


@contextlib.contextmanager
def pinned_shuffle_partitions(spark: SparkSession, n: int | None = None):
    """Pin `spark.sql.shuffle.partitions` (default: core count) for the
    duration of a stateful streaming query definition+run, restoring after.

    Stateful operators own one state store PER shuffle partition PER stateful
    op side; a vanilla 200-partition session pays hundreds of store setups
    per micro-batch, and the count is frozen at the first checkpoint anyway
    — so pin it to the target parallelism before the first run.

    State-store PROVIDER stays Spark's default (HDFS-backed, in-heap):
    measured r9 on the interval join it beats RocksDB at sf0.1 (3.07 vs
    3.14 s) and sf1 (3.00 vs 4.28 s) while resident state is
    interval-bounded (SCALING.md §stream-stream join, STATESTORE_r09.json);
    RocksDB is the right switch only when per-partition state exceeds the
    executor heap."""
    n_parts = str(n if n is not None else spark.sparkContext.defaultParallelism)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n_parts)
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def read_stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Streaming read of one driver parquet table (schema from the batch
    reader, incl. the nanos→µs timestamp conversion in load_table)."""
    from flink_dts_connector_spark.session import load_table, table_path

    batch = load_table(spark, sf_dir, name)
    # file-stream sources require a directory: stream the sf dir filtered to
    # this table's file
    stream = (
        spark.readStream.schema(spark.read.parquet(table_path(sf_dir, name)).schema)
        .option("pathGlobFilter", f"{name}.parquet")
        .parquet(sf_dir)
    )
    # re-apply the nanos→µs conversions load_table made on the batch side
    from pyspark.sql import functions as F

    from flink_dts_connector_spark.session import _nanos_ts_columns

    for col in _nanos_ts_columns(table_path(sf_dir, name)):
        stream = stream.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    assert stream.schema == batch.schema
    return stream


def run_to_memory(sdf: DataFrame, output_mode: str = "append") -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into a memory
    sink; returns the sink contents as a batch DataFrame."""
    name = f"q_{uuid.uuid4().hex[:12]}"
    ckpt = scratch_dir("fdcs_ckpt_")
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(name)
