"""Per-partition watermark emulation — the reference's watermark model on
Spark's per-query-global machinery.

The reference assigns each Kafka partition its own watermark
(`DtsCustomWatermarkExtractor.java:17-21` runs per consumer partition;
Flink's operator watermark is then the MIN across inputs), so one stalled
partition holds back event-time progress instead of having its late data
dropped. Spark's `withWatermark` is global (documented divergence,
SURVEY.md §4.4): the global max advances past a stalled partition.

This module closes the gap as an explicit stateful operator:
`track_partition_watermarks` keeps per-partition max-event-time state
(`applyInPandasWithState` keyed on `kafka_partition`) and emits each
partition's (max_ts, watermark); the operator-level safe watermark is the
MIN of those — exactly Flink's multi-input rule. Downstream consumers gate
on the safe watermark instead of Spark's global one when they need the
reference's no-partition-left-behind semantics.

Scale: state is one (long, long) pair per Kafka partition — thousands of
entries at most, trivially bounded.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("kafka_partition", T.IntegerType()),
        T.StructField("n_records", T.LongType()),
        T.StructField("max_ts", T.TimestampType()),
        T.StructField("partition_watermark", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [T.StructField("max_ts_us", T.LongType()), T.StructField("n", T.LongType())]
)


def track_partition_watermarks(env: DataFrame, delay_sec: int) -> DataFrame:
    """Streaming envelope → per-partition watermark stream: one row per
    (partition, micro-batch) carrying the running record count, max event
    time, and that partition's watermark (max − delay)."""
    import datetime as dt

    def fn(key: Tuple[Any], pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (part,) = key
        if state.exists:
            max_us, n = state.get
        else:
            max_us, n = -1, 0
        for pdf in pdfs:
            ts = pd.to_datetime(pdf["ts"])
            if len(ts):
                batch_max = ts.max()
                batch_us = batch_max.value // 1000  # ns → µs
                max_us = max(max_us, batch_us)
            n += len(pdf)
        state.update((max_us, n))
        if max_us < 0:
            return
        max_dt = dt.datetime.utcfromtimestamp(max_us / 1_000_000)
        yield pd.DataFrame(
            {
                "kafka_partition": [None if part is None else int(part)],
                "n_records": [n],
                "max_ts": [max_dt],
                "partition_watermark": [max_dt - dt.timedelta(seconds=delay_sec)],
            }
        )

    return env.groupBy("kafka_partition").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def safe_watermark(per_partition: DataFrame) -> DataFrame:
    """Operator-level watermark from the per-partition stream's sink: the
    MIN across partitions (Flink's multi-input watermark rule). Takes the
    LAST update per partition first, since update-mode sinks append one row
    per (partition, batch)."""
    latest = per_partition.groupBy("kafka_partition").agg(
        F.max("n_records").alias("n_records"),
        F.max("max_ts").alias("max_ts"),
        F.max("partition_watermark").alias("partition_watermark"),
    )
    safe = latest.agg(F.min("partition_watermark").alias("safe_watermark"))
    return latest.crossJoin(F.broadcast(safe))
