"""Typed table projection — the `dts-cdc` decoding format, Spark-first.

The reference's `DTSSubscribeRowDataDeserializationSchema`
(`formats/physicaltable/DTSSubscribeRowDataDeserializationSchema.java:65-93`)
filters to one physical table + INSERT/UPDATE/DELETE, projects before/after
row images into the user's declared row type, and emits a changelog where an
UPDATE becomes two rows (UPDATE_BEFORE + UPDATE_AFTER, mode declared at
`DTSSubscribeTableSourceFactory.java:50-57`).

Spark has no RowKind, so the changelog kind is an explicit ``op`` column
(I/UB/UA/D) — downstream operators consume it with the changelog kit
(`operators/changelog.py`). Everything here is built-in column expressions
(map access + cast + explode): JVM-side, codegen'd, no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: changelog kinds, parity with Flink RowKind shortStrings
OP_INSERT, OP_UPDATE_BEFORE, OP_UPDATE_AFTER, OP_DELETE = "I", "UB", "UA", "D"

#: Declarable metadata keys → envelope columns, parity with the reference's
#: connector ReadableMetadata enum (`table/DtsDynamicSource.java:268-345`:
#: topic/partition/headers/offset/timestamp/timestamp-type) — the
#: `col TYPE METADATA FROM '<key>'` surface of its CREATE TABLE.
METADATA_KEYS = {
    "topic": "kafka_topic",
    "partition": "kafka_partition",
    "headers": "kafka_headers",
    "offset": "kafka_offset",
    "timestamp": "kafka_timestamp",
    "timestamp-type": "kafka_timestamp_type",
}


def project_table(
    env: DataFrame,
    schema: T.StructType,
    table: str | None = None,
    include_metadata: bool = True,
    metadata: list[str] | None = None,
) -> DataFrame:
    """Generic envelope → typed changelog rows for one declared table.

    ``schema`` plays the role of the reference's CREATE TABLE column list
    (`table/DtsDynamicTableFactory.java:76-77`): image map values are cast
    per declared field type. ``table`` is the ``db.tbl`` qualified-name
    filter (`'dts-cdc.table.name'`).

    UPDATE rows double into UB/UA via an array+explode — one narrow
    projection, no shuffle, no Python.
    """
    df = env.where(F.col("operation").isin("INSERT", "UPDATE", "DELETE"))
    if table is not None:
        qualified = F.concat_ws(
            ".",
            F.coalesce(F.element_at("tags", "l_db_name"), F.col("db")),
            F.coalesce(F.element_at("tags", "l_tb_name"), F.col("tbl")),
        )
        df = df.where(qualified == F.lit(table))

    img = T.MapType(T.StringType(), T.StringType())
    pair = T.StructType(
        [T.StructField("img", img, True), T.StructField("op", T.StringType(), False)]
    )
    changelog = (
        F.when(
            F.col("operation") == "INSERT",
            F.array(F.struct(F.col("after").alias("img"), F.lit(OP_INSERT).alias("op"))),
        )
        .when(
            F.col("operation") == "DELETE",
            F.array(F.struct(F.col("before").alias("img"), F.lit(OP_DELETE).alias("op"))),
        )
        .otherwise(
            F.array(
                F.struct(F.col("before").alias("img"), F.lit(OP_UPDATE_BEFORE).alias("op")),
                F.struct(F.col("after").alias("img"), F.lit(OP_UPDATE_AFTER).alias("op")),
            )
        )
        .cast(T.ArrayType(pair))
    )
    df = df.withColumn("_chg", F.explode(changelog))

    cols = [
        F.element_at(F.col("_chg.img"), f.name).cast(f.dataType).alias(f.name)
        for f in schema.fields
    ]
    cols.append(F.col("_chg.op").alias("op"))
    if include_metadata:
        cols = [F.col("ts"), F.col("id").alias("record_id")] + cols
    if metadata:
        # PHYSICAL + CONNECTOR METADATA ordering, per the reference's
        # produced-row convention (DtsDynamicSource.listReadableMetadata)
        for key in metadata:
            src = METADATA_KEYS.get(key)
            if src is None:
                raise ValueError(
                    f"unknown metadata key {key!r}; valid: {sorted(METADATA_KEYS)}"
                )
            cols.append(F.col(src).alias(key.replace("-", "_")))
    return df.select(*cols)
