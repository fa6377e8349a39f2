"""Deterministic value-type zoo stream — FIXTURES.md F4 as a generator.

Every branch of the 13-kind value union (SURVEY.md §1.3) flows through the
full distributed pipeline (encode → Kafka-shaped bytes → decode → generic
envelope) with KNOWN rendered strings, so the registry query's DuckDB oracle
is a literal VALUES table: the strongest possible pin on the value system's
end-to-end rendering (charset fallbacks, zero dates, special numerics,
geometry, LOBs).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from flink_dts_connector_spark.datamodel.envelope import ObjectType, OperationType, SourceType, ValueKind
from flink_dts_connector_spark.formats.wire import CdcRecord, FieldDef, encode_record

DB, TBL = "zoo_db", "values_zoo"

#: (field name, value kind, wire payload, expected rendered string | None)
ZOO_CASES = [
    ("c_long_min", ValueKind.INTEGER, -(2**63), str(-(2**63))),
    ("c_big_integer", ValueKind.INTEGER, 2**70 + 7, str(2**70 + 7)),
    ("c_utf8", ValueKind.CHARACTER, ("utf8mb4", "héllo 🎉".encode()), "héllo 🎉"),
    ("c_gbk", ValueKind.CHARACTER, ("gbk", "中文".encode("gbk")), "中文"),
    ("c_latin1", ValueKind.CHARACTER, ("latin1", "café".encode("cp1252")), "café"),
    ("c_unknown_charset", ValueKind.CHARACTER, ("klingon8", b"\xff\xfe\x01"), "fffe01"),
    ("c_binary_charset", ValueKind.CHARACTER, ("binary", b"\x01\x02"), "0102"),
    ("c_decimal", ValueKind.DECIMAL, "12345.678901", "12345.678901"),
    ("c_decimal_nan", ValueKind.DECIMAL, "NaN", "NaN"),
    ("c_decimal_inf", ValueKind.DECIMAL, "-Infinity", "-Infinity"),
    ("c_double", ValueKind.FLOAT, -2.5, "-2.5"),
    ("c_ts", ValueKind.TIMESTAMP, (1700000000, 123456), "2023-11-14 22:13:20.123456"),
    (
        "c_datetime",
        ValueKind.DATETIME,
        {"y": 2024, "mo": 2, "d": 29, "h": 23, "mi": 59, "s": 59, "ns": 123456000},
        "2024-02-29 23:59:59.123456",
    ),
    ("c_zero_date", ValueKind.DATETIME, {"y": 0, "mo": 0, "d": 0}, None),
    ("c_partial_date", ValueKind.DATETIME, {"y": 2024, "mo": 5, "d": 17}, "2024-05-17"),
    (
        "c_ts_tz",
        ValueKind.TIMESTAMP_TZ,
        {"y": 2024, "mo": 1, "d": 1, "h": 8, "mi": 0, "s": 0, "tz": "+08:00"},
        "2024-01-01 08:00:00 +08:00",
    ),
    (
        "c_geom_wkb",
        ValueKind.BINARY_GEOMETRY,
        bytes.fromhex("010100000000000000000024400000000000003440"),
        "010100000000000000000024400000000000003440",
    ),
    ("c_geom_wkt", ValueKind.TEXT_GEOMETRY, "POINT (10 20)", "POINT (10 20)"),
    ("c_blob", ValueKind.BINARY_OBJECT, (ObjectType.BLOB, b"\x00\x01binary"), "000162696e617279"),
    ("c_json", ValueKind.TEXT_OBJECT, (ObjectType.JSON, '{"a": [1, 2]}'), '{"a": [1, 2]}'),
    ("c_null", ValueKind.NULL, None, None),
    ("c_empty", ValueKind.EMPTY, None, None),
]

N_COPIES = 64  # spread across partitions: the render must be location-independent


def generate_zoo_bytes(spark: SparkSession) -> DataFrame:
    fields = [FieldDef(name, kind.name, int(kind), True) for name, kind, _, _ in ZOO_CASES]
    image = [(kind, payload) for _, kind, payload, _ in ZOO_CASES]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            values, offs = [], []
            for row in pdf.itertuples(index=False):
                i = int(row.id)
                rec = CdcRecord(
                    id=i,
                    ts=1700000000 + i,
                    operation=OperationType.INSERT,
                    db=DB,
                    tbl=TBL,
                    transaction_id=f"zoo-{i}",
                    source_type=SourceType.MySQL,
                    fields=list(fields),
                    after=list(image),
                )
                values.append(encode_record(rec))
                offs.append(i)
            yield pd.DataFrame({"value": values, "partition": [v % 8 for v in offs], "offset": offs})

    return (
        spark.range(N_COPIES)
        .repartition(8)
        .mapInPandas(fn, schema="value binary, partition int, offset long")
    )


def expected_render_sql() -> str:
    """DuckDB literal oracle: one row per zoo field with its expected
    rendered string, times N_COPIES records."""
    rows = []
    for name, _, _, expect in ZOO_CASES:
        if expect is None:
            rows.append(f"('{name}', NULL)")
        else:
            esc = expect.replace("'", "''")
            rows.append(f"('{name}', '{esc}')")
    values = ",\n  ".join(rows)
    return f"""
SELECT f AS field, rendered, CAST({N_COPIES} AS BIGINT) AS n_records
FROM (VALUES
  {values}
) AS zoo(f, rendered)
"""
