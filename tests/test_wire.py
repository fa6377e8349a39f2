"""Wire codec unit tests: round-trip of every value-union branch plus the
edge cases catalogued in FIXTURES.md F4 / SURVEY.md §1.3."""

from __future__ import annotations

from flink_dts_connector_spark.datamodel.envelope import (
    ObjectType,
    OperationType,
    SourceType,
    ValueKind,
    full_table_name,
    split_table_name,
)
from flink_dts_connector_spark.formats.wire import (
    CdcRecord,
    FieldDef,
    decode_header,
    decode_record,
    encode_record,
    render_value,
)

ZOO_FIELDS = [
    FieldDef("c_bigint", "BIGINT", 8),
    FieldDef("c_big_integer", "DECIMAL", 0),
    FieldDef("c_string_utf8", "VARCHAR", 12),
    FieldDef("c_string_gbk", "VARCHAR", 12),
    FieldDef("c_string_unknown_charset", "VARCHAR", 12),
    FieldDef("c_decimal", "DECIMAL", 0),
    FieldDef("c_decimal_nan", "DECIMAL", 0),
    FieldDef("c_double", "DOUBLE", 5),
    FieldDef("c_ts", "TIMESTAMP", 7),
    FieldDef("c_datetime", "DATETIME", 10),
    FieldDef("c_zero_date", "DATETIME", 10),
    FieldDef("c_partial_date", "DATE", 10),
    FieldDef("c_ts_tz", "TIMESTAMPTZ", 7),
    FieldDef("c_geom_wkb", "GEOMETRY", 15),
    FieldDef("c_geom_wkt", "GEOMETRY", 15),
    FieldDef("c_blob", "BLOB", 252),
    FieldDef("c_json", "JSON", 245),
    FieldDef("c_null", "VARCHAR", 12),
    FieldDef("c_empty", "VARCHAR", 12),
]

ZOO_IMAGE = [
    (ValueKind.INTEGER, -(2**63)),  # LONG min
    (ValueKind.INTEGER, 2**70 + 7),  # beyond LONG (BigInteger territory)
    (ValueKind.CHARACTER, ("utf8mb4", "héllo 🎉".encode("utf-8"))),
    (ValueKind.CHARACTER, ("gbk", "中文".encode("gbk"))),
    (ValueKind.CHARACTER, ("klingon8", b"\xff\xfe\x01")),  # unknown → hex
    (ValueKind.DECIMAL, "12345.678901"),
    (ValueKind.DECIMAL, "NaN"),  # SpecialNumeric text form
    (ValueKind.FLOAT, -2.5e-308),
    (ValueKind.TIMESTAMP, (1700000000, 123456)),
    (ValueKind.DATETIME, {"y": 2024, "mo": 2, "d": 29, "h": 23, "mi": 59, "s": 59, "ns": 123456000}),
    (ValueKind.DATETIME, {"y": 0, "mo": 0, "d": 0}),  # zero date → null
    (ValueKind.DATETIME, {"y": 2024, "mo": 5, "d": 17}),  # date-only segments
    (
        ValueKind.TIMESTAMP_TZ,
        {"y": 2024, "mo": 1, "d": 1, "h": 8, "mi": 0, "s": 0, "tz": "+08:00"},
    ),
    (ValueKind.BINARY_GEOMETRY, bytes.fromhex("010100000000000000000024400000000000003440")),
    (ValueKind.TEXT_GEOMETRY, "POINT (10 20)"),
    (ValueKind.BINARY_OBJECT, (ObjectType.BLOB, b"\x00\x01\x02binary")),
    (ValueKind.TEXT_OBJECT, (ObjectType.JSON, '{"a": [1, 2, 3]}')),
    (ValueKind.NULL, None),
    (ValueKind.EMPTY, None),
]


def make_zoo_record() -> CdcRecord:
    return CdcRecord(
        id=42,
        ts=1700000123,
        operation=OperationType.UPDATE,
        db="zoo_db",
        tbl="tbl.with.dots",
        transaction_id="tx-zoo-1",
        born_ts=1700000100,
        source_type=SourceType.PostgreSQL,
        source_version="14.1",
        tags={"pk_uk_info": '{"PRIMARY": ["c_bigint"], "uk_1": ["c_double"]}', "l_db_name": "logical_db"},
        fields=list(ZOO_FIELDS),
        before=list(ZOO_IMAGE),
        after=list(ZOO_IMAGE),
    )


def test_roundtrip_all_value_kinds():
    rec = make_zoo_record()
    data = encode_record(rec)
    back = decode_record(data)
    assert back.id == rec.id
    assert back.operation is OperationType.UPDATE
    assert back.source_type is SourceType.PostgreSQL
    assert back.transaction_id == "tx-zoo-1"
    assert back.born_ts == 1700000100
    assert back.db == "zoo_db" and back.tbl == "tbl.with.dots"
    assert back.tags == rec.tags
    assert [f.name for f in back.fields] == [f.name for f in rec.fields]
    assert back.before == list(ZOO_IMAGE)
    assert back.after == list(ZOO_IMAGE)
    assert back.pk_cols == ["c_bigint"]


def test_born_ts_falls_back_to_commit_ts():
    rec = make_zoo_record()
    rec.born_ts = None
    h = decode_header(encode_record(rec))
    assert h.born_ts == h.ts == 1700000123


def test_header_skips_payload_and_rejects_torn_records():
    rec = make_zoo_record()
    data = encode_record(rec)
    h = decode_header(data)
    # lazy contract: header parse knows exactly where payload ends without
    # parsing it (decode_payload is a separate call)
    assert h.payload_pos + h.payload_len == len(data)
    # integrity: a torn buffer must fail loudly, not "decode" garbage
    import pytest

    with pytest.raises(ValueError, match="truncated"):
        decode_header(data[:-5])


def test_render_values():
    assert render_value(ValueKind.INTEGER, 2**70 + 7) == str(2**70 + 7)
    assert render_value(ValueKind.CHARACTER, ("utf8mb4", "héllo 🎉".encode())) == "héllo 🎉"
    assert render_value(ValueKind.CHARACTER, ("gbk", "中文".encode("gbk"))) == "中文"
    # unresolvable charset → charset_'hex' (StringValue.java:70-72)
    assert render_value(ValueKind.CHARACTER, ("klingon8", b"\xff\xfe\x01")) == "klingon8_'fffe01'"
    # malformed bytes under a RESOLVABLE charset: Java's `new String(bytes,
    # charset)` never throws — bad sequences become U+FFFD (StringValue.java:64-66)
    assert render_value(ValueKind.CHARACTER, ("utf8", b"ok\xff")) == "ok�"
    # 'binary' maps to ISO-8859-1 — decoded string (JDKCharsetMapper.java:18)
    assert render_value(ValueKind.CHARACTER, ("binary", b"A\xe9")) == "Aé"
    # missing charset → bare hex (StringValue.java:53-55)
    assert render_value(ValueKind.CHARACTER, ("", b"\x01\x02")) == "0102"
    # raw codec name wins over the alias map: latin1 = ISO-8859-1 in both
    # Java (Charset.forName) and Python, NOT the mapper's cp1252
    assert render_value(ValueKind.CHARACTER, ("latin1", b"caf\xe9")) == "café"
    # mapper-resolved: koi8r is unknown to both codec registries raw
    assert render_value(ValueKind.CHARACTER, ("koi8r", "да".encode("koi8_r"))) == "да"
    assert render_value(ValueKind.DECIMAL, "NaN") == "NaN"
    assert render_value(ValueKind.TIMESTAMP, (1700000000, 123456)) == "2023-11-14 22:13:20.123456"
    # zero date → None (DateTime.java:473-482 guard)
    assert render_value(ValueKind.DATETIME, {"y": 0, "mo": 0, "d": 0}) is None
    assert render_value(ValueKind.DATETIME, {"y": 2024, "mo": 5, "d": 17}) == "2024-05-17"
    assert (
        render_value(ValueKind.TIMESTAMP_TZ, {"y": 2024, "mo": 1, "d": 1, "h": 8, "mi": 0, "s": 0, "tz": "+08:00"})
        == "2024-01-01 08:00:00 +08:00"
    )
    assert render_value(ValueKind.NULL, None) is None
    assert render_value(ValueKind.EMPTY, None) is None
    assert render_value(ValueKind.TEXT_OBJECT, (ObjectType.JSON, "{}")) == "{}"
    assert render_value(ValueKind.BINARY_OBJECT, (ObjectType.BLOB, b"\xab")) == "ab"
    # BIT renders as UTF-8 text (BitValue.java:31-38)
    assert render_value(ValueKind.BIT, b"101") == "101"


def test_render_wkb_geometry():
    import struct

    # POINT/LINESTRING/POLYGON → WKT (GeometryUtil.java:14-22)
    pt = struct.pack("<BIdd", 1, 1, 10.0, 20.0)
    assert render_value(ValueKind.BINARY_GEOMETRY, pt) == "POINT (10 20)"
    pt_be = struct.pack(">BIdd", 0, 1, -1.5, 2.0)  # big-endian byte order
    assert render_value(ValueKind.BINARY_GEOMETRY, pt_be) == "POINT (-1.5 2)"
    ls = struct.pack("<BII", 1, 2, 2) + struct.pack("<dddd", 0.0, 0.0, 3.0, 4.0)
    assert render_value(ValueKind.BINARY_GEOMETRY, ls) == "LINESTRING (0 0, 3 4)"
    ring = [(30.0, 10.0), (40.0, 40.0), (20.0, 40.0), (30.0, 10.0)]
    poly = struct.pack("<BIII", 1, 3, 1, len(ring))
    for x, y in ring:
        poly += struct.pack("<dd", x, y)
    assert render_value(ValueKind.BINARY_GEOMETRY, poly) == "POLYGON ((30 10, 40 40, 20 40, 30 10))"
    # EWKB SRID flag is skipped, geometry still renders
    ewkb = struct.pack("<BIIdd", 1, 0x20000001, 4326, 10.0, 20.0)
    assert render_value(ValueKind.BINARY_GEOMETRY, ewkb) == "POINT (10 20)"
    # torn / unsupported WKB → hex fallback (WKBGeometry.java:42-48)
    assert render_value(ValueKind.BINARY_GEOMETRY, pt[:9]) == pt[:9].hex()
    mp = struct.pack("<BII", 1, 4, 0)  # MULTIPOINT unsupported → hex
    assert render_value(ValueKind.BINARY_GEOMETRY, mp) == mp.hex()
    # extreme ordinates render positionally like JTS's DecimalFormat, never
    # in repr()'s scientific notation
    ext = struct.pack("<BIdd", 1, 1, 1e17, 1.5e-7)
    assert render_value(ValueKind.BINARY_GEOMETRY, ext) == "POINT (100000000000000000 0.00000015)"


def test_v2_header_fields_roundtrip():
    rec = make_zoo_record()
    rec.schema = "dbo"
    rec.source_position = "03:1f2"
    rec.source_safe_position = "03:1a0"
    rec.trans_seq = 7
    h = decode_header(encode_record(rec))
    assert h.schema == "dbo"
    assert h.source_position == "03:1f2"
    assert h.source_safe_position == "03:1a0"
    assert h.trans_seq == 7
    # checkpoint string parity (LazyParseRecordImpl.java:199-209)
    assert h.checkpoint() == f"0@{42 & 0x7FFFFFFF}@03:1f2@{1700000123 * 1000}"
    back = decode_record(encode_record(rec))
    assert back.schema == "dbo" and back.trans_seq == 7


def test_checkpoint_null_position_and_id_truncation():
    rec = make_zoo_record()
    rec.id = 2**33 + 5  # idLow31 truncation (writer-2.0 mask)
    h = decode_header(encode_record(rec))
    assert h.checkpoint() == f"0@{(2**33 + 5) & 0x7FFFFFFF}@null@{1700000123 * 1000}"


def test_render_object_names():
    from flink_dts_connector_spark.formats.wire import render_object_names

    # 2-part name: schema defaults to db (LazyRecordDeserializer.java:346-365)
    assert render_object_names(SourceType.MySQL, "db1", None, "t1") == ("db1", "db1", "t1")
    # 3-part non-SQLServer: schema carried, names unbracket ed
    assert render_object_names(SourceType.PostgreSQL, "db1", "public", "t1") == (
        "db1", "public", "t1",
    )
    # SQLServer bracket convention (LazyRecordDeserializer.java:292-298)
    assert render_object_names(SourceType.SQLServer, "erp", "dbo", "accounts") == (
        "[erp]", "dbo", "[dbo].[accounts]",
    )
    assert render_object_names(SourceType.SQLServer, "erp", None, "accounts") == (
        "[erp]", "erp", "[erp].[accounts]",
    )
    # headerless records (heartbeats) pass through untouched
    assert render_object_names(SourceType.MySQL, "", None, "") == ("", None, "")


def test_table_name_escaping():
    # ObjectNameUtils.java:64-112 parity: dots inside segments are escaped
    name = full_table_name("db", None, "tbl.with.dots")
    assert split_table_name(name) == ["db", "tbl.with.dots"]
    assert split_table_name(full_table_name("a.b", "s", "t")) == ["a.b", "s", "t"]


def test_varint_extremes():
    from flink_dts_connector_spark.formats.wire import read_long, write_long

    for n in (0, -1, 1, 2**62, -(2**62), 2**63 - 1, -(2**63)):
        buf = bytearray()
        write_long(buf, n)
        got, pos = read_long(bytes(buf), 0)
        assert got == n and pos == len(buf)


def test_fixed_wire_drops_torn_records(spark, sf_dir):
    """Fixed-layout codec: truncated/oversized records are filtered by the
    length guard before any field decode; intact records round-trip."""
    from pyspark.sql import functions as F

    from flink_dts_connector_spark.formats.fixedwire import (
        REC_LEN,
        decode_fixed,
        encode_orders_changelog,
    )

    wire = encode_orders_changelog(spark, sf_dir).limit(50)
    n_ok = wire.count()
    torn = wire.select(F.expr(f"substring(value, 1, {REC_LEN - 10})").alias("value"))
    oversized = wire.select(F.concat(F.col("value"), F.lit("XX")).alias("value"))
    mixed = wire.unionAll(torn).unionAll(oversized)
    out = decode_fixed(mixed)
    assert out.count() == n_ok
    assert out.where(F.col("o_orderkey").isNull()).count() == 0


def test_fixed_zoo_drops_torn_records(spark):
    """Truncated fixed-zoo records drop before any slot read; intact copies
    decode every field."""
    from pyspark.sql import functions as F

    from flink_dts_connector_spark.formats.fixedwire import (
        ZOO_FIXED_EXPECTED,
        decode_zoo_fixed,
        encode_zoo_fixed,
    )

    wire = encode_zoo_fixed(spark, n_copies=4)
    torn = wire.select(F.expr("substring(value, 1, 100)").alias("value"))
    out = decode_zoo_fixed(wire.unionAll(torn))
    assert out.count() == 4 * len(ZOO_FIXED_EXPECTED)
    got = {
        (r["field"], r["rendered"])
        for r in out.select("field", "rendered").distinct().collect()
    }
    assert got == set(ZOO_FIXED_EXPECTED)
