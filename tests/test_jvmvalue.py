"""JVM value decode (`formats/jvmvalue.py`): bit-parity with the Python
typed path (decode_cdc → project_table) across the value-kind zoo, the
anchor/keep drop contract, logical renames, and the Python-free plan guard."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_dts_connector_spark.datamodel.envelope import (
    ObjectType,
    OperationType,
    SourceType,
    ValueKind,
)
from flink_dts_connector_spark.formats.decoder import decode_cdc
from flink_dts_connector_spark.formats.jvmvalue import (
    decode_typed_jvm,
    fielddef_bytes,
)
from flink_dts_connector_spark.formats.typed import project_table
from flink_dts_connector_spark.formats.wire import CdcRecord, FieldDef, encode_record
from tests.conftest import SF_DIR

ORDERS_TABLE = "dts_demo.orders"


def _python_typed(df, schema, table, ops=("INSERT", "UPDATE", "DELETE")):
    env = decode_cdc(df, tables=[table], ops=list(ops), on_error="skip")
    return project_table(env, schema, table=table)


def _rows(df):
    # stringify cells so NaN compares equal to NaN and -0.0 != 0.0 is caught
    return sorted(tuple(repr(v) for v in row) for row in df.collect())


def test_jvm_typed_parity_generator(spark):
    """The full orders fixture stream (INSERT/UB/UA/D, exact-cents DECIMAL,
    segment DATETIME, TEXT_OBJECT priority) decodes JVM-side exactly as the
    Python decode→project path does — row for row, value for value."""
    from flink_dts_connector_spark.plans.cdc_queries import ORDERS_CDC_SCHEMA
    from flink_dts_connector_spark.sources.generator import (
        ORDERS_FIELDS,
        generate_cdc_bytes,
    )

    raw = generate_cdc_bytes(spark, SF_DIR)
    jvm = _rows(decode_typed_jvm(raw, ORDERS_CDC_SCHEMA, ORDERS_FIELDS, ORDERS_TABLE))
    py = _rows(_python_typed(raw, ORDERS_CDC_SCHEMA, ORDERS_TABLE))
    assert len(jvm) > 100
    assert jvm == py


ZOO_FIELDS = [
    FieldDef("f_int", "BIGINT", 8, False),
    FieldDef("f_char", "VARCHAR", 12, True),
    FieldDef("f_dec", "DECIMAL", 0, True),
    FieldDef("f_float", "DOUBLE", 5, True),
    FieldDef("f_ts", "TIMESTAMP", 7, True),
    FieldDef("f_dt", "DATETIME", 10, True),
    FieldDef("f_obj", "TEXT", 245, True),
    FieldDef("f_bit", "BIT", 16, True),
    FieldDef("f_geo", "TEXT", 244, True),
]
ZOO_SCHEMA = T.StructType(
    [
        T.StructField("f_int", T.LongType()),
        T.StructField("f_char", T.StringType()),
        T.StructField("f_dec", T.DoubleType()),
        T.StructField("f_float", T.DoubleType()),
        T.StructField("f_ts", T.TimestampType()),
        T.StructField("f_dt", T.TimestampType()),
        T.StructField("f_obj", T.StringType()),
        T.StructField("f_bit", T.StringType()),
        T.StructField("f_geo", T.StringType()),
    ]
)
ZOO_TABLE = "zdb.ztbl"


def _zoo_rec(rid: int, image: list, op=OperationType.INSERT, **kw) -> CdcRecord:
    base = dict(
        id=rid, ts=1_700_000_000 + rid, operation=op, db="zdb", tbl="ztbl",
        transaction_id=f"tx-{rid}", source_type=SourceType.MySQL,
        source_version="8.0", fields=list(ZOO_FIELDS),
        source_position=f"pos-{rid}", trans_seq=rid % 3,
    )
    base.update(kw)
    if op == OperationType.DELETE:
        base.setdefault("before", image)
    else:
        base.setdefault("after", image)
    return CdcRecord(**base)


def _zoo_images() -> list[list]:
    """One image per interesting shape; every cell kind is exercised."""
    base = [
        (ValueKind.INTEGER, 42),
        (ValueKind.CHARACTER, ("utf8", "héllo wörld".encode())),
        (ValueKind.DECIMAL, "-12345.6789"),
        (ValueKind.FLOAT, 3.14159265358979),
        (ValueKind.TIMESTAMP, (1_600_000_000, 123456)),
        (ValueKind.DATETIME, {"y": 2021, "mo": 7, "d": 4, "h": 1, "mi": 2, "s": 3}),
        (ValueKind.TEXT_OBJECT, (ObjectType.JSON, '{"k": [1, 2]}')),
        (ValueKind.BIT, b"1011"),
        (ValueKind.TEXT_GEOMETRY, "POINT (1 2)"),
    ]
    variants = [
        base,
        # all-NULL / EMPTY mix
        [(ValueKind.NULL, None)] * 4 + [(ValueKind.EMPTY, None)] * 5,
        # negative/huge int, latin1 charset, special decimal, tiny float,
        # pre-epoch timestamp, date-only datetime, BLOB hex, 2-byte lens
        [
            (ValueKind.INTEGER, -(2**60)),
            (ValueKind.CHARACTER, ("latin1", "café".encode("latin-1"))),
            (ValueKind.DECIMAL, "NaN"),
            (ValueKind.FLOAT, 2.0**-1060),
            (ValueKind.TIMESTAMP, (-12345, 0)),
            (ValueKind.DATETIME, {"y": 1999, "mo": 12, "d": 31}),
            (ValueKind.BINARY_OBJECT, (ObjectType.BLOB, b"\x00\xff\x7f")),
            (ValueKind.BIT, b"0"),
            (ValueKind.CHARACTER, ("utf8", ("x" * 100).encode())),
        ],
        # near-max int64, missing charset → hex, unresolvable charset →
        # cs_'hex' fallback, negative-zero float, datetime with nanos,
        # zero-date → NULL
        [
            (ValueKind.INTEGER, 2**62 - 1),
            (ValueKind.CHARACTER, ("", b"\xde\xad\xbe\xef")),
            (ValueKind.DECIMAL, "0.00"),
            (ValueKind.FLOAT, -0.0),
            (ValueKind.TIMESTAMP, (0, 0)),
            (
                ValueKind.DATETIME,
                {"y": 2020, "mo": 1, "d": 2, "h": 3, "mi": 4, "s": 5, "ns": 987654321},
            ),
            (ValueKind.TEXT_OBJECT, (ObjectType.TEXT, "red")),
            (ValueKind.CHARACTER, ("klingon", b"qapla")),
            (ValueKind.DATETIME, {"y": 2020, "mo": 0, "d": 2}),
        ],
        [
            (ValueKind.INTEGER, 0),
            (ValueKind.CHARACTER, ("utf8", b"")),
            (ValueKind.DECIMAL, "NaN"),
            (ValueKind.FLOAT, 1.0e300),
            (ValueKind.TIMESTAMP, (2_000_000_000, 999999)),
            (ValueKind.DATETIME, {"y": 63, "mo": 1, "d": 1}),  # 1-byte year
            (ValueKind.TEXT_OBJECT, (ObjectType.XML, "<a/>")),
            (ValueKind.NULL, None),
            (ValueKind.TEXT_GEOMETRY, "LINESTRING (0 0, 1 1)"),
        ],
    ]
    return variants


def test_jvm_typed_value_zoo(spark):
    """Every supported value kind and its edge shapes decode bit-equal to
    the Python render-and-cast path — INSERT, UPDATE (UB+UA) and DELETE."""
    recs = []
    rid = 0
    for image in _zoo_images():
        recs.append(_zoo_rec(rid, image))
        rid += 1
        recs.append(
            _zoo_rec(rid, None, op=OperationType.UPDATE,
                     before=image, after=_zoo_images()[0])
        )
        rid += 1
        recs.append(_zoo_rec(rid, image, op=OperationType.DELETE))
        rid += 1
    df = spark.createDataFrame([(encode_record(r),) for r in recs], "value binary")
    jvm = _rows(decode_typed_jvm(df, ZOO_SCHEMA, ZOO_FIELDS, ZOO_TABLE))
    py = _rows(_python_typed(df, ZOO_SCHEMA, ZOO_TABLE))
    assert len(jvm) == len(recs) + len(_zoo_images())  # UPDATEs doubled
    assert jvm == py


def test_jvm_typed_renames_and_drops(spark):
    """Exact-filter parity: logical renames INTO the selection survive,
    renames OUT of it drop, foreign tables/ops drop, poison bytes and torn
    records drop (skip semantics) — matching the Python path with
    on_error='skip'."""
    img = _zoo_images()[0]
    inside = _zoo_rec(1, img)
    renamed_in = _zoo_rec(
        2, img, db="other", tbl="t",
        tags={"l_db_name": "zdb", "l_tb_name": "ztbl"},
    )
    renamed_out = _zoo_rec(3, img, tags={"l_tb_name": "elsewhere"})
    foreign = _zoo_rec(4, img, db="other", tbl="t2")
    heartbeat = CdcRecord(
        id=5, ts=1, operation=OperationType.HEARTBEAT, db="", tbl="",
        transaction_id=None,
    )
    blobs = [encode_record(r) for r in (inside, renamed_in, renamed_out, foreign, heartbeat)]
    whole = encode_record(_zoo_rec(6, img))
    blobs += [b"\x00poison", whole[: len(whole) - 7], None]
    df = spark.createDataFrame([(b,) for b in blobs], "value binary")

    jvm = decode_typed_jvm(df, ZOO_SCHEMA, ZOO_FIELDS, ZOO_TABLE)
    kept = sorted(r["record_id"] for r in jvm.select("record_id").collect())
    assert kept == [1, 2]
    py = _python_typed(df.where(F.col("value").isNotNull()), ZOO_SCHEMA, ZOO_TABLE)
    assert _rows(jvm) == _rows(py)


def test_jvm_typed_v1_layout(spark):
    """v1 records (no schema/source_position/trans_seq header fields)
    decode identically — the version-conditional header step."""
    from tests.test_jvmheader import _encode_v1

    img = _zoo_images()[0]
    rec = _zoo_rec(7, img, schema=None, source_position=None,
                   source_safe_position=None, trans_seq=0)
    df = spark.createDataFrame(
        [(_encode_v1(rec),), (encode_record(rec),)], "value binary"
    )
    jvm = _rows(decode_typed_jvm(df, ZOO_SCHEMA, ZOO_FIELDS, ZOO_TABLE))
    py = _rows(_python_typed(df, ZOO_SCHEMA, ZOO_TABLE))
    assert len(jvm) == 2 and jvm == py


def test_jvm_typed_plan_python_free(spark, tmp_path):
    """The whole decode+project subtree over materialized raw bytes has no
    Python eval node — the zero-Python ingest contract this module exists
    for (extends the tests/test_jvmheader.py:198 pattern to values)."""
    img = _zoo_images()[0]
    blobs = [encode_record(_zoo_rec(i, img)) for i in range(10)]
    p = str(tmp_path / "raw")
    spark.createDataFrame([(b,) for b in blobs], "value binary").write.parquet(p)
    raw = spark.read.parquet(p)
    out = decode_typed_jvm(raw, ZOO_SCHEMA, ZOO_FIELDS, ZOO_TABLE)
    agg = out.groupBy().agg(F.count(F.lit(1)).alias("n"), F.sum("f_int").alias("s"))
    jvm = spark._jvm
    plan = agg._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan and "PythonMapInArrow" not in plan
    row = agg.collect()[0]
    assert row["n"] == 10 and row["s"] == 420


def test_jvm_typed_anchor_guard_rejects_embedded_fielddef(spark):
    """A record of ANOTHER table whose payload embeds our exact field-def
    bytes inside a string value must NOT be mis-decoded: the payload-length
    varint guard fails at the false anchor and the record drops."""
    evil_payload = fielddef_bytes(ZOO_FIELDS).decode("latin-1")
    fields = [FieldDef("doc", "VARCHAR", 12, True)]
    rec = CdcRecord(
        id=9, ts=1, operation=OperationType.INSERT, db="zdb", tbl="ztbl",
        transaction_id="t", fields=fields,
        after=[(ValueKind.CHARACTER, ("latin1", evil_payload.encode("latin-1")))],
    )
    df = spark.createDataFrame([(encode_record(rec),)], "value binary")
    assert decode_typed_jvm(df, ZOO_SCHEMA, ZOO_FIELDS, ZOO_TABLE).count() == 0


def test_jvm_typed_anchor_retry_rescues_header_false_match(spark):
    """A record of the SELECTED table whose transaction id (header region,
    BEFORE the real payload) embeds the exact field-def bytes used to
    first-occurrence-shadow the true anchor and silently drop the record;
    the guard-verified retry must now find the real anchor and decode it
    bit-equal to the Python path."""
    mini_fields = [FieldDef("v", "BIGINT", 8, True)]
    mini_schema = T.StructType([T.StructField("v", T.LongType())])
    fd = fielddef_bytes(mini_fields)
    assert all(b < 128 for b in fd)  # precondition: txid embeds byte-exactly
    rec = CdcRecord(
        id=11, ts=1, operation=OperationType.INSERT, db="zdb", tbl="ztbl",
        transaction_id=fd.decode("ascii"), fields=mini_fields,
        after=[(ValueKind.INTEGER, 42)],
    )
    df = spark.createDataFrame([(encode_record(rec),)], "value binary")
    jvm = decode_typed_jvm(df, mini_schema, mini_fields, "zdb.ztbl")
    assert _rows(jvm) == _rows(_python_typed(df, mini_schema, "zdb.ztbl"))
    assert jvm.count() == 1


def test_jvm_typed_long_rename_value(spark):
    """A logical-rename tag value >= 64 chars has a multi-byte length
    varint; it must decode (a single-byte-only read would silently fall
    back to the physical name and drop this renamed-in record)."""
    long_tbl = "x" * 70
    img = _zoo_images()[0]
    rec = _zoo_rec(
        12, img, db="other", tbl="t", tags={"l_db_name": "zdb", "l_tb_name": long_tbl}
    )
    df = spark.createDataFrame([(encode_record(rec),)], "value binary")
    table = f"zdb.{long_tbl}"
    jvm = decode_typed_jvm(df, ZOO_SCHEMA, ZOO_FIELDS, table)
    assert jvm.count() == 1
    assert _rows(jvm) == _rows(_python_typed(df, ZOO_SCHEMA, table))


def test_jvm_typed_utf16_charset_parity(spark):
    """'utf16' pins to utf-16-be on the Python path (NO BOM consumption —
    a BOM survives as U+FEFF); the JVM map must use UTF-16BE, not Java's
    BOM-eating 'UTF-16', for bit parity — with and without a BOM."""
    mini_fields = [FieldDef("s", "VARCHAR", 12, True)]
    mini_schema = T.StructType([T.StructField("s", T.StringType())])
    plain = "Az".encode("utf-16-be")
    bom = b"\xfe\xff" + plain
    recs = [
        CdcRecord(id=i, ts=1, operation=OperationType.INSERT, db="zdb",
                  tbl="ztbl", transaction_id="t", fields=mini_fields,
                  after=[(ValueKind.CHARACTER, ("utf16", payload))])
        for i, payload in ((21, plain), (22, bom))
    ]
    df = spark.createDataFrame([(encode_record(r),) for r in recs], "value binary")
    jvm = decode_typed_jvm(df, mini_schema, mini_fields, "zdb.ztbl")
    py = _python_typed(df, mini_schema, "zdb.ztbl")
    assert _rows(jvm) == _rows(py)
    vals = {r["record_id"]: r["s"] for r in jvm.collect()}
    assert vals[21] == "Az" and vals[22] == "﻿Az"


def test_jvm_geom_fixture_parity(spark):
    """r9: the geometry zoo (LE/BE/EWKB points, linestring, polygon, torn
    payload; INSERT + DELETE-before-image) decodes bit-equal to the Python
    render-and-cast path, and both match the literal oracle's expectation
    source (wire.wkb_to_wkt)."""
    from flink_dts_connector_spark.sources.zoo import (
        GEOM_DB,
        GEOM_FIELDS,
        GEOM_TBL,
        N_GEOM_COPIES,
        N_GEOM_SHAPES,
        generate_geom_bytes,
    )

    schema = T.StructType(
        [T.StructField("shape_id", T.LongType())]
        + [
            T.StructField(n, T.StringType())
            for n in ("pt", "pt_be", "pt_srid", "path", "ring", "torn")
        ]
    )
    raw = generate_geom_bytes(spark)
    table = f"{GEOM_DB}.{GEOM_TBL}"
    jvm = _rows(decode_typed_jvm(raw, schema, GEOM_FIELDS, table))
    py = _rows(_python_typed(raw, schema, table))
    assert len(jvm) == N_GEOM_SHAPES * N_GEOM_COPIES
    assert jvm == py
    # spot-pin one rendered WKT against the local reference reader
    from flink_dts_connector_spark.formats.wire import wkb_to_wkt
    from flink_dts_connector_spark.sources.zoo import _wkb_point

    texts = {r[3] for r in jvm}  # pt column (ts, record_id, shape_id, pt, ...)
    assert repr(wkb_to_wkt(_wkb_point(3, 3.5))) in texts


def test_jvm_geom_ordinate_fuzz(spark):
    """The SQL WKB renderer matches the Python reader over adversarial
    ordinates: random finite bit patterns, lon/lat ranges, and the
    JDK-4511638 danger zone (m·10^e doubles, where Java 17's Double.toString
    emits non-shortest digits and the roundtrip search must recover repr's
    string). Fixed seed — failures reproduce."""
    import random
    import struct as st

    from flink_dts_connector_spark.formats.jvmvalue import _geom_sql
    from flink_dts_connector_spark.formats.wire import render_value

    rng = random.Random(20260815)
    vals = [0.0, -0.0, 1e23, 9.999999999999999e22, 1e-300, 1e300, 2**53 + 2.0]
    for _ in range(40):
        vals.append(rng.uniform(-180, 180))
        vals.append(float(rng.randrange(1, 10**17)) * 10.0 ** rng.randrange(-20, 20))
        while True:
            v = st.unpack("<d", st.pack("<Q", rng.getrandbits(64)))[0]
            import math

            if math.isfinite(v):
                vals.append(v)
                break
    cases = []
    for k in range(0, len(vals) - 1, 2):
        le = k % 4 == 0
        bo = "<" if le else ">"
        cases.append(
            st.pack(bo + "BI", 1 if le else 0, 1) + st.pack(bo + "dd", vals[k], vals[k + 1])
        )
    expected = [render_value(ValueKind.BINARY_GEOMETRY, c) for c in cases]
    df = spark.createDataFrame(list(zip(range(len(cases)), cases)), "i long, g binary")
    got = {
        r["i"]: r["w"]
        for r in df.select("i", F.expr(_geom_sql("g")).alias("w")).collect()
    }
    mism = [(expected[i], got[i]) for i in range(len(cases)) if expected[i] != got[i]]
    assert not mism, mism[:3]


def test_jvm_geom_plan_python_free(spark, tmp_path):
    """The geometry decode subtree over materialized bytes carries no
    Python eval node — WKT rendering is pure column expressions."""
    from flink_dts_connector_spark.sources.zoo import (
        GEOM_DB,
        GEOM_FIELDS,
        GEOM_TBL,
        _geom_record,
    )

    blobs = [encode_record(_geom_record(i)) for i in range(8)]
    p = str(tmp_path / "geomraw")
    spark.createDataFrame([(b,) for b in blobs], "value binary").write.parquet(p)
    raw = spark.read.parquet(p)
    full_schema = T.StructType(
        [T.StructField("shape_id", T.LongType())]
        + [
            T.StructField(n, T.StringType())
            for n in ("pt", "pt_be", "pt_srid", "path", "ring", "torn")
        ]
    )
    out = decode_typed_jvm(raw, full_schema, GEOM_FIELDS, f"{GEOM_DB}.{GEOM_TBL}")
    agg = out.groupBy().agg(F.count(F.lit(1)).alias("n"), F.max("ring").alias("m"))
    jvm = spark._jvm
    plan = agg._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan and "PythonMapInArrow" not in plan
    row = agg.collect()[0]
    assert row["n"] == 8 and row["m"].startswith("POLYGON ((")
