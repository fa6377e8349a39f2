"""JVM header decode (`formats/jvmheader.py`): bit-parity with the Python
header decoder, v1/v2 layouts, poison pills, and the conservative-keep
prefilter contract (logical-rename tags must never be dropped)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flink_dts_connector_spark.datamodel.envelope import (
    OperationType,
    SourceType,
    ValueKind,
)
from flink_dts_connector_spark.formats.jvmheader import (
    prefilter,
    with_jvm_header,
)
from flink_dts_connector_spark.formats.wire import (
    CdcRecord,
    FieldDef,
    decode_header,
    encode_record,
    write_long,
    write_str,
)
from tests.conftest import SF_DIR


def _hdr_tuple(r):
    return (
        r["hdr_valid"], r["hdr_complete"], r["hdr_id"], r["hdr_ts"],
        r["hdr_born_ts"], r["hdr_op"], r["hdr_source_type"], r["hdr_db"],
        r["hdr_tbl"], r["hdr_schema"], r["hdr_source_position"],
        r["hdr_trans_seq"], r["hdr_has_tags"], r["hdr_checkpoint"],
    )


def _expected(h):
    return (
        True, True, h.id, h.ts, h.born_ts, h.operation.name,
        h.source_type.name, h.db, h.tbl, h.schema, h.source_position,
        h.trans_seq, bool(h.tags), h.checkpoint(),
    )


def test_jvm_header_parity_generator(spark):
    """Every generated record (INSERT/UPDATE/DELETE/HEARTBEAT/DDL — null
    txids, empty db/tbl, v2 positions) header-decodes in the JVM exactly as
    the Python `decode_header` does."""
    from flink_dts_connector_spark.sources.generator import generate_cdc_bytes

    raw = generate_cdc_bytes(spark, SF_DIR)
    rows = with_jvm_header(raw).collect()
    assert len(rows) > 100
    for r in rows:
        assert _hdr_tuple(r) == _expected(decode_header(bytes(r["value"])))


def _mk_record(**kw) -> CdcRecord:
    base = dict(
        id=123456789,
        ts=1_700_000_000,
        operation=OperationType.UPDATE,
        db="mydb",
        tbl="mytbl",
        transaction_id="tx-1",
        source_type=SourceType.MySQL,
        source_version="5.7.0",
        fields=[FieldDef("k", "BIGINT", 8, False)],
        before=[(ValueKind.INTEGER, 1)],
        after=[(ValueKind.INTEGER, 2)],
        source_position="mysql-bin.000009:42",
        trans_seq=3,
    )
    base.update(kw)
    return CdcRecord(**base)


def _encode_v1(rec: CdcRecord) -> bytes:
    """v1 layout: no schema/source_position/safe_position/trans_seq between
    tbl and the tags map (wire.py header comment)."""
    payload = bytearray()
    write_long(payload, len(rec.fields))
    for f in rec.fields:
        write_str(payload, f.name)
        write_str(payload, f.type_name)
        write_long(payload, f.type_id)
        payload.append(1 if f.nullable else 0)
        write_str(payload, f.encoding)
    for image in (rec.before, rec.after):
        if image is None:
            payload.append(0)
        else:
            payload.append(1)
            from flink_dts_connector_spark.formats.wire import encode_value

            for kind, pv in image:
                encode_value(payload, kind, pv)
    buf = bytearray([0xD7, 1])
    write_long(buf, rec.id)
    write_str(buf, rec.transaction_id)
    write_long(buf, rec.ts)
    if rec.born_ts is None:
        buf.append(0)
    else:
        buf.append(1)
        write_long(buf, rec.born_ts)
    write_long(buf, int(rec.operation))
    write_long(buf, int(rec.source_type))
    write_str(buf, rec.source_version)
    write_str(buf, rec.db)
    write_str(buf, rec.tbl)
    write_long(buf, len(rec.tags))
    for k in sorted(rec.tags):
        write_str(buf, k)
        write_str(buf, rec.tags[k])
    write_long(buf, len(payload))
    buf += payload
    return bytes(buf)


def _raw_df(spark, blobs: list[bytes]):
    return spark.createDataFrame([(b,) for b in blobs], "value binary")


def test_jvm_header_edge_records(spark):
    """Hand-built edge cases: v1 layout, negative/huge ids, SQLServer
    3-part names, unicode table names, born_ts explicitly present, no
    images — JVM columns equal the Python header decode for each."""
    recs = [
        _mk_record(id=0, trans_seq=0),
        _mk_record(id=(1 << 62) - 1, born_ts=1_600_000_000),
        _mk_record(
            source_type=SourceType.SQLServer, schema="dbo", db="d", tbl="t"
        ),
        _mk_record(db="db_üml", tbl="täble"),  # multi-byte UTF-8 names
        _mk_record(transaction_id=None, before=None, tags={"a": "b"}),
        _mk_record(operation=OperationType.HEARTBEAT, db="", tbl="", fields=[],
                   before=None, after=None),
    ]
    blobs = [encode_record(r) for r in recs]
    blobs.append(_encode_v1(_mk_record(tags={"x": "y"})))
    rows = with_jvm_header(_raw_df(spark, blobs)).collect()
    assert len(rows) == len(blobs)
    by_val = {bytes(r["value"]): r for r in rows}
    for b in blobs:
        assert _hdr_tuple(by_val[b]) == _expected(decode_header(b))
    v1_row = by_val[blobs[-1]]
    assert v1_row["hdr_version"] == 1 and v1_row["hdr_source_position"] is None


def test_jvm_header_poison_pill(spark):
    """Foreign bytes surface as hdr_valid = false instead of erroring."""
    rows = (
        with_jvm_header(_raw_df(spark, [b"\x00garbage", b"\xd7\x63nope", b"{}"]))
        .select("hdr_valid")
        .collect()
    )
    assert [r["hdr_valid"] for r in rows] == [False, False, False]


def test_prefilter_keeps_logical_renames(spark):
    """A record physically named other.t but logically renamed INTO the
    selection via l_db_name/l_tb_name tags MUST survive the JVM prefilter
    (conservative-keep), and the exact Python filter then selects it; a
    plain record of another table is dropped JVM-side."""
    from flink_dts_connector_spark.formats.decoder import decode_cdc_prefiltered

    wanted = _mk_record(id=1)
    renamed = _mk_record(
        id=2, db="other", tbl="t",
        tags={"l_db_name": "mydb", "l_tb_name": "mytbl"},
    )
    unrelated = _mk_record(id=3, db="other", tbl="t2")
    df = _raw_df(spark, [encode_record(r) for r in (wanted, renamed, unrelated)])

    pre = prefilter(df, tables=["mydb.mytbl"], ops=["UPDATE"])
    kept_ids = sorted(
        decode_header(bytes(r["value"])).id for r in pre.collect()
    )
    assert 1 in kept_ids and 2 in kept_ids and 3 not in kept_ids

    env = decode_cdc_prefiltered(df, tables=["mydb.mytbl"], ops=["UPDATE"])
    assert sorted(r["id"] for r in env.select("id").collect()) == [1, 2]


def test_prefilter_invalid_handling(spark):
    """Poison pills pass through by default (decode's on_error contract
    still owns them); drop_invalid=True removes them JVM-side."""
    blobs = [encode_record(_mk_record(id=7)), b"\x00junk"]
    df = _raw_df(spark, blobs)
    assert prefilter(df, ops=["UPDATE"]).count() == 2
    assert prefilter(df, ops=["UPDATE"], drop_invalid=True).count() == 1


def test_prefilter_null_tombstone(spark):
    """ADVICE r7 (medium): a NULL value (Kafka tombstone) must follow the
    conservative-keep path — _valid_sql(NULL) is NULL, and before the fix
    the CASE fell through to the fold, which yielded NULL and where()
    silently dropped the row even with drop_invalid=False."""
    good = encode_record(_mk_record(id=5))
    df = spark.createDataFrame([(good,), (None,)], "value binary")
    # no table filter, with table filter, with op filter — every shape keeps
    # the tombstone by default and drops it only under drop_invalid=True
    for kw in (
        {},
        {"tables": ["mydb.mytbl"]},
        {"ops": ["UPDATE"]},
        {"tables": ["mydb.mytbl"], "ops": ["UPDATE"]},
    ):
        kept = prefilter(df, **kw).collect()
        assert len(kept) == 2, f"tombstone dropped for {kw}"
        assert any(r["value"] is None for r in kept)
        dropped = prefilter(df, drop_invalid=True, **kw).collect()
        assert len(dropped) == 1 and dropped[0]["value"] is not None


def _long_name_record() -> bytes:
    """A real record whose db/tbl names push the header past
    MAX_HEADER_BYTES=192 — every field is valid wire, the fold just runs
    out of budget (hdr_complete = false)."""
    return encode_record(
        _mk_record(db="db_" + "x" * 120, tbl="tbl_" + "y" * 120)
    )


def test_prefilter_incomplete_header_kept(spark):
    """ADVICE r7: the hdr_complete=false conservative-keep branch — a
    header longer than MAX_HEADER_BYTES and a header truncated mid-varint
    both parse incomplete (never invalid) and MUST be kept even when their
    names don't match the table filter."""
    from flink_dts_connector_spark.formats.jvmheader import MAX_HEADER_BYTES

    long_hdr = _long_name_record()
    # truncate a valid record mid-varint: cut inside the multi-byte id
    # varint (id chosen so its zigzag-varint spans >= 2 bytes)
    whole = encode_record(_mk_record(id=123456789))
    torn = whole[:4]  # magic + version + 2 bytes of the id varint
    df = _raw_df(spark, [long_hdr, torn])

    hdr = with_jvm_header(df).collect()
    by_len = {len(bytes(r["value"])): r for r in hdr}
    lr, tr = by_len[len(long_hdr)], by_len[len(torn)]
    assert len(long_hdr) > MAX_HEADER_BYTES
    assert lr["hdr_valid"] and not lr["hdr_complete"]
    assert tr["hdr_valid"] and not tr["hdr_complete"]

    # both survive a table filter that matches neither name — the
    # never-false-drop contract's one unreachable-by-fixture branch.
    # (tier-1 contains() would cut the torn record, so pick names whose
    # bytes appear in it: 'mydb'/'mytbl' are absent from torn[:4], so use
    # a no-tier1 shape — a bracketed name disables the contains() tier.)
    kept = prefilter(df, tables=["[some].[other].[name]"], ops=["UPDATE"])
    assert kept.count() == 2


def test_prefilter_plan_is_python_free(spark, tmp_path):
    """The pre-filter subtree over a materialized raw frame (scan → header
    expressions → filter → agg) contains no Python eval node — the JVM-only
    contract the whole module exists for."""
    blobs = [encode_record(_mk_record(id=i)) for i in range(10)]
    p = str(tmp_path / "raw")
    _raw_df(spark, blobs).write.parquet(p)
    raw = spark.read.parquet(p)
    agg = (
        prefilter(raw, tables=["mydb.mytbl"], ops=["UPDATE", "DELETE"])
        .groupBy()
        .count()
    )
    jvm = spark._jvm
    plan = agg._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan and "PythonMapInArrow" not in plan
    assert agg.collect()[0]["count"] == 10


def test_hll_estimate_m_guard():
    """ADVICE r6: m large enough to overflow the int64 numerator must raise
    instead of silently overflowing in the generated SQL."""
    from flink_dts_connector_spark.operators.sketch import hll_estimate

    with pytest.raises(ValueError, match="overflows"):
        hll_estimate(None, m=2048)
