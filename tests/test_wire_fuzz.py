"""Property-based wire-codec checks (hypothesis): round-trip holds for
arbitrary records, and corrupt buffers never decode silently."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from flink_dts_connector_spark.datamodel.envelope import (
    ObjectType,
    OperationType,
    SourceType,
    ValueKind,
)
from flink_dts_connector_spark.formats.wire import (
    CdcRecord,
    FieldDef,
    decode_record,
    encode_record,
)

_name = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x24F),
    min_size=1,
    max_size=12,
)

_value = st.one_of(
    st.just((ValueKind.NULL, None)),
    st.just((ValueKind.EMPTY, None)),
    st.integers(min_value=-(2**80), max_value=2**80).map(lambda i: (ValueKind.INTEGER, i)),
    st.tuples(st.sampled_from(["utf8", "utf8mb4", "latin1", "gbk", "nope"]), st.binary(max_size=40)).map(
        lambda t: (ValueKind.CHARACTER, t)
    ),
    st.text(max_size=30).map(lambda s: (ValueKind.DECIMAL, s)),
    st.floats(allow_nan=False).map(lambda f: (ValueKind.FLOAT, f)),
    st.tuples(st.integers(-(2**40), 2**40), st.integers(0, 999_999)).map(
        lambda t: (ValueKind.TIMESTAMP, t)
    ),
    st.fixed_dictionaries(
        {"y": st.integers(0, 9999), "mo": st.integers(0, 12), "d": st.integers(0, 31)}
    ).map(lambda d: (ValueKind.DATETIME, d)),
    st.binary(max_size=40).map(lambda b: (ValueKind.BINARY_GEOMETRY, b)),
    st.text(max_size=30).map(lambda s: (ValueKind.TEXT_GEOMETRY, s)),
    st.tuples(st.sampled_from(list(ObjectType)), st.binary(max_size=40)).map(
        lambda t: (ValueKind.BINARY_OBJECT, t)
    ),
    st.tuples(st.sampled_from(list(ObjectType)), st.text(max_size=30)).map(
        lambda t: (ValueKind.TEXT_OBJECT, t)
    ),
)


@st.composite
def _records(draw):
    n_fields = draw(st.integers(0, 6))
    fields = [FieldDef(draw(_name), "T", i) for i in range(n_fields)]
    image = lambda: [draw(_value) for _ in range(n_fields)]  # noqa: E731
    has_before, has_after = draw(st.booleans()), draw(st.booleans())
    return CdcRecord(
        id=draw(st.integers(0, 2**62)),
        ts=draw(st.integers(0, 2**34)),
        operation=draw(st.sampled_from(list(OperationType)[:17])),
        db=draw(_name),
        tbl=draw(_name),
        transaction_id=draw(st.none() | _name),
        born_ts=draw(st.none() | st.integers(0, 2**34)),
        source_type=draw(st.sampled_from(list(SourceType))),
        tags=draw(st.dictionaries(_name, _name, max_size=3)),
        fields=fields,
        before=image() if has_before else None,
        after=image() if has_after else None,
    )


@settings(max_examples=200, deadline=None)
@given(_records())
def test_roundtrip_arbitrary_records(rec):
    back = decode_record(encode_record(rec))
    assert back.id == rec.id and back.ts == rec.ts
    assert back.operation is rec.operation and back.source_type is rec.source_type
    assert back.db == rec.db and back.tbl == rec.tbl
    assert back.transaction_id == rec.transaction_id
    assert back.born_ts == (rec.born_ts if rec.born_ts is not None else rec.ts)
    assert back.tags == rec.tags
    assert [f.name for f in back.fields] == [f.name for f in rec.fields]
    assert back.before == rec.before
    assert back.after == rec.after


@settings(max_examples=200, deadline=None)
@given(_records(), st.integers(min_value=1, max_value=20))
def test_truncation_never_decodes_silently(rec, cut):
    data = encode_record(rec)
    if cut >= len(data):
        return
    try:
        decode_record(data[:-cut])
    except Exception:
        pass  # any loud failure is correct
    else:
        raise AssertionError("torn record decoded without error")
