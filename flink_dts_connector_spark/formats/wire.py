"""Binary CDC wire codec: Avro-binary-style encoding with two-phase laziness.

The reference consumes Alibaba DTS records as hand-decoded Avro binary
(`impl/LazyRecordDeserializer.java:262-340`): a header (id/ts/op/table/tags)
cheap to parse, and a payload (field defs + before/after row images over a
13-branch value union) that is only parsed when images are touched
(`impl/LazyParseRecordImpl.java:53-84`). Records filtered out by op-type or
table never pay payload cost
(`DTSSubscribeRowDataDeserializationSchema.java:68-74`).

This module defines an equivalent self-describing format (we do not have the
proprietary wire schema, so this is our own layout with the same information
content and the same laziness property):

    record   := MAGIC(0xD7) version(u8) header payload
    header   := id:zlong txid:str ts:zlong born_ts:opt[zlong] op:zint
                source_type:zint source_version:str db:str tbl:str
                tags:map<str,str> payload_len:zlong
    payload  := nfields:zint field* before:opt[image] after:opt[image]
    field    := name:str type_name:str type_id:zint nullable:u8 encoding:str
    image    := value*  (one value per field, in field order)
    value    := kind:zint kind-specific-bytes   (ValueKind, SURVEY.md §1.3)

zlong/zint are zigzag varints (public Avro binary primitives); str is
len-prefixed UTF-8; opt is a 0/1 union tag. `payload_len` lets the header
decoder skip the payload entirely — that is the lazy two-phase contract.

PK/UK membership travels in the `pk_uk_info` tag as JSON, exactly like the
reference (`impl/LazyRecordDeserializer.java:404-428`).
"""

from __future__ import annotations

import datetime as dt
import json
from dataclasses import dataclass, field as dc_field
from typing import Any

from flink_dts_connector_spark.datamodel.envelope import (
    ObjectType,
    OperationType,
    SourceType,
    ValueKind,
    resolve_charset,
)

MAGIC = 0xD7
#: v2 appends schema/source_position/source_safe_position/trans_seq to the
#: header (reference parity: `LazyRecordDeserializer.java:268-272` reads
#: sourcePosition/sourceSafePosition, `deserializeNameTriple` the 3-part
#: object name). v1 records (no such fields) still decode.
VERSION = 2

# ---------------------------------------------------------------------------
# varint primitives (Avro binary zigzag encoding — public format)
# ---------------------------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1


def write_long(buf: bytearray, n: int) -> None:
    z = (n << 1) ^ (n >> 63)
    z &= (1 << 64) - 1
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            break


def read_long(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def write_str(buf: bytearray, s: str | None) -> None:
    if s is None:
        write_long(buf, -1)
        return
    raw = s.encode("utf-8")
    write_long(buf, len(raw))
    buf += raw


def read_str(data: bytes, pos: int) -> tuple[str | None, int]:
    n, pos = read_long(data, pos)
    if n < 0:
        return None, pos
    return data[pos : pos + n].decode("utf-8"), pos + n


def write_bytes(buf: bytearray, b: bytes | None) -> None:
    if b is None:
        write_long(buf, -1)
        return
    write_long(buf, len(b))
    buf += b


def read_bytes(data: bytes, pos: int) -> tuple[bytes | None, int]:
    n, pos = read_long(data, pos)
    if n < 0:
        return None, pos
    return bytes(data[pos : pos + n]), pos + n


# ---------------------------------------------------------------------------
# Value union: encode/decode + string rendering (generic-layer MAP values)
# ---------------------------------------------------------------------------

_DT_SEG_YEAR, _DT_SEG_MONTH, _DT_SEG_DAY = 1, 2, 4
_DT_SEG_TIME, _DT_SEG_NANOS, _DT_SEG_TZ = 8, 16, 32


def encode_value(buf: bytearray, kind: ValueKind, payload: Any) -> None:
    write_long(buf, int(kind))
    if kind in (ValueKind.NULL, ValueKind.EMPTY):
        return
    if kind == ValueKind.INTEGER:
        write_str(buf, str(payload))  # arbitrary precision, digits text
    elif kind == ValueKind.CHARACTER:
        charset, raw = payload  # (charset_name, bytes)
        write_str(buf, charset)
        write_bytes(buf, raw)
    elif kind == ValueKind.DECIMAL:
        write_str(buf, payload)  # decimal text incl. NaN/Infinity/'~'
    elif kind == ValueKind.FLOAT:
        import struct

        buf += struct.pack(">d", float(payload))
    elif kind == ValueKind.TIMESTAMP:
        sec, micros = payload
        write_long(buf, sec)
        write_long(buf, micros)
    elif kind in (ValueKind.DATETIME, ValueKind.TIMESTAMP_TZ):
        segs = payload  # dict with optional y/mo/d/h/mi/s/ns/tz
        bitmap = 0
        if "y" in segs:
            bitmap |= _DT_SEG_YEAR
        if "mo" in segs:
            bitmap |= _DT_SEG_MONTH
        if "d" in segs:
            bitmap |= _DT_SEG_DAY
        if "h" in segs:
            bitmap |= _DT_SEG_TIME
        if "ns" in segs:
            bitmap |= _DT_SEG_NANOS
        if "tz" in segs:
            bitmap |= _DT_SEG_TZ
        write_long(buf, bitmap)
        if bitmap & _DT_SEG_YEAR:
            write_long(buf, segs["y"])
        if bitmap & _DT_SEG_MONTH:
            write_long(buf, segs["mo"])
        if bitmap & _DT_SEG_DAY:
            write_long(buf, segs["d"])
        if bitmap & _DT_SEG_TIME:
            write_long(buf, segs["h"])
            write_long(buf, segs["mi"])
            write_long(buf, segs["s"])
        if bitmap & _DT_SEG_NANOS:
            write_long(buf, segs["ns"])
        if bitmap & _DT_SEG_TZ:
            write_str(buf, segs["tz"])
    elif kind == ValueKind.BINARY_GEOMETRY:
        write_bytes(buf, payload)
    elif kind == ValueKind.TEXT_GEOMETRY:
        write_str(buf, payload)
    elif kind == ValueKind.BINARY_OBJECT:
        otype, raw = payload
        write_long(buf, int(otype))
        write_bytes(buf, raw)
    elif kind == ValueKind.TEXT_OBJECT:
        otype, text = payload
        write_long(buf, int(otype))
        write_str(buf, text)
    elif kind == ValueKind.BIT:
        write_bytes(buf, payload)
    else:  # pragma: no cover
        raise ValueError(f"unknown value kind {kind}")


_VALUE_KINDS = list(ValueKind)  # index == wire code; avoids Enum.__call__ per value


def decode_value(data: bytes, pos: int) -> tuple[tuple[ValueKind, Any], int]:
    k, pos = read_long(data, pos)
    kind = _VALUE_KINDS[k] if 0 <= k < len(_VALUE_KINDS) else ValueKind(k)
    if kind in (ValueKind.NULL, ValueKind.EMPTY):
        return (kind, None), pos
    if kind == ValueKind.INTEGER:
        s, pos = read_str(data, pos)
        return (kind, int(s)), pos
    if kind == ValueKind.CHARACTER:
        charset, pos = read_str(data, pos)
        raw, pos = read_bytes(data, pos)
        return (kind, (charset, raw)), pos
    if kind == ValueKind.DECIMAL:
        s, pos = read_str(data, pos)
        return (kind, s), pos
    if kind == ValueKind.FLOAT:
        import struct

        (v,) = struct.unpack_from(">d", data, pos)
        return (kind, v), pos + 8
    if kind == ValueKind.TIMESTAMP:
        sec, pos = read_long(data, pos)
        micros, pos = read_long(data, pos)
        return (kind, (sec, micros)), pos
    if kind in (ValueKind.DATETIME, ValueKind.TIMESTAMP_TZ):
        bitmap, pos = read_long(data, pos)
        segs: dict[str, Any] = {}
        if bitmap & _DT_SEG_YEAR:
            segs["y"], pos = read_long(data, pos)
        if bitmap & _DT_SEG_MONTH:
            segs["mo"], pos = read_long(data, pos)
        if bitmap & _DT_SEG_DAY:
            segs["d"], pos = read_long(data, pos)
        if bitmap & _DT_SEG_TIME:
            segs["h"], pos = read_long(data, pos)
            segs["mi"], pos = read_long(data, pos)
            segs["s"], pos = read_long(data, pos)
        if bitmap & _DT_SEG_NANOS:
            segs["ns"], pos = read_long(data, pos)
        if bitmap & _DT_SEG_TZ:
            segs["tz"], pos = read_str(data, pos)
        return (kind, segs), pos
    if kind == ValueKind.BINARY_GEOMETRY:
        raw, pos = read_bytes(data, pos)
        return (kind, raw), pos
    if kind == ValueKind.TEXT_GEOMETRY:
        s, pos = read_str(data, pos)
        return (kind, s), pos
    if kind == ValueKind.BINARY_OBJECT:
        ot, pos = read_long(data, pos)
        raw, pos = read_bytes(data, pos)
        return (kind, (ObjectType(ot), raw)), pos
    if kind == ValueKind.TEXT_OBJECT:
        ot, pos = read_long(data, pos)
        s, pos = read_str(data, pos)
        return (kind, (ObjectType(ot), s)), pos
    if kind == ValueKind.BIT:
        raw, pos = read_bytes(data, pos)
        return (kind, raw), pos
    raise ValueError(f"unknown value kind {k}")  # pragma: no cover


def _wkt_num(v: float) -> str:
    """Ordinate formatting matching JTS WKTWriter: no trailing '.0' on whole
    numbers, plain positional decimal otherwise — never scientific notation,
    which repr() would produce for |v| ≥ 1e16 or < 1e-4. Digits are the
    SHORTEST-roundtrip digit string positionally expanded (zero-padded),
    exactly like JTS's DecimalFormat over Double.toString — NOT str(int(v))'s
    exact binary expansion, which diverges from JTS for whole |v| > 2^53
    (e.g. 1e300 renders '1' + 300 zeros, not the 5250476... exact digits).
    The JVM typed path (`jvmvalue._wkt_num_sql`) implements the same rule in
    column expressions; the two must stay bit-identical."""
    import math

    if math.isfinite(v) and v == int(v) and abs(v) < 2**53:
        return str(int(v))  # fast path: exact == shortest-padded here
    s = repr(v)
    if "e" in s or "E" in s:
        from decimal import Decimal

        s = format(Decimal(s), "f")
    if "." in s:
        s = s.rstrip("0").rstrip(".")
    return s or "0"


def wkb_to_wkt(data: bytes) -> str:
    """Pure-Python WKB → WKT for POINT/LINESTRING/POLYGON (both byte orders,
    optional EWKB SRID flag) — the cases the reference renders via JTS
    (`common/GeometryUtil.java:14-22`, `value/WKBGeometry.java:42-48`).
    Raises ValueError on anything else; the caller hex-falls-back exactly
    like `WKBGeometry.toString()`'s ParseException catch."""
    import struct

    def parse_geom(pos: int) -> tuple[str, int]:
        bo = "<" if data[pos] == 1 else ">"
        (type_word,) = struct.unpack_from(bo + "I", data, pos + 1)
        pos += 5
        if type_word & 0x20000000:  # EWKB SRID present — skip it
            pos += 4
        gtype = type_word & 0xFF
        if type_word & ~0x200000FF:  # Z/M flags etc. unsupported
            raise ValueError(f"unsupported WKB type word {type_word:#x}")

        def read_pt(p: int) -> tuple[str, int]:
            x, y = struct.unpack_from(bo + "dd", data, p)
            return f"{_wkt_num(x)} {_wkt_num(y)}", p + 16

        def read_ring(p: int) -> tuple[str, int]:
            (n,) = struct.unpack_from(bo + "I", data, p)
            p += 4
            pts = []
            for _ in range(n):
                s, p = read_pt(p)
                pts.append(s)
            return "(" + ", ".join(pts) + ")", p

        if gtype == 1:  # POINT
            s, pos = read_pt(pos)
            return f"POINT ({s})", pos
        if gtype == 2:  # LINESTRING
            s, pos = read_ring(pos)
            return f"LINESTRING {s}", pos
        if gtype == 3:  # POLYGON
            (nrings,) = struct.unpack_from(bo + "I", data, pos)
            pos += 4
            rings = []
            for _ in range(nrings):
                s, pos = read_ring(pos)
                rings.append(s)
            return "POLYGON (" + ", ".join(rings) + ")", pos
        raise ValueError(f"unsupported WKB geometry type {gtype}")

    wkt, end = parse_geom(0)
    if end != len(data):
        raise ValueError(f"trailing bytes after geometry: {len(data) - end}")
    return wkt


def render_value(kind: ValueKind, payload: Any) -> str | None:
    """Generic-layer string rendering of a decoded value — the MAP<STRING,
    STRING> image cell. Mirrors the reference's Value.toString() semantics
    (charset decode w/ hex fallback `value/StringValue.java:50-73`, zero-date
    guard `value/DateTime.java:473-482`, NaN/Inf decimal text
    `value/SpecialNumeric.java:42-82`)."""
    if kind in (ValueKind.NULL, ValueKind.EMPTY):
        return None
    if kind == ValueKind.INTEGER:
        return str(payload)
    if kind == ValueKind.CHARACTER:
        charset, raw = payload
        if raw is None:
            return None
        if not charset:  # missing charset → bare hex (StringValue.java:53-55)
            return raw.hex()
        codec = resolve_charset(charset)
        if codec is not None:
            # Java's `new String(bytes, charset)` (StringValue.java:64-66)
            # never throws — malformed sequences become U+FFFD. Mirror that:
            # a resolvable charset always decodes (errors="replace"); the
            # hex fallback below is only for unresolvable charset names
            # (the Charset.forName failure path, StringValue.java:70-72).
            return raw.decode(codec, errors="replace")
        return f"{charset}_'{raw.hex()}'"
    if kind == ValueKind.DECIMAL:
        return payload  # text, incl. special forms
    if kind == ValueKind.FLOAT:
        return repr(payload)
    if kind == ValueKind.TIMESTAMP:
        sec, micros = payload
        base = dt.datetime.fromtimestamp(sec, dt.timezone.utc).replace(tzinfo=None)
        base += dt.timedelta(microseconds=micros)
        return base.isoformat(sep=" ")
    if kind in (ValueKind.DATETIME, ValueKind.TIMESTAMP_TZ):
        segs = payload
        y, mo, d = segs.get("y"), segs.get("mo"), segs.get("d")
        if y == 0 or mo == 0 or d == 0:
            return None  # zero-date → null (documented divergence: flag, not raise)
        parts = []
        if y is not None:
            parts.append(f"{y:04d}")
            if mo is not None:
                parts[-1] += f"-{mo:02d}"
                if d is not None:
                    parts[-1] += f"-{d:02d}"
        if "h" in segs:
            frac = ""
            if "ns" in segs:
                frac = f".{segs['ns'] // 1000:06d}"
            parts.append(f"{segs['h']:02d}:{segs['mi']:02d}:{segs['s']:02d}{frac}")
        out = " ".join(parts)
        if "tz" in segs:
            out += f" {segs['tz']}"
        return out
    if kind == ValueKind.BINARY_GEOMETRY:
        if payload is None:
            return None
        try:
            return wkb_to_wkt(payload)
        except Exception:  # torn/unsupported WKB
            return payload.hex()  # WKBGeometry.toString ParseException → hex
    if kind == ValueKind.TEXT_GEOMETRY:
        return payload
    if kind == ValueKind.BINARY_OBJECT:
        _, raw = payload
        return raw.hex() if raw is not None else None
    if kind == ValueKind.TEXT_OBJECT:
        _, text = payload
        return text
    if kind == ValueKind.BIT:
        # BitValue.toString: UTF-8 decode of the bit bytes (BitValue.java:31-38)
        return payload.decode("utf-8", errors="replace") if payload is not None else None
    raise ValueError(f"unknown value kind {kind}")  # pragma: no cover


# ---------------------------------------------------------------------------
# Record codec
# ---------------------------------------------------------------------------


@dataclass
class FieldDef:
    name: str
    type_name: str = "VARCHAR"
    type_id: int = 0
    nullable: bool = True
    encoding: str = "utf8"


@dataclass
class CdcRecord:
    id: int
    ts: int  # commit epoch seconds
    operation: OperationType
    db: str
    tbl: str
    transaction_id: str | None = None
    born_ts: int | None = None  # falls back to ts when absent
    source_type: SourceType = SourceType.MySQL
    source_version: str = "5.7.0"
    tags: dict[str, str] = dc_field(default_factory=dict)
    fields: list[FieldDef] = dc_field(default_factory=list)
    before: list[tuple[ValueKind, Any]] | None = None
    after: list[tuple[ValueKind, Any]] | None = None
    # v2 header fields (LazyParseRecordImpl.java:26-27,96-97; DtsRecord.java:84-90)
    schema: str | None = None  # 3-part middle (SQLServer/PG); None = 2-part name
    source_position: str | None = None  # binlog/LSN position string
    source_safe_position: str | None = None
    trans_seq: int = 0  # record's sequence number within its transaction

    @property
    def pk_cols(self) -> list[str]:
        info = self.tags.get("pk_uk_info")
        if not info:
            return []
        return list(json.loads(info).get("PRIMARY", []))


def encode_record(rec: CdcRecord) -> bytes:
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
            assert len(image) == len(rec.fields), "image arity != field count"
            for kind, pv in image:
                encode_value(payload, kind, pv)

    buf = bytearray([MAGIC, VERSION])
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
    # v2 additions (kept after db/tbl so v1 layouts prefix-match)
    write_str(buf, rec.schema)
    write_str(buf, rec.source_position)
    write_str(buf, rec.source_safe_position)
    write_long(buf, rec.trans_seq)
    write_long(buf, len(rec.tags))
    for k in sorted(rec.tags):
        write_str(buf, k)
        write_str(buf, rec.tags[k])
    write_long(buf, len(payload))
    buf += payload
    return bytes(buf)


_OP_TYPES = list(OperationType)
_SRC_TYPES = list(SourceType)


@dataclass
class Header:
    """Phase-1 decode result: everything except field defs and images.

    `payload_pos` marks where the payload starts; phase 2 resumes there —
    records dropped by op/table filters never touch payload bytes (the
    reference's laziness contract, `LazyParseRecordImpl.java:53-84`).
    """

    id: int
    transaction_id: str | None
    ts: int
    born_ts: int
    operation: OperationType
    source_type: SourceType
    source_version: str | None
    db: str | None
    tbl: str | None
    tags: dict[str, str]
    payload_pos: int
    payload_len: int
    schema: str | None = None
    source_position: str | None = None
    source_safe_position: str | None = None
    trans_seq: int = 0

    def checkpoint(self) -> str:
        """Record-level checkpoint string `"0@idLow31@sourcePosition@tsMillis"`
        (`impl/LazyParseRecordImpl.java:199-209`; id truncated to the low 31
        bits for writer-2.0 compatibility, null position renders 'null' like
        Java's String.join)."""
        pos = self.source_position if self.source_position is not None else "null"
        return f"0@{self.id & 0x7FFFFFFF}@{pos}@{self.ts * 1000}"


def decode_header(data: bytes) -> Header:
    if data[0] != MAGIC or data[1] not in (1, VERSION):
        raise ValueError(f"bad magic/version: {data[:2].hex()}")
    version = data[1]
    pos = 2
    rid, pos = read_long(data, pos)
    txid, pos = read_str(data, pos)
    ts, pos = read_long(data, pos)
    has_born = data[pos]
    pos += 1
    if has_born:
        born, pos = read_long(data, pos)
    else:
        born = ts  # born falls back to commit ts (LazyParseRecordImpl.java:258-267)
    opc, pos = read_long(data, pos)
    stc, pos = read_long(data, pos)
    sv, pos = read_str(data, pos)
    db, pos = read_str(data, pos)
    tbl, pos = read_str(data, pos)
    schema: str | None = None
    src_pos: str | None = None
    safe_pos: str | None = None
    trans_seq = 0
    if version >= 2:
        schema, pos = read_str(data, pos)
        src_pos, pos = read_str(data, pos)
        safe_pos, pos = read_str(data, pos)
        trans_seq, pos = read_long(data, pos)
    ntags, pos = read_long(data, pos)
    tags = {}
    for _ in range(ntags):
        k, pos = read_str(data, pos)
        v, pos = read_str(data, pos)
        tags[k] = v
    plen, pos = read_long(data, pos)
    if pos + plen != len(data):
        # Python slicing doesn't bounds-check; without this, a torn record
        # would "decode" into truncated garbage instead of failing loudly.
        raise ValueError(
            f"truncated/oversized record: declared payload {plen}B at {pos}, buffer {len(data)}B"
        )
    op = _OP_TYPES[opc] if 0 <= opc < len(_OP_TYPES) else OperationType(opc)
    st = _SRC_TYPES[stc] if 0 <= stc < len(_SRC_TYPES) else SourceType(stc)
    return Header(
        rid, txid, ts, born, op, st, sv, db, tbl, tags, pos, plen,
        schema=schema, source_position=src_pos, source_safe_position=safe_pos,
        trans_seq=trans_seq,
    )


def render_object_names(
    source_type: SourceType, db: str | None, schema: str | None, tbl: str | None
) -> tuple[str | None, str | None, str | None]:
    """(db, schema_name, tbl) as the reference surfaces them.

    `deserializeNameTriple` (`LazyRecordDeserializer.java:346-365`) defaults
    the schema to the db for 2-part names; SQLServer sources get the bracket
    convention — db `[db]`, table `[schema].[tbl]` — so the full qualified
    name is `[db].[schema].[tbl]` (`LazyRecordDeserializer.java:292-306`).
    """
    if tbl is None or tbl == "":
        return db, schema, tbl
    eff_schema = schema if schema is not None else db
    if source_type == SourceType.SQLServer:
        return f"[{db}]", eff_schema, f"[{eff_schema}].[{tbl}]"
    return db, eff_schema, tbl


def decode_payload(
    data: bytes, header: Header, fielddef_cache: dict | None = None
) -> tuple[list[FieldDef], list | None, list | None]:
    """``fielddef_cache``: single-slot cache (dict) reused across records of
    a batch. CDC streams repeat one schema per table, so after the first
    record the field-def section is recognized by byte equality (one slice
    compare) instead of re-parsed — it is ~half the per-record string reads.
    """
    pos = header.payload_pos
    entries = fielddef_cache.setdefault("entries", []) if fielddef_cache is not None else None
    if entries:
        for cb, cl, flds in entries:  # a batch sees a handful of schemas at most
            if data[pos : pos + cl] == cb:
                return _decode_images(data, pos + cl, flds)
    def_start = pos
    nfields, pos = read_long(data, pos)
    fields = []
    for _ in range(nfields):
        name, pos = read_str(data, pos)
        tname, pos = read_str(data, pos)
        tid, pos = read_long(data, pos)
        nullable = bool(data[pos])
        pos += 1
        enc, pos = read_str(data, pos)
        fields.append(FieldDef(name, tname, tid, nullable, enc))
    if entries is not None and len(entries) < 64:
        entries.append((bytes(data[def_start:pos]), pos - def_start, fields))
    return _decode_images(data, pos, fields)


def _decode_images(
    data: bytes, pos: int, fields: list[FieldDef]
) -> tuple[list[FieldDef], list | None, list | None]:
    nfields = len(fields)
    images: list[list | None] = []
    for _ in range(2):
        present = data[pos]
        pos += 1
        if not present:
            images.append(None)
            continue
        vals = []
        for _ in range(nfields):
            v, pos = decode_value(data, pos)
            vals.append(v)
        images.append(vals)
    return fields, images[0], images[1]


def decode_record(data: bytes) -> CdcRecord:
    """Full (header + payload) decode — the non-lazy path, used by tests."""
    h = decode_header(data)
    fields, before, after = decode_payload(data, h)
    return CdcRecord(
        id=h.id,
        ts=h.ts,
        operation=h.operation,
        db=h.db or "",
        tbl=h.tbl or "",
        transaction_id=h.transaction_id,
        born_ts=h.born_ts,
        source_type=h.source_type,
        source_version=h.source_version or "",
        tags=h.tags,
        fields=fields,
        before=before,
        after=after,
        schema=h.schema,
        source_position=h.source_position,
        source_safe_position=h.source_safe_position,
        trans_seq=h.trans_seq,
    )
