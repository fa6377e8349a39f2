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


def _wkb_point(x: float, y: float) -> bytes:
    import struct

    return struct.pack("<BIdd", 1, 1, x, y)


def _wkb_linestring(pts: list[tuple[float, float]]) -> bytes:
    import struct

    out = struct.pack("<BII", 1, 2, len(pts))
    for x, y in pts:
        out += struct.pack("<dd", x, y)
    return out


def _wkb_polygon(rings: list[list[tuple[float, float]]]) -> bytes:
    import struct

    out = struct.pack("<BII", 1, 3, len(rings))
    for ring in rings:
        out += struct.pack("<I", len(ring))
        for x, y in ring:
            out += struct.pack("<dd", x, y)
    return out


_POLY_RING = [(30, 10), (40, 40), (20, 40), (10, 20), (30, 10)]

#: (field name, value kind, wire payload, expected rendered string | None)
ZOO_CASES = [
    ("c_long_min", ValueKind.INTEGER, -(2**63), str(-(2**63))),
    ("c_big_integer", ValueKind.INTEGER, 2**70 + 7, str(2**70 + 7)),
    ("c_utf8", ValueKind.CHARACTER, ("utf8mb4", "héllo 🎉".encode()), "héllo 🎉"),
    ("c_gbk", ValueKind.CHARACTER, ("gbk", "中文".encode("gbk")), "中文"),
    ("c_latin1", ValueKind.CHARACTER, ("latin1", "café".encode("cp1252")), "café"),
    # unresolvable charset → charset_'hex' (StringValue.java:70-72)
    ("c_unknown_charset", ValueKind.CHARACTER, ("klingon8", b"\xff\xfe\x01"), "klingon8_'fffe01'"),
    # 'binary' maps to ISO-8859-1, a decoded string (JDKCharsetMapper.java:18)
    ("c_binary_charset", ValueKind.CHARACTER, ("binary", "Aé".encode("latin-1")), "Aé"),
    # missing charset → bare hex (StringValue.java:53-55)
    ("c_no_charset", ValueKind.CHARACTER, ("", b"\xde\xad"), "dead"),
    # mapper-resolved charsets (raw name unknown to the codec registry)
    ("c_koi8r", ValueKind.CHARACTER, ("koi8r", "да".encode("koi8_r")), "да"),
    ("c_euckr", ValueKind.CHARACTER, ("euckr", "한글".encode("euc_kr")), "한글"),
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
    # WKB renders as WKT via the pure-Python reader (GeometryUtil.java:14-22)
    ("c_geom_wkb", ValueKind.BINARY_GEOMETRY, _wkb_point(10, 20), "POINT (10 20)"),
    (
        "c_geom_wkb_line",
        ValueKind.BINARY_GEOMETRY,
        _wkb_linestring([(0, 0), (1.5, 2.5), (40, 40)]),
        "LINESTRING (0 0, 1.5 2.5, 40 40)",
    ),
    (
        "c_geom_wkb_poly",
        ValueKind.BINARY_GEOMETRY,
        _wkb_polygon([_POLY_RING]),
        "POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10))",
    ),
    # torn WKB → hex fallback (WKBGeometry.toString ParseException catch)
    ("c_geom_wkb_torn", ValueKind.BINARY_GEOMETRY, _wkb_point(10, 20)[:9], _wkb_point(10, 20)[:9].hex()),
    ("c_geom_wkt", ValueKind.TEXT_GEOMETRY, "POINT (10 20)", "POINT (10 20)"),
    ("c_blob", ValueKind.BINARY_OBJECT, (ObjectType.BLOB, b"\x00\x01binary"), "000162696e617279"),
    ("c_json", ValueKind.TEXT_OBJECT, (ObjectType.JSON, '{"a": [1, 2]}'), '{"a": [1, 2]}'),
    # BIT bytes render as UTF-8 text (BitValue.java:31-38)
    ("c_bit", ValueKind.BIT, b"\x31\x30\x31", "101"),
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


# ---------------------------------------------------------------------------
# SQLServer 3-part-name fixture: db/schema/tbl + record-level provenance
# ---------------------------------------------------------------------------

SQLSERVER_DB, SQLSERVER_SCHEMA, SQLSERVER_TBL = "erp", "dbo", "accounts"
N_SQLSERVER_RECORDS = 8
N_SQLSERVER_COPIES = 16


def _sqlserver_record(i: int) -> CdcRecord:
    rid = 5000 + i
    return CdcRecord(
        id=rid,
        ts=1700000100 + i,
        operation=OperationType.INSERT,
        db=SQLSERVER_DB,
        tbl=SQLSERVER_TBL,
        schema=SQLSERVER_SCHEMA,  # 3-part identity (LazyRecordSchema.java:42-44)
        transaction_id=f"sqltx-{i // 3}",
        source_type=SourceType.SQLServer,
        source_version="2019",
        source_position=f"03:{rid}",  # LSN-ish position string
        trans_seq=i % 3,
        fields=[FieldDef("acct_id", "BIGINT", 8, False), FieldDef("balance", "DECIMAL", 0, True)],
        after=[(ValueKind.INTEGER, i), (ValueKind.DECIMAL, f"{100 + i}.00")],
    )


def expected_sqlserver_checkpoint(i: int) -> str:
    rid = 5000 + i
    return f"0@{rid}@03:{rid}@{(1700000100 + i) * 1000}"


def generate_sqlserver_bytes(spark: SparkSession) -> DataFrame:
    """SQLServer-source stream: every record carries a db/schema/tbl name
    triple, an LSN source position, and a transaction sequence — pinning the
    bracket rendering (`[erp]` / `[dbo].[accounts]`,
    `LazyRecordDeserializer.java:292-298`) and the record checkpoint string
    (`LazyParseRecordImpl.java:199-209`) through the distributed pipeline."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            values, parts, offs = [], [], []
            for row in pdf.itertuples(index=False):
                copy = int(row.id)
                for i in range(N_SQLSERVER_RECORDS):
                    values.append(encode_record(_sqlserver_record(i)))
                    parts.append(copy % 4)
                    offs.append(copy * N_SQLSERVER_RECORDS + i)
            yield pd.DataFrame({"value": values, "partition": parts, "offset": offs})

    return (
        spark.range(N_SQLSERVER_COPIES)
        .repartition(4)
        .mapInPandas(fn, schema="value binary, partition int, offset long")
    )


def expected_sqlserver_sql() -> str:
    """Literal oracle: one row per distinct record id with the rendered
    3-part names, checkpoint string, and per-id copy count."""
    rows = []
    for i in range(N_SQLSERVER_RECORDS):
        rows.append(
            f"({5000 + i}, '[{SQLSERVER_DB}]', '{SQLSERVER_SCHEMA}', "
            f"'[{SQLSERVER_SCHEMA}].[{SQLSERVER_TBL}]', "
            f"'{expected_sqlserver_checkpoint(i)}', {i % 3}, {N_SQLSERVER_COPIES})"
        )
    values = ",\n  ".join(rows)
    return f"""
SELECT CAST(id AS BIGINT) AS id, db, schema_name, tbl, checkpoint,
       CAST(trans_seq AS BIGINT) AS trans_seq, CAST(n_copies AS BIGINT) AS n_copies
FROM (VALUES
  {values}
) AS t(id, db, schema_name, tbl, checkpoint, trans_seq, n_copies)
"""


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


# ---------------------------------------------------------------------------
# Interleaved multi-statement transaction fixture (BEGIN..COMMIT batches)
# ---------------------------------------------------------------------------

TXN_DB = "bank"
TXN_TABLES = ("accounts", "transfers", "audit")
N_TXNS = 40


def _txn_shape(t: int) -> list[tuple[int, str, str]]:
    """Deterministic statement list for transaction ``t``:
    [(trans_seq, table, operation)] — 2..4 statements, each touching a
    rotating table, first always INSERT, every 4th txn ending in DELETE."""
    n_stmts = 2 + (t % 3)
    out = []
    for j in range(n_stmts):
        tbl = TXN_TABLES[(t + j) % len(TXN_TABLES)]
        if j == 0:
            op = "INSERT"
        elif j == n_stmts - 1 and t % 4 == 0:
            op = "DELETE"
        else:
            op = "UPDATE"
        out.append((j, tbl, op))
    return out


def _txn_record(t: int, j: int, tbl: str, op_name: str) -> CdcRecord:
    rid = 9_000_000 + t * 100 + j
    fields = [
        FieldDef("stmt_id", "BIGINT", 8, False),
        FieldDef("amount", "DECIMAL", 0, True),
    ]
    img = [(ValueKind.INTEGER, rid), (ValueKind.DECIMAL, f"{t}.{j:02d}")]
    op = OperationType[op_name]
    return CdcRecord(
        id=rid,
        ts=1_700_001_000 + t * 10 + j,
        operation=op,
        db=TXN_DB,
        tbl=tbl,
        transaction_id=f"txn-{t:04d}",
        source_type=SourceType.MySQL,
        source_version="5.7.0",
        source_position=f"mysql-bin.000002:{rid}",
        trans_seq=j,
        fields=fields,
        before=list(img) if op_name in ("UPDATE", "DELETE") else None,
        after=list(img) if op_name in ("INSERT", "UPDATE") else None,
    )


def _txn_commit_record(t: int, n_stmts: int) -> CdcRecord:
    """Transaction COMMIT marker (reference op code 5,
    `record/OperationType.java:4-27`; binlog XID analogue): no images, no
    table scope; ``trans_seq`` = the statement count, so a consumer can
    check completeness (seqs 0..n−1 observed) without out-of-band state."""
    return CdcRecord(
        id=9_000_000 + t * 100 + 99,
        ts=1_700_001_000 + t * 10 + n_stmts,
        operation=OperationType.COMMIT,
        db=TXN_DB,
        tbl="_txn",
        transaction_id=f"txn-{t:04d}",
        source_type=SourceType.MySQL,
        source_version="5.7.0",
        source_position=f"mysql-bin.000002:commit-{t}",
        trans_seq=n_stmts,
        fields=[],
    )


def generate_txn_bytes(
    spark: SparkSession, include_torn: bool = False, commits: bool = False
) -> DataFrame:
    """Interleaved multi-statement transactions: each of the N_TXNS
    transactions spans 2-4 statements across MULTIPLE tables; stream order
    (partition, offset) is round-robin BY STATEMENT (offset =
    j*(N_TXNS+1) + t — the +1 reserves the torn txn's slot whether or not
    it is generated, keeping offsets stable across both fixture modes),
    so statements of different transactions interleave on the wire exactly
    like a busy binlog — grouping back into atomic BEGIN..COMMIT batches
    cannot rely on contiguity, only on transaction_id + trans_seq
    (reference envelope: `DtsRecord.java:15,84-90`).

    ``include_torn`` adds one extra transaction (t = N_TXNS) whose MIDDLE
    statement never arrives (a torn/partial transaction — lost record or
    truncated feed): its observed sequence is {0, 2}, so the manifest's
    contiguity proof flags it and an atomic sink must skip it whole.

    ``commits`` additionally emits one COMMIT marker per transaction
    (reference op code 5, `record/OperationType.java:4-27` — the binlog
    XID analogue) AFTER its last statement in stream order (offset =
    n_stmts·(N_TXNS+1) + t), carrying trans_seq = statement count so a
    consumer can check completeness without out-of-band state. The torn
    transaction gets its COMMIT too — it committed upstream; the loss
    happened in transit — so completeness checking must catch the seq
    GAP, not just the marker's presence."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            values, parts, offs = [], [], []
            for row in pdf.itertuples(index=False):
                t = int(row.id)
                shape = _txn_shape(t)
                for j, tbl, op_name in shape:
                    if t == N_TXNS and j == 1:  # the torn txn's lost statement
                        continue
                    values.append(encode_record(_txn_record(t, j, tbl, op_name)))
                    parts.append(t % 4)
                    offs.append(j * (N_TXNS + 1) + t)
                if commits:
                    values.append(encode_record(_txn_commit_record(t, len(shape))))
                    parts.append(t % 4)
                    offs.append(len(shape) * (N_TXNS + 1) + t)
            yield pd.DataFrame({"value": values, "partition": parts, "offset": offs})

    return (
        spark.range(N_TXNS + 1 if include_torn else N_TXNS)
        .repartition(4)
        .mapInPandas(fn, schema="value binary, partition int, offset long")
    )


def expected_txn_sql() -> str:
    """Literal oracle: one manifest row per transaction, reconstructed from
    the same deterministic shape function."""
    import datetime as dt

    rows = []
    for t in range(N_TXNS):
        shape = _txn_shape(t)
        tables = sorted({f"{TXN_DB}.{tbl}" for _, tbl, _ in shape})
        ops = ",".join(op for _, _, op in shape)
        begin = dt.datetime.fromtimestamp(
            1_700_001_000 + t * 10 + 0, dt.timezone.utc
        ).strftime("%Y-%m-%d %H:%M:%S")
        commit = dt.datetime.fromtimestamp(
            1_700_001_000 + t * 10 + len(shape) - 1, dt.timezone.utc
        ).strftime("%Y-%m-%d %H:%M:%S")
        rows.append(
            f"('txn-{t:04d}', {len(shape)}, {len(tables)}, "
            f"'{','.join(tables)}', '{ops}', "
            f"TIMESTAMP '{begin}', TIMESTAMP '{commit}', TRUE)"
        )
    values = ",\n  ".join(rows)
    return f"""
SELECT transaction_id, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_tables AS INT) AS n_tables, tables, ops,
       begin_ts, commit_ts, seq_contiguous
FROM (VALUES
  {values}
) AS t(transaction_id, n_rows, n_tables, tables, ops, begin_ts, commit_ts, seq_contiguous)
"""


def expected_txn_apply_sql() -> str:
    """Literal oracle for the atomic-apply query: per-table row/txn counts
    and a record-id checksum over COMPLETE transactions only — the torn
    txn (t = N_TXNS) contributes nothing to any table it touched."""
    stats: dict[str, list] = {}
    for t in range(N_TXNS):  # complete txns only; torn t=N_TXNS excluded whole
        for j, tbl, _ in _txn_shape(t):
            s = stats.setdefault(tbl, [0, set(), 0])
            s[0] += 1
            s[1].add(t)
            s[2] += 9_000_000 + t * 100 + j
    rows = [
        f"('{tbl}', {n}, {len(txns)}, {id_sum})"
        for tbl, (n, txns, id_sum) in sorted(stats.items())
    ]
    values = ",\n  ".join(rows)
    return f"""
SELECT tbl, CAST(n_rows AS BIGINT) AS n_rows, CAST(n_txns AS BIGINT) AS n_txns,
       CAST(id_sum AS BIGINT) AS id_sum
FROM (VALUES
  {values}
) AS t(tbl, n_rows, n_txns, id_sum)
"""


# ---------------------------------------------------------------------------
# Schema-evolution fixture: a table whose field set WIDENS mid-stream
# ---------------------------------------------------------------------------

EVOLVE_DB, EVOLVE_TBL = "app", "users"
N_EVOLVE_PHASE = 8  # records per phase (phase 1: 2 cols, phase 2: 3 cols)
N_EVOLVE_COPIES = 16


def _evolve_record(i: int) -> CdcRecord:
    """Phase 1 (i < N_EVOLVE_PHASE): (uid, name). Phase 2: an `email`
    column was added upstream (the post-ALTER world) — the wire carries the
    new 3-field schema per record, exactly how the reference's
    self-describing records evolve (`LazyRecordSchema` is re-read per
    record; consumers with a declared column list see missing columns as
    NULL and new columns once declared)."""
    phase2 = i >= N_EVOLVE_PHASE
    fields = [FieldDef("uid", "BIGINT", 8, False), FieldDef("name", "VARCHAR", 253, True)]
    after = [(ValueKind.INTEGER, i), (ValueKind.CHARACTER, ("utf8", f"user-{i}".encode()))]
    if phase2:
        fields.append(FieldDef("email", "VARCHAR", 253, True))
        after.append((ValueKind.CHARACTER, ("utf8", f"u{i}@example.com".encode())))
    return CdcRecord(
        id=7000 + i,
        ts=1700000200 + i,
        operation=OperationType.INSERT,
        db=EVOLVE_DB,
        tbl=EVOLVE_TBL,
        transaction_id=f"evo-{i}",
        source_type=SourceType.MySQL,
        fields=fields,
        after=after,
    )


def generate_evolving_bytes(spark: SparkSession) -> DataFrame:
    """Mid-stream schema widening: first N_EVOLVE_PHASE record ids carry a
    2-column schema, the rest a 3-column one, interleaved across partitions
    (every copy emits both phases, so any partition order hits both
    schemas — exercising the per-batch field-def cache with >1 layout)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            values, parts, offs = [], [], []
            for row in pdf.itertuples(index=False):
                copy = int(row.id)
                for i in range(2 * N_EVOLVE_PHASE):
                    values.append(encode_record(_evolve_record(i)))
                    parts.append(copy % 4)
                    offs.append(copy * 2 * N_EVOLVE_PHASE + i)
            yield pd.DataFrame({"value": values, "partition": parts, "offset": offs})

    return (
        spark.range(N_EVOLVE_COPIES)
        .repartition(4)
        .mapInPandas(fn, schema="value binary, partition int, offset long")
    )


def expected_evolve_sql() -> str:
    """Literal oracle: one row per record id; email is NULL for phase-1
    rows (declared column absent from the wire image) and populated for
    phase-2 rows."""
    rows = []
    for i in range(2 * N_EVOLVE_PHASE):
        email = f"'u{i}@example.com'" if i >= N_EVOLVE_PHASE else "NULL"
        rows.append(f"({i}, 'user-{i}', {email}, {N_EVOLVE_COPIES})")
    values = ",\n  ".join(rows)
    return f"""
SELECT CAST(uid AS BIGINT) AS uid, name, CAST(email AS VARCHAR) AS email,
       CAST(n_copies AS BIGINT) AS n_copies
FROM (VALUES
  {values}
) AS t(uid, name, email, n_copies)
"""


# ---------------------------------------------------------------------------
# geometry zoo: every WKB shape the JVM typed path renders (r9), plus the
# hex-fallback cases — one table with per-record-varying geometry so the
# declared-schema JVM decode (`jvmvalue._geom_sql`) and the Python reader
# (`wire.wkb_to_wkt`) are pinned to each other AND to a literal oracle
# ---------------------------------------------------------------------------

GEOM_DB, GEOM_TBL = "geo_db", "shapes"
N_GEOM_SHAPES = 12
N_GEOM_COPIES = 16

#: constant torn payload (first 9 bytes of a point) → hex fallback, same text
#: every record so the oracle can pin it literally
_GEOM_TORN = _wkb_point(10, 20)[:9]


def _wkb_point_be(x: float, y: float, srid: int | None = None) -> bytes:
    import struct

    tw = 1 | (0x20000000 if srid is not None else 0)
    out = struct.pack(">BI", 0, tw)
    if srid is not None:
        out += struct.pack(">I", srid)
    return out + struct.pack(">dd", x, y)


def _geom_image(i: int) -> list:
    """Wire image for shape i — deterministic, fraction-bearing ordinates."""
    return [
        (ValueKind.INTEGER, i),
        (ValueKind.BINARY_GEOMETRY, _wkb_point(i, i + 0.5)),
        (ValueKind.BINARY_GEOMETRY, _wkb_point_be(-i - 0.25, i * 1000000.0)),
        (ValueKind.BINARY_GEOMETRY, _wkb_point_srid(i + 0.125, float(-i), 4326)),
        (ValueKind.BINARY_GEOMETRY, _wkb_linestring([(-i, 0.25), (i + 1, 2), (i, i)])),
        (ValueKind.BINARY_GEOMETRY, _wkb_polygon([[(i, i), (i + 4, i), (i + 4, i + 4), (i, i)]])),
        (ValueKind.BINARY_GEOMETRY, _GEOM_TORN),
    ]


def _wkb_point_srid(x: float, y: float, srid: int) -> bytes:
    import struct

    return struct.pack("<BII", 1, 1 | 0x20000000, srid) + struct.pack("<dd", x, y)


GEOM_FIELDS = [
    FieldDef("shape_id", "BIGINT", 8, False),
    FieldDef("pt", "GEOMETRY", 255, True),
    FieldDef("pt_be", "GEOMETRY", 255, True),
    FieldDef("pt_srid", "GEOMETRY", 255, True),
    FieldDef("path", "GEOMETRY", 255, True),
    FieldDef("ring", "GEOMETRY", 255, True),
    FieldDef("torn", "GEOMETRY", 255, True),
]


def _geom_record(i: int) -> CdcRecord:
    img = _geom_image(i)
    delete = i % 5 == 0
    return CdcRecord(
        id=9000 + i,
        ts=1700000400 + i,
        operation=OperationType.DELETE if delete else OperationType.INSERT,
        db=GEOM_DB,
        tbl=GEOM_TBL,
        transaction_id=f"geo-{i}",
        source_type=SourceType.MySQL,
        fields=list(GEOM_FIELDS),
        before=img if delete else None,
        after=None if delete else img,
    )


def generate_geom_bytes(spark: SparkSession) -> DataFrame:
    """Kafka-shaped bytes for the geometry zoo: N_GEOM_SHAPES distinct
    shapes × N_GEOM_COPIES copies spread across partitions."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            values, parts, offs = [], [], []
            for row in pdf.itertuples(index=False):
                copy = int(row.id)
                for i in range(N_GEOM_SHAPES):
                    values.append(encode_record(_geom_record(i)))
                    parts.append(copy % 8)
                    offs.append(copy * N_GEOM_SHAPES + i)
            yield pd.DataFrame({"value": values, "partition": parts, "offset": offs})

    return (
        spark.range(N_GEOM_COPIES)
        .repartition(8)
        .mapInPandas(fn, schema="value binary, partition int, offset long")
    )


def expected_geom_sql() -> str:
    """Literal oracle: the expected WKT/hex text per shape comes from the
    pure-Python reader (`wire.render_value` → `wkb_to_wkt`) at oracle-build
    time — pinning the distributed JVM render to the local reference
    implementation, shape by shape."""
    from flink_dts_connector_spark.datamodel.envelope import ValueKind as VK
    from flink_dts_connector_spark.formats.wire import render_value

    rows = []
    for i in range(N_GEOM_SHAPES):
        cells = [
            render_value(kind, payload) for kind, payload in _geom_image(i)[1:]
        ]
        op = "D" if i % 5 == 0 else "I"
        quoted = ", ".join("'" + c.replace("'", "''") + "'" for c in cells)
        rows.append(f"({i}, {quoted}, '{op}', {N_GEOM_COPIES})")
    values = ",\n  ".join(rows)
    return f"""
SELECT CAST(shape_id AS BIGINT) AS shape_id, pt, pt_be, pt_srid, path, ring,
       torn, op, CAST(n_copies AS BIGINT) AS n_copies
FROM (VALUES
  {values}
) AS t(shape_id, pt, pt_be, pt_srid, path, ring, torn, op, n_copies)
"""
