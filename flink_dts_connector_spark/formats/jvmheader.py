"""JVM-side header decode of the self-describing varint wire.

The reference's lazy-parse win is that op-type/table filtering reads ONLY
the record header and never touches payload bytes
(`impl/LazyParseRecordImpl.java:53-84`,
`DTSSubscribeRowDataDeserializationSchema.java:68-74`). Our Python decoder
has the same two-phase laziness, but at first ingest even the header parse
used to funnel every record through a Python worker. This module removes
that: header fields — id, ts, born_ts, op, source_type, db, tbl (+ v2
schema / source_position / trans_seq for checkpoints) — are parsed with
pure Catalyst column expressions, so an op/table pre-filter runs entirely
inside the JVM and only the SURVIVING records pay the Arrow hop into the
Python payload decoder.

Design notes, learned the hard way (each alternative was measured):

- ONE self-contained `aggregate()` fold per use — a 23-state byte parser
  in the accumulator struct. A chained per-field expression design inlines
  multiplicatively under Catalyst alias substitution and OOMs the driver;
  intermediate `withColumn`s get substituted into pushed-down filter
  predicates and re-evaluate the parse ~26× per record. A single
  expression evaluated in exactly one place has neither failure mode.
- Byte access: `transform(split(decode(bytes, 'ISO-8859-1'), ''),
  x -> ascii(x))` (one latin-1 decode + per-char codepoint) measured ~2×
  faster than hex()+conv() per byte and builds the array once as the
  fold's input argument, so the merge lambda touches only its variables.
- `prefilter()` cost tiers: a `contains()` byte-search for the requested
  table names runs first (~2M rec/s on the 32-core box — byte scan, no
  parse) and drops foreign-table records before the parse fold ever runs;
  the lean filter fold (stops at the schema field, 10-field state) prices
  only tier-1 survivors; Python payload decode prices only final
  survivors. On a multi-tenant 100 TB topic each tier cuts the mass the
  next (more expensive) tier sees.

Scale: this is the 100 TB ingest gate. A 1000-executor cluster filtering a
multi-tenant CDC topic down to one table's changes does the 90%-drop pass
at JVM scan speed; Python cost becomes proportional to the SELECTED
table's mass, not the topic's. The wire layout is `formats/wire.py`'s
(header := id txid ts born? op source_type source_version db tbl
[v2: schema source_position safe_position trans_seq] ntags tags
payload_len).

Semantics note: logical db/table name overrides ride in the `tags` map
(`l_db_name`/`l_tb_name`, `LazyRecordDeserializer.java:319-322`), which
this fast path does not fully parse — so `prefilter()` keeps a record when
EITHER its physical rendered name matches OR the record's bytes contain an
override key (a length-prefixed UTF-8 tag key always appears literally in
the bytes, so this can false-KEEP on a payload collision but never
false-DROP). The Python layer downstream re-applies the exact filter; the
JVM pass only needs to never drop a record the exact filter would keep.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_dts_connector_spark.datamodel.envelope import OperationType, SourceType

#: header prefix parsed — generous: id+txid+ts+born+op+st+sv+db+tbl+schema+
#: positions+trans_seq+ntags is < 150 bytes for any sane identifier
#: lengths; records whose header overruns this surface as
#: ``hdr_complete = false`` and are conservatively KEPT by `prefilter`
MAX_HEADER_BYTES = 192

_MAGIC = 0xD7

#: columns added by `with_jvm_header`
HEADER_COLS = (
    "hdr_valid",
    "hdr_complete",
    "hdr_version",
    "hdr_id",
    "hdr_ts",
    "hdr_born_ts",
    "hdr_op_code",
    "hdr_op",
    "hdr_source_type_code",
    "hdr_source_type",
    "hdr_db",
    "hdr_tbl",
    "hdr_schema",
    "hdr_source_position",
    "hdr_trans_seq",
    "hdr_has_tags",
    "hdr_checkpoint",
)

_ZERO = "CAST(0 AS BIGINT)"
#: packed (start, len) string slots: start * 2^22 + (len + 2); 0 = unset,
#: so len = -1 (wire NULL) is distinguishable from never-parsed
_SL = 4194304


def _bytes_sql(value_col: str) -> str:
    """Self-contained array<int> of the header-prefix bytes. latin-1 maps
    every byte 0..255 to the same code point, so ascii() recovers the byte
    value exactly; measured ~2× faster than hex()+conv() per byte."""
    return (
        f"transform(split(decode(substring({value_col}, 1, {MAX_HEADER_BYTES}),"
        " 'ISO-8859-1'), ''), x -> ascii(x))"
    )


def _byte_sql(value_col: str, pos: int) -> str:
    """One header byte (1-based) as INT, for the cheap magic/version checks."""
    return f"ascii(substring(decode(substring({value_col}, {pos}, 1), 'ISO-8859-1'), 1, 1))"


def _valid_sql(value_col: str) -> str:
    return (
        f"(octet_length({value_col}) >= 2 AND {_byte_sql(value_col, 1)} = {_MAGIC}"
        f" AND {_byte_sql(value_col, 2)} IN (1, 2))"
    )


def _ver_sql(value_col: str) -> str:
    return f"IF(octet_length({value_col}) >= 2, {_byte_sql(value_col, 2)}, -1)"


# ---------------------------------------------------------------------------
# full-parse fold (with_jvm_header): stages
#   0 id · 1 txid-len · 2 txid-body · 3 ts · 4 born-flag · 5 born · 6 op ·
#   7 source_type · 8 sv-len · 9 sv-body · 10 db-len · 11 db-body ·
#   12 tbl-len · 13 tbl-body · [v2: 14 schema-len · 15 schema-body ·
#   16 srcpos-len · 17 srcpos-body · 18 safepos-len · 19 safepos-body ·
#   20 trans_seq] · 21 ntags · 22 done · 23 invalid (set by init)
# v1 jumps 13 → 21 (no schema/position/trans_seq fields in its header).
# ---------------------------------------------------------------------------

_FULL_FIELDS = (
    ("stage", None),  # init computed from the magic/version check
    ("pos", "3"),  # 1-based byte position of the element being consumed
    ("acc", _ZERO),
    ("sh", "0"),
    ("rem", _ZERO),
    ("id", _ZERO),
    ("ts", _ZERO),
    ("born", _ZERO),
    ("bflag", "0"),
    ("op", "-1"),
    ("st", "-1"),
    ("dbsl", _ZERO),
    ("tbsl", _ZERO),
    ("scsl", _ZERO),
    ("spsl", _ZERO),
    ("tq", _ZERO),
    ("nt", _ZERO),
)


def _mk_st(fields):
    def st(**over: str) -> str:
        # every consuming branch advances the byte cursor by default
        defaults = {"pos": "s.pos + 1"}
        parts = [
            f"'{n}', {over.get(n, defaults.get(n, 's.' + n))}" for n, _ in fields
        ]
        return "named_struct(" + ", ".join(parts) + ")"

    return st


def _varint_merge(st, body_stages: dict[str, str], fin_branches: str,
                  flag_stage: int | None, done_stage: int) -> str:
    """Shared merge-lambda shape: done short-circuit → string-body consume →
    option-flag byte → varint accumulate/finalize."""
    body_next = "CASE s.stage " + " ".join(
        f"WHEN {k} THEN {v}" for k, v in body_stages.items()
    ) + " END"
    body = st(rem="s.rem - CAST(1 AS BIGINT)",
              stage=f"IF(s.rem <= 1, {body_next}, s.stage)")
    accum = st(acc=f"s.acc + shiftleft(CAST(b % 128 AS BIGINT), s.sh)",
               sh="s.sh + 7")
    body_list = ", ".join(body_stages)
    merge = (
        f"IF(s.stage >= {done_stage}, s, "
        f"IF(s.stage IN ({body_list}), {body}, "
    )
    if flag_stage is not None:
        flag = st(bflag="b", stage="IF(b = 1, 5, 6)")
        merge += f"IF(s.stage = {flag_stage}, {flag}, "
    merge += f"IF(b >= 128, {accum}, {fin_branches})"
    merge += ")))" if flag_stage is not None else "))"
    return merge


_VAL = ("(shiftrightunsigned(s.acc + shiftleft(CAST(b % 128 AS BIGINT), s.sh), 1)"
        " ^ -((s.acc + shiftleft(CAST(b % 128 AS BIGINT), s.sh)) & CAST(1 AS BIGINT)))")


def _full_fold_sql(value_col: str) -> str:
    """Full header parse as one self-contained expression; returns the raw
    parser-state struct (field extraction happens in `with_jvm_header`)."""
    v = value_col
    st = _mk_st(_FULL_FIELDS)
    reset = {"acc": _ZERO, "sh": "0"}

    def fin(**over: str) -> str:
        return st(**{**reset, **over})

    def sl_cap(slot: str, next_body: int, next_done: str) -> str:
        return fin(**{
            slot: f"CAST(s.pos + 1 AS BIGINT) * {_SL} + ({_VAL} + 2)",
            "rem": f"greatest({_VAL}, {_ZERO})",
            "stage": f"IF({_VAL} > 0, {next_body}, {next_done})",
        })

    def sl_skip(next_body: int, next_done: str) -> str:
        return fin(rem=f"greatest({_VAL}, {_ZERO})",
                   stage=f"IF({_VAL} > 0, {next_body}, {next_done})")

    ver_done_13 = f"IF({_ver_sql(v)} >= 2, 14, 21)"
    finalize = (
        "CASE s.stage "
        f"WHEN 0 THEN {fin(id=_VAL, stage='1')} "
        f"WHEN 1 THEN {sl_skip(2, '3')} "
        f"WHEN 3 THEN {fin(ts=_VAL, stage='4')} "
        f"WHEN 5 THEN {fin(born=_VAL, stage='6')} "
        f"WHEN 6 THEN {fin(op=f'CAST({_VAL} AS INT)', stage='7')} "
        f"WHEN 7 THEN {fin(st=f'CAST({_VAL} AS INT)', stage='8')} "
        f"WHEN 8 THEN {sl_skip(9, '10')} "
        f"WHEN 10 THEN {sl_cap('dbsl', 11, '12')} "
        f"WHEN 12 THEN {sl_cap('tbsl', 13, ver_done_13)} "
        f"WHEN 14 THEN {sl_cap('scsl', 15, '16')} "
        f"WHEN 16 THEN {sl_cap('spsl', 17, '18')} "
        f"WHEN 18 THEN {sl_skip(19, '20')} "
        f"WHEN 20 THEN {fin(tq=_VAL, stage='21')} "
        f"WHEN 21 THEN {fin(nt=_VAL, stage='22')} "
        "END"
    )
    merge = _varint_merge(
        st,
        body_stages={"2": "3", "9": "10", "11": "12", "13": ver_done_13,
                     "15": "16", "17": "18", "19": "20"},
        fin_branches=finalize,
        flag_stage=4,
        done_stage=22,
    )
    init_fields = [("stage", f"IF({_valid_sql(v)}, 0, 23)")] + [
        (n, d) for n, d in _FULL_FIELDS[1:]
    ]
    init = "named_struct(" + ", ".join(f"'{n}', {d}" for n, d in init_fields) + ")"
    # skip the 2 magic/version bytes: fold over elements 3.. of the array
    return (
        f"aggregate(slice({_bytes_sql(v)}, 3, {MAX_HEADER_BYTES}), {init}, "
        f"(s, b) -> {merge}, s -> s)"
    )


def _sl_start(sl: str) -> str:
    return f"CAST({sl} div {_SL} AS INT)"


def _sl_len(sl: str) -> str:
    return f"(CAST({sl} % {_SL} AS INT) - 2)"


def _sl_str(value_col: str, sl: str) -> str:
    """Decode a packed string slot to its UTF-8 text (NULL when the wire
    said NULL, or when the slot was never parsed)."""
    return (
        f"IF({sl} = 0 OR {_sl_len(sl)} < 0, NULL, "
        f"CAST(substring({value_col}, {_sl_start(sl)}, {_sl_len(sl)}) AS STRING))"
    )


def with_jvm_header(
    df: DataFrame, value_col: str = "value", drop_internal: bool = True
) -> DataFrame:
    """Append JVM-decoded header columns (`HEADER_COLS`) to a raw frame.

    Torn/foreign records surface as ``hdr_valid = false`` (bad magic or
    version) or ``hdr_complete = false`` (header longer than
    `MAX_HEADER_BYTES` or truncated mid-field) rather than erroring —
    callers choose drop vs fail, like the decoder's ``on_error``.

    The parse is one fold expression materialized as a `_h` struct column;
    the header columns are cheap field extractions. Do NOT `.where()` on
    these columns in a hot path — predicate pushdown substitutes the fold
    into the filter condition once per referenced column. Filter with
    `prefilter()` (a single-expression predicate) and project afterwards.
    """
    v = value_col
    op_case = "CASE _h.op " + " ".join(
        f"WHEN {int(o)} THEN '{o.name}'" for o in OperationType
    ) + " ELSE CAST(_h.op AS STRING) END"
    st_case = "CASE _h.st " + " ".join(
        f"WHEN {int(s)} THEN '{s.name}'" for s in SourceType
    ) + " ELSE CAST(_h.st AS STRING) END"
    ver = _ver_sql(v)

    df = df.withColumn("_h", F.expr(_full_fold_sql(v)))
    srcpos = f"IF({ver} < 2, NULL, {_sl_str(v, '_h.spsl')})"
    out_steps = {
        "hdr_valid": "_h.stage != 23",
        "hdr_complete": "_h.stage = 22",
        "hdr_version": ver,
        "hdr_id": "_h.id",
        "hdr_ts": "_h.ts",
        "hdr_born_ts": "IF(_h.bflag = 1, _h.born, _h.ts)",
        "hdr_op_code": "_h.op",
        "hdr_op": op_case,
        "hdr_source_type_code": "_h.st",
        "hdr_source_type": st_case,
        "hdr_db": _sl_str(v, "_h.dbsl"),
        "hdr_tbl": _sl_str(v, "_h.tbsl"),
        "hdr_schema": f"IF({ver} < 2, NULL, {_sl_str(v, '_h.scsl')})",
        "hdr_source_position": srcpos,
        "hdr_trans_seq": "_h.tq",
        "hdr_has_tags": "_h.nt > 0",
        "hdr_checkpoint":
            "concat('0@', CAST(_h.id & 2147483647 AS STRING), '@', "
            f"coalesce({srcpos}, 'null'), '@', CAST(_h.ts * 1000 AS STRING))",
    }
    df = df.withColumns({name: F.expr(sql) for name, sql in out_steps.items()})
    if drop_internal:
        df = df.drop("_h")
    return df


def rendered_qualified_name() -> Column:
    """`db.tbl` as the Python decoder's table filter sees it
    (`wire.render_object_names`): schema defaults to db for 2-part names;
    SQLServer gets the bracket convention `[db].[schema].[tbl]`."""
    eff_schema = F.expr("coalesce(hdr_schema, hdr_db)")
    sqlserver = F.col("hdr_source_type_code") == int(SourceType.SQLServer)
    qualified = F.when(
        sqlserver,
        F.concat(
            F.lit("["), F.col("hdr_db"), F.lit("].["),
            eff_schema, F.lit("].["), F.col("hdr_tbl"), F.lit("]"),
        ),
    ).otherwise(F.concat(F.col("hdr_db"), F.lit("."), F.col("hdr_tbl")))
    return qualified


# ---------------------------------------------------------------------------
# lean filter fold (prefilter): only op / source_type / db / tbl / schema
# are captured, and parsing STOPS after the schema field — stages
#   0 id · 1-2 txid · 3 ts · 4 born-flag · 5 born · 6 op · 7 source_type ·
#   8-9 sv · 10-11 db · 12-13 tbl · [v2: 14-15 schema] · 16 done ·
#   17 invalid (set by init). v1 jumps 13 → 16.
# ---------------------------------------------------------------------------

_LEAN_FIELDS = (
    ("stage", None),
    ("pos", "3"),
    ("acc", _ZERO),
    ("sh", "0"),
    ("rem", _ZERO),
    ("bflag", "0"),
    ("op", "-1"),
    ("st", "-1"),
    ("dbsl", _ZERO),
    ("tbsl", _ZERO),
    ("scsl", _ZERO),
)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def tier1_sql(value_col: str, tables: list[str]) -> str | None:
    """The contains() byte-search tier as a standalone predicate: TRUE for
    any record that could possibly belong to one of ``tables`` (its bytes
    contain some requested (db AND tbl) pair, or a logical-rename tag key).
    Never false-drops; returns None when a table name isn't a plain
    ``db.tbl`` (bracketed/1-part names can't be byte-searched soundly)."""
    v = value_col
    pairs = []
    for t in tables:
        parts = t.split(".")
        if len(parts) == 2 and parts[0] and parts[1] and "[" not in t:
            pairs.append(
                f"(contains({v}, CAST({_sql_quote(parts[0])} AS BINARY))"
                f" AND contains({v}, CAST({_sql_quote(parts[1])} AS BINARY)))"
            )
        else:
            return None
    return (
        "(" + " OR ".join(pairs)
        + f" OR contains({v}, CAST('l_db_name' AS BINARY))"
        + f" OR contains({v}, CAST('l_tb_name' AS BINARY)))"
    )


def _keep_sql(
    value_col: str,
    tables: list[str] | None,
    ops: list[str] | None,
    drop_invalid: bool,
) -> str:
    """The whole prefilter decision as ONE boolean expression (see module
    docstring for why it must be one expression)."""
    v = value_col
    st = _mk_st(_LEAN_FIELDS)
    reset = {"acc": _ZERO, "sh": "0"}

    def fin(**over: str) -> str:
        return st(**{**reset, **over})

    def sl_cap(slot: str, next_body: int, next_done: str) -> str:
        return fin(**{
            slot: f"CAST(s.pos + 1 AS BIGINT) * {_SL} + ({_VAL} + 2)",
            "rem": f"greatest({_VAL}, {_ZERO})",
            "stage": f"IF({_VAL} > 0, {next_body}, {next_done})",
        })

    def sl_skip(next_body: int, next_done: str) -> str:
        return fin(rem=f"greatest({_VAL}, {_ZERO})",
                   stage=f"IF({_VAL} > 0, {next_body}, {next_done})")

    ver = _ver_sql(v)
    ver_done_13 = f"IF({ver} >= 2, 14, 16)"
    finalize = (
        "CASE s.stage "
        f"WHEN 0 THEN {fin(stage='1')} "
        f"WHEN 1 THEN {sl_skip(2, '3')} "
        f"WHEN 3 THEN {fin(stage='4')} "
        f"WHEN 5 THEN {fin(stage='6')} "
        f"WHEN 6 THEN {fin(op=f'CAST({_VAL} AS INT)', stage='7')} "
        f"WHEN 7 THEN {fin(st=f'CAST({_VAL} AS INT)', stage='8')} "
        f"WHEN 8 THEN {sl_skip(9, '10')} "
        f"WHEN 10 THEN {sl_cap('dbsl', 11, '12')} "
        f"WHEN 12 THEN {sl_cap('tbsl', 13, ver_done_13)} "
        f"WHEN 14 THEN {sl_cap('scsl', 15, '16')} "
        "END"
    )
    merge = _varint_merge(
        st,
        body_stages={"2": "3", "9": "10", "11": "12", "13": ver_done_13,
                     "15": "16"},
        fin_branches=finalize,
        flag_stage=4,
        done_stage=16,
    )
    init_fields = [("stage", "0")] + [(n, d) for n, d in _LEAN_FIELDS[1:]]
    init = "named_struct(" + ", ".join(f"'{n}', {d}" for n, d in init_fields) + ")"

    # finish: keep-decision from the parsed state (incomplete → keep)
    conds = []
    if ops is not None:
        codes = sorted(
            int(OperationType[o]) for o in ops if o in OperationType.__members__
        )
        conds.append(f"s.op IN ({', '.join(map(str, codes))})" if codes else "false")
    if tables is not None:
        db = _sl_str(v, "s.dbsl")
        tbl = _sl_str(v, "s.tbsl")
        sc = f"IF({ver} < 2, NULL, {_sl_str(v, 's.scsl')})"
        rendered = (
            f"IF(s.st = {int(SourceType.SQLServer)}, "
            f"concat('[', {db}, '].[', coalesce({sc}, {db}), '].[', {tbl}, ']'), "
            f"concat({db}, '.', {tbl}))"
        )
        in_list = ", ".join(_sql_quote(t) for t in tables)
        override = (
            f"contains({v}, CAST('l_db_name' AS BINARY))"
            f" OR contains({v}, CAST('l_tb_name' AS BINARY))"
        )
        conds.append(f"({rendered} IN ({in_list}) OR {override})")
    keep_parsed = " AND ".join(conds) if conds else "true"
    finish = f"s -> IF(s.stage < 16, true, {keep_parsed})"

    fold = (
        f"aggregate(slice({_bytes_sql(v)}, 3, {MAX_HEADER_BYTES}), {init}, "
        f"(s, b) -> {merge}, {finish})"
    )

    # tier-1 contains() cut: only when every requested table is a plain
    # db.tbl name whose parts we can byte-search for. A record containing
    # neither any requested (db AND tbl) pair nor a rename-tag key cannot
    # match — drop it before the parse fold ever runs.
    tier1 = tier1_sql(v, tables) if tables else None

    keep_invalid = "false" if drop_invalid else "true"
    # NULL value (Kafka tombstone): _valid_sql(NULL) is NULL, so a bare
    # `WHEN NOT valid` branch would be skipped and the fold over NULL bytes
    # would yield NULL — where() would then silently DROP the tombstone even
    # with drop_invalid=False. Route NULLs through the invalid branch so the
    # Python decoder's on_error contract still sees the poison pill.
    branches = [
        f"WHEN {v} IS NULL OR NOT {_valid_sql(v)} THEN {keep_invalid}"
    ]
    if tier1 is not None:
        branches.append(f"WHEN NOT {tier1} THEN false")
    # coalesce: a valid-magic record whose parsed db/tbl slot decodes to wire
    # NULL makes keep_parsed NULL (NULL IN (...) etc.) — conservative-KEEP it
    # and let the exact Python filter decide, never false-drop JVM-side.
    return "CASE " + " ".join(branches) + f" ELSE coalesce({fold}, true) END"


def prefilter(
    raw_df: DataFrame,
    tables: list[str] | None = None,
    ops: list[str | OperationType] | None = None,
    value_col: str = "value",
    drop_invalid: bool = False,
) -> DataFrame:
    """JVM-only op/table pre-filter over a raw CDC frame: returns the input
    columns unchanged, minus records that can never survive the Python
    decoder's exact filters. The plan up to here is Python-free, and the
    whole decision is a single expression (one parse per record, none at
    all for records cut by the `contains()` tier).

    Conservative-keep rules (never drops a record the exact filter keeps):

    - invalid header (bad magic/version): KEPT by default so the decoder's
      ``on_error`` contract still sees the poison pill (``drop_invalid=True``
      opts into JVM-side dropping for 'skip'-mode consumers);
    - incomplete header parse (header overran `MAX_HEADER_BYTES`): KEPT —
      the fields the filters need weren't all recovered;
    - table filter: a record whose raw bytes contain a logical-rename tag
      key (`l_db_name`/`l_tb_name`) is kept regardless of its physical
      name, because the override could rename it INTO the selection; the
      byte search can false-keep (payload collision) but never false-drop.
    """
    op_names = None
    if ops is not None:
        op_names = [o.name if isinstance(o, OperationType) else str(o) for o in ops]
    keep = _keep_sql(
        value_col,
        list(tables) if tables is not None else None,
        op_names,
        drop_invalid,
    )
    return raw_df.where(F.expr(keep))
