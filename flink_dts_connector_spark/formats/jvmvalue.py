"""JVM-side VALUE decode of the self-describing varint wire for
declared-schema tables — the `dts-cdc` typed path with zero Python.

Round 7 closed the header (`formats/jvmheader.py`): op/table prefiltering
runs as Catalyst expressions. This module closes the LAST Python tier on
the ingest path: for a table whose field list is declared up front (the
reference's `DTSSubscribeRowDataDeserializationSchema.java:139-184` path —
CREATE TABLE declares the columns), the before/after row images decode as
column expressions too, so `raw bytes → typed changelog` is Python-free
end-to-end.

Why this is possible for declared schemas and not in general: the wire's
field-definition section (`wire.py` payload := nfields field* ...) is a
pure function of the declared `FieldDef` list, so its exact bytes are a
PLAN-TIME CONSTANT. That yields the tricks everything here builds on:

1. **Anchor by byte-search, not by parse.** `locate()` finds the constant
   field-def bytes inside each record at JVM scan speed — no varint walk
   through txid/tags/positions is needed to find the images. A guard
   verifies the varint of the implied payload length sits immediately
   before the anchor (a false anchor inside a string value fails the
   guard; such records are dropped, never mis-decoded).
2. **Fold per FIELD, not per byte.** `jvmheader`'s per-byte fold costs
   ~1µs/byte of header (struct-copy floor, measured). Here each
   `aggregate()` step consumes one whole header field or image value: the
   step computes the value's wire length from its kind tag (every kind's
   length is derivable from a bounded number of byte reads) and advances
   the cursor, capturing `kind * 2^24 + start` slots. ~25 steps for a
   6-column table instead of ~400 byte-steps.
3. **Let-bindings via `transform(array(e), x -> body)[1]`.** SQL has no
   local variables, and naively composing position chains (each position
   referencing the previous) grows the expression tree multiplicatively —
   the first cut of this module produced a 395 KB expression per column
   and hung analysis. A single-element transform is a let: the bound
   expression appears once, the body references the lambda variable.
   (Bindings are EAGER — they live inside the CASE branch that needs
   them, so unmatched kinds never evaluate them.)

Extraction then re-parses each slot independently (bounded expressions —
the slot start is a plain struct field, so nothing re-evaluates the fold:
Spark's CollapseProject keeps non-cheap multi-referenced projections).
The exact op/table residual filter is folded into the changelog-explode
generator — a non-matching record yields an EMPTY ARRAY and explode drops
it, so no Filter node ever substitutes the fold into a predicate (the
`cdc_header_jvm_filter` lesson, commit 8905892, as a generator instead of
conditional aggregates).

Contract vs the Python decoder (`decoder.decode_cdc` → `typed.project_table`):

- semantics are `on_error='skip'`: expressions cannot raise, so poison
  pills / anchor-guard failures / out-of-contract records are DROPPED
  (the Python path's 'fail' mode raises).
- supported value kinds render identically to `wire.render_value` → cast:
  NULL/EMPTY, INTEGER, CHARACTER (charsets utf8/utf8mb4/ascii/latin1/
  gbk/utf16 + the missing-charset hex and unresolvable-charset `cs_'hex'`
  fallbacks), DECIMAL, FLOAT (IEEE-754 bits reconstructed with exact
  power-of-two arithmetic; ±Inf/NaN render repr()'s 'inf'/'-inf'/'nan'
  and CAST exactly like the Python path — ANSI raises, non-ANSI NULLs,
  in both engines), TIMESTAMP, DATETIME/TIMESTAMP_TZ (segment
  bitmap, zero-date → NULL), TEXT_GEOMETRY, BINARY_OBJECT (hex),
  TEXT_OBJECT, BIT (utf8), and (r9) BINARY_GEOMETRY: WKB→WKT for
  POINT/LINESTRING/POLYGON in both byte orders with optional EWKB SRID,
  rendered by bounds-checked transform()/aggregate() folds with hex
  fallback exactly where the Python reader raises (`wire.wkb_to_wkt`);
  ordinate digits are roundtrip-verified shortest (JDK-4511638-proof).
- size bounds (out-of-bound records are dropped by the end-of-record
  check, not mis-read): string/bytes values < 1 MiB; |id| < 2^62;
  charset/tz/object-type prefixes single-varint-byte (true for every
  real charset, tz offset, and the 7 ObjectType codes).

Scale: this is the 100 TB typed-ingest gate. prefilter() cuts foreign
mass at ~2M rec/s byte-scan, and survivors decode to typed rows inside
JVM expressions — Python workers never start. Reference parity:
`impl/LazyRecordDeserializer.java:152-340` (value union),
`DTSSubscribeRowDataDeserializationSchema.java:139-184` (declared-schema
row projection), `record/value/*.java` (toString renders).

FROZEN (r11): this tier's constant factor (~45-65k rec/s at 32 cores) is
the measured optimum of its design space, not an unfinished optimization.
The cost is structural — `transform`/`aggregate` are CodegenFallback, so
the whole tree evaluates interpreted — and every escape hatch was built
and measured SLOWER at sf0.1 (r11 session, same raw frame, checksums
equal):

- render tree copied per output column instead of the shared transform()
  (codegen-visible): 25k vs 47k rec/s, 91 s cold plan — the optimizer
  pays per-column for the 13-kind tree;
- folds unrolled into chained plain-SQL projections with textually
  inlined lets (fully HOF-free, whole-stage-codegen eligible): 6k rec/s,
  71 s cold plan — inlining the position chain grows single-column
  expressions to ~45 KB and the generated code thrashes JIT;
- image fold with an array accumulator instead of the wide struct
  (concat-append vs per-field IF copies): parity (193k vs 196k rec/s on
  the isolated fold) — accumulator copies were never the bottleneck.

The tier exists for ONE resource shape — clusters where Python workers
are banned — and `formats/router.py` (`choose_ingest_path`, prices
re-measured in INGEST_TRADEOFF_r11.json) is its only default entry
point; every path with Python available prices it out. Revisit only if
Spark exposes codegen for higher-order functions or a SQL LET.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_dts_connector_spark.datamodel.envelope import OperationType, SourceType
from flink_dts_connector_spark.formats.typed import (
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE_AFTER,
    OP_UPDATE_BEFORE,
)
from flink_dts_connector_spark.formats.wire import FieldDef, write_long, write_str

#: slot packing: kind * 2^24 + start (1-based byte offset of the value body,
#: right after the kind byte). Records longer than 16 MiB are out of contract.
_KS = 16777216
#: header string slots reuse jvmheader's packing: start * 2^22 + (len + 2)
_SL = 4194304


def fielddef_bytes(fields: list[FieldDef]) -> bytes:
    """The wire bytes of the payload's field-definition section for a
    declared schema — byte-identical to what `wire.encode_record` writes
    (nfields, then name/type_name/type_id/nullable/encoding per field).
    This constant is the locate() anchor."""
    buf = bytearray()
    write_long(buf, len(fields))
    for f in fields:
        write_str(buf, f.name)
        write_str(buf, f.type_name)
        write_long(buf, f.type_id)
        buf.append(1 if f.nullable else 0)
        write_str(buf, f.encoding)
    return bytes(buf)


def _let(binds: list[tuple[str, str]], body: str) -> str:
    """Sequential let-bindings: each bound expression appears ONCE in the
    generated SQL; later bindings and the body reference earlier ones by
    lambda-variable name. EAGER: every binding evaluates when the whole
    expression does — keep lets inside the CASE branch that uses them."""
    out = body
    for name, expr in reversed(binds):
        out = f"element_at(transform(array({expr}), {name} -> {out}), 1)"
    return out


class _Frag:
    """SQL fragment factory bound to one binary value column. Position
    arguments must be CHEAP expressions (struct-field refs, lambda vars or
    small arithmetic) — fragments inject them several times."""

    def __init__(self, value_col: str):
        self.v = value_col

    def b(self, p: str) -> str:
        """Header/payload byte at 1-based position p as INT (latin-1 maps
        every byte to the same code point — `jvmheader._bytes_sql`)."""
        return f"ascii(decode(substring({self.v}, {p}, 1), 'ISO-8859-1'))"

    # -- varints --------------------------------------------------------------

    def vlen(self, p: str, n: int) -> str:
        """Byte length of the varint at p (NULL if > n bytes)."""
        whens = " ".join(
            f"WHEN {self.b(f'{p}+{k - 1}')} < 128 THEN {k}" for k in range(1, n + 1)
        )
        return f"(CASE {whens} END)"

    def _u(self, p: str, k: int) -> str:
        """Unsigned accumulated value of a k-byte varint (wrapping BIGINT)."""
        return "(" + " + ".join(
            f"shiftleft(CAST({self.b(f'{p}+{j}')} % 128 AS BIGINT), {7 * j})"
            for j in range(k)
        ) + ")"

    @staticmethod
    def _zig(u: str) -> str:
        return f"(shiftrightunsigned({u}, 1) ^ -({u} & CAST(1 AS BIGINT)))"

    def vz(self, p: str, n: int) -> str:
        """Zigzag varint value at p as BIGINT (NULL if > n bytes)."""
        branches = []
        for k in range(1, n + 1):
            body = self._u(p, k) if k == 1 else _let(
                [("zu", self._u(p, k))], self._zig("zu")
            )
            if k == 1:
                body = self._zig(f"CAST({self.b(p)} AS BIGINT)")
            branches.append(f"WHEN {self.b(f'{p}+{k - 1}')} < 128 THEN {body}")
        return "(CASE " + " ".join(branches) + " END)"

    # -- length-prefixed strings/bytes (len varint <= 3 bytes → < 1 MiB) ------

    def strcons(self, p: str) -> str:
        """Total wire bytes of the len-prefixed string/bytes at p
        (len bytes + body; wire NULL = len -1 → just the len byte)."""
        branches = []
        for k in range(1, 4):
            u = self._u(p, k)
            body = _let(
                [("zu", u)], f"{k} + IF(zu % 2 = 0, CAST(zu div 2 AS INT), 0)"
            )
            branches.append(f"WHEN {self.b(f'{p}+{k - 1}')} < 128 THEN {body}")
        return "(CASE " + " ".join(branches) + " END)"

    def strslot(self, p: str) -> str:
        """Header-string slot at p, jvmheader `_SL` packing."""
        branches = []
        for k in range(1, 4):
            body = _let(
                [("zu", self._u(p, k))],
                f"CAST({p} + {k} AS BIGINT) * {_SL} + ({self._zig('zu')} + 2)",
            )
            branches.append(f"WHEN {self.b(f'{p}+{k - 1}')} < 128 THEN {body}")
        return "(CASE " + " ".join(branches) + " END)"

    def sl_str(self, sl: str) -> str:
        """Packed header slot → UTF-8 text (NULL for wire NULL / unparsed)."""
        start = f"CAST({sl} div {_SL} AS INT)"
        ln = f"(CAST({sl} % {_SL} AS INT) - 2)"
        return (
            f"IF({sl} = 0 OR {ln} < 0, NULL, "
            f"CAST(substring({self.v}, {start}, {ln}) AS STRING))"
        )

    def txt(self, p: str) -> str:
        """Len-prefixed string at p as STRING (wire NULL → NULL)."""
        branches = []
        for k in range(1, 4):
            body = _let(
                [("zu", self._u(p, k)), ("zl", self._zig("zu"))],
                f"IF(zl < 0, NULL, "
                f"CAST(substring({self.v}, {p} + {k}, CAST(zl AS INT)) AS STRING))",
            )
            branches.append(f"WHEN {self.b(f'{p}+{k - 1}')} < 128 THEN {body}")
        return "(CASE " + " ".join(branches) + " END)"

    def raw(self, p: str) -> str:
        """Len-prefixed bytes at p as BINARY (wire NULL → NULL)."""
        branches = []
        for k in range(1, 4):
            body = _let(
                [("zu", self._u(p, k)), ("zl", self._zig("zu"))],
                f"IF(zl < 0, NULL, substring({self.v}, {p} + {k}, CAST(zl AS INT)))",
            )
            branches.append(f"WHEN {self.b(f'{p}+{k - 1}')} < 128 THEN {body}")
        return "(CASE " + " ".join(branches) + " END)"

    # -- value wire length by kind ---------------------------------------------

    def val_consumed(self, p: str) -> str:
        """Wire bytes consumed by the value whose kind byte sits at p.

        Single-byte guarantees used (violations yield a wrong cursor, which
        the end-of-record check catches — dropped, never silently wrong):
        kind tags (≤ 13), charset-name lengths, tz-string lengths, object
        subtype tags (≤ 6), DATETIME mo/d/h/mi/s segments (< 64 by value
        range). Multi-byte varints where values demand it: string lengths
        (3B → < 1 MiB), DATETIME year (3B), nanos (5B), TIMESTAMP
        seconds (7B) / micros (4B)."""
        str_c = f"1 + {self.strcons(f'({p}+1)')}"
        # CHARACTER: charset (1-byte len, even zigzag) then bytes
        char_c = _let(
            [("csb", self.b(f"({p}+1)"))],
            _let(
                [("csl", "IF(csb % 2 = 0 AND csb < 128, CAST(csb div 2 AS INT), NULL)"),
                 ("cbp", f"{p} + 2 + csl")],
                f"2 + csl + {self.strcons('cbp')}",
            ),
        )
        # TIMESTAMP: sec varint then micros varint
        ts_c = _let(
            [("tsp", f"({p}) + 1 + {self.vlen(f'({p}+1)', 7)}")],
            f"({self.vlen(f'({p}+1)', 7)}) + 1 + {self.vlen('tsp', 4)}",
        )
        # DATETIME / TIMESTAMP_TZ: bitmap (zigzag byte) + flagged segments
        dt_c = _let(
            [("dm", f"{self.b(f'({p}+1)')} div 2"),
             ("dyl", f"IF(dm % 2 = 1, {self.vlen(f'({p}+2)', 3)}, 0)"),
             ("dml", "IF(dm div 2 % 2 = 1, 1, 0) + IF(dm div 4 % 2 = 1, 1, 0)"
                     " + IF(dm div 8 % 2 = 1, 3, 0)"),
             ("dnp", f"({p}) + 2 + dyl + dml"),
             ("dnl", f"IF(dm div 16 % 2 = 1, {self.vlen('dnp', 5)}, 0)"),
             ("dtzp", "dnp + dnl"),
             ("dtzl", f"IF(dm div 32 % 2 = 1, "
                      f"1 + IF({self.b('dtzp')} % 2 = 0, "
                      f"CAST({self.b('dtzp')} div 2 AS INT), 0), 0)")],
            "2 + dyl + dml + dnl + dtzl",
        )
        # BINARY_OBJECT / TEXT_OBJECT: subtype tag (1 byte, codes ≤ 6) + body
        obj_c = f"2 + {self.strcons(f'({p}+2)')}"
        # the kind tag is a zigzag varint: kind k appears as byte 2*k
        return (
            f"(CASE {self.b(p)} "
            f"WHEN 0 THEN 1 WHEN 24 THEN 1 "
            f"WHEN 2 THEN {str_c} WHEN 6 THEN {str_c} WHEN 18 THEN {str_c} "
            f"WHEN 4 THEN {char_c} "
            f"WHEN 8 THEN 9 "
            f"WHEN 10 THEN {ts_c} "
            f"WHEN 12 THEN {dt_c} WHEN 14 THEN {dt_c} "
            f"WHEN 16 THEN {str_c} WHEN 26 THEN {str_c} "
            f"WHEN 20 THEN {obj_c} WHEN 22 THEN {obj_c} "
            f"END)"
        )


# ---------------------------------------------------------------------------
# the fold: one aggregate() walking header fields then (via the anchor jump)
# the image values — per-FIELD steps
# ---------------------------------------------------------------------------


def _mk_st(names):
    def st(**over: str) -> str:
        return "named_struct(" + ", ".join(
            f"'{n}', {over.get(n, 's.' + n)}" for n in names
        ) + ")"

    return st


def _hdr_fold_sql(value_col: str) -> str:
    """Header-essentials fold → struct(pos, id, ts, op, st, dbsl, tbsl,
    scsl). Steps over sequence(1, 10):
      1 id · 2 txid(skip) · 3 ts · 4 born(skip) · 5 op · 6 source_type ·
      7 source_version(skip) · 8 db · 9 tbl · 10 schema(v2 only).
    Final `pos` = header end (start of positions/tags region) — the tag
    search's lower bound. Kept SEPARATE from the images fold: interpreted
    aggregate() cost is dominated by accumulator-struct copies (measured
    ~20 ns/field/step), so two narrow folds beat one wide one ~2×."""
    q = _Frag(value_col)
    fields = [
        ("pos", "3"), ("id", "CAST(0 AS BIGINT)"), ("ts", "CAST(0 AS BIGINT)"),
        ("op", "CAST(-1 AS BIGINT)"), ("st", "CAST(-1 AS BIGINT)"),
        ("dbsl", "CAST(0 AS BIGINT)"), ("tbsl", "CAST(0 AS BIGINT)"),
        ("scsl", "CAST(0 AS BIGINT)"),
    ]
    st = _mk_st([n for n, _ in fields])
    p = "s.pos"
    born_skip = f"{p} + 1 + IF({q.b(p)} = 1, {q.vlen(f'({p}+1)', 7)}, 0)"
    ver2 = f"{q.b('2')} >= 2"
    # one shared header-string branch (txid/sv skips + db/tbl/schema slot
    # captures) so strcons/strslot appear once — plan-size economy
    hdr_str = _let(
        [("hsl", q.strslot(p))],
        st(
            pos=f"{p} + {q.strcons(p)}",
            dbsl="IF(i = 8, hsl, s.dbsl)",
            tbsl="IF(i = 9, hsl, s.tbsl)",
            scsl="IF(i = 10, hsl, s.scsl)",
        ),
    )
    merge = (
        "CASE"
        f" WHEN i = 1 THEN {st(pos=f'{p} + {q.vlen(p, 9)}', id=q.vz(p, 9))}"
        f" WHEN i = 3 THEN {st(pos=f'{p} + {q.vlen(p, 6)}', ts=q.vz(p, 6))}"
        f" WHEN i = 4 THEN {st(pos=born_skip)}"
        f" WHEN i = 5 THEN {st(pos=f'{p} + {q.vlen(p, 2)}', op=q.vz(p, 2))}"
        f" WHEN i = 6 THEN {st(pos=f'{p} + {q.vlen(p, 2)}', st=q.vz(p, 2))}"
        f" ELSE IF(i = 10 AND NOT ({ver2}), s, {hdr_str})"
        " END"
    )
    init = "named_struct(" + ", ".join(f"'{n}', {d}" for n, d in fields) + ")"
    return f"aggregate(sequence(1, 10), {init}, (s, i) -> {merge}, s -> s)"


def _img_fold_sql(value_col: str, nfields: int, images_start: str) -> str:
    """Image-boundaries fold → struct(pos, bf, af, v1..v{2nf}) where
    v-slots pack `kind * 2^24 + body_start`. Steps over
    sequence(1, 2*nfields + 2): 1 before-flag · 2..nf+1 before values ·
    nf+2 after-flag · nf+3..2nf+2 after values. Starts at the anchor-derived
    ``images_start`` — the header is never re-walked."""
    q = _Frag(value_col)
    fields = (
        [("pos", f"CAST({images_start} AS INT)"), ("bf", "0"), ("af", "0")]
        + [(f"v{i}", "CAST(0 AS BIGINT)") for i in range(1, 2 * nfields + 1)]
    )
    st = _mk_st([n for n, _ in fields])
    p = "s.pos"
    vcons = q.val_consumed(p)
    # un-zigzag the kind tag (byte 2*k → k) so slots carry the true kind
    vslot = f"(CAST({q.b(p)} div 2 AS BIGINT) * {_KS} + ({p}) + 1)"
    bslots = {f"v{i}": f"IF(i = {1 + i}, {vslot}, s.v{i})" for i in range(1, nfields + 1)}
    aslots = {
        f"v{nfields + i}": f"IF(i = {2 + nfields + i}, {vslot}, s.v{nfields + i})"
        for i in range(1, nfields + 1)
    }
    merge = (
        "CASE"
        f" WHEN i = 1 THEN {st(pos=f'{p} + 1', bf=q.b(p))}"
        f" WHEN i = {nfields + 2} THEN {st(pos=f'{p} + 1', af=q.b(p))}"
        # one shared value branch so the consumed-length tree appears ONCE
        f" ELSE IF(IF(i <= {nfields + 1}, s.bf, s.af) = 1, "
        f"{st(pos=f'{p} + {vcons}', **bslots, **aslots)}, s)"
        " END"
    )
    init = "named_struct(" + ", ".join(f"'{n}', {d}" for n, d in fields) + ")"
    return (
        f"aggregate(sequence(1, {2 * nfields + 2}), {init}, (s, i) -> {merge}, s -> s)"
    )


# ---------------------------------------------------------------------------
# typed extraction: slot → rendered value → declared type
# ---------------------------------------------------------------------------

#: charsets the JVM path decodes, mirroring `envelope.resolve_charset` for
#: the names real CDC streams carry; everything else takes render_value's
#: `charset_'hex'` fallback (resolvable-but-unlisted charsets diverge there —
#: route such tables through the Python decoder).
_CHARSETS = {
    "utf8": "UTF-8", "utf-8": "UTF-8", "utf8mb4": "UTF-8", "utf8mb3": "UTF-8",
    "ascii": "US-ASCII", "latin1": "ISO-8859-1", "iso-8859-1": "ISO-8859-1",
    # 'utf16' mirrors envelope.resolve_charset's utf-16-be PIN: Java's plain
    # 'UTF-16' consumes BOMs and would diverge from the Python path (which
    # keeps a BOM as U+FEFF); UTF-16BE matches byte-for-byte. The hyphenated
    # 'utf-16' (Python codec: BOM-sniff, LE default) has NO Java equivalent
    # and is deliberately absent — it takes the fallback render and such
    # tables route through the Python decoder (disclosed below).
    # DELIBERATE DEVIATION FROM THE REFERENCE (r8 ADVICE): upstream
    # StringValue.java resolves via Charset.forName("utf16") -> Java UTF-16,
    # which CONSUMES a leading BOM; both of this repo's paths instead
    # preserve it as U+FEFF so the JVM and Python tiers stay bit-identical
    # to each other (pinned by test_jvm_typed_utf16_charset_parity and the
    # README "Known divergences" list). A BOM-leading utf16 cell therefore
    # renders one extra U+FEFF character here vs the reference.
    "gbk": "GBK", "utf16": "UTF-16BE", "ucs2": "UTF-16BE",
}


def _wkt_num_sql(d: str) -> str:
    """JTS-style WKT ordinate text for the DOUBLE expression ``d``, pinned
    to `wire._wkt_num`: shortest-roundtrip digits rendered POSITIONALLY
    (never scientific), no fraction on whole values, ±Inf/NaN render
    'inf'/'-inf'/'nan', ±0 render '0'.

    Digits must match CPython repr's shortest correctly-rounded string —
    but Java 17's Double.toString is occasionally non-minimal
    (JDK-4511638, e.g. 1e23 → '9.999999999999999E22'), so the JVM string
    is only a CANDIDATE: if dropping its last digit still roundtrips, a
    roundtrip search over format_string('%.kE') rounded candidates
    (ascending k, first that casts back equal) recovers the true shortest
    string. The common case (JVM string already minimal) costs one extra
    format+cast; decimal grids are nested, so roundtripping precisions are
    upward-closed and the minimality test at len-1 is sound. The chosen
    scientific/plain string is then re-expanded into positional text.

    Known remote divergence (ADVICE r9): format_string('%.kE') rounds
    HALF_UP while CPython repr is correctly rounded (ties-to-even). A
    double whose exact decimal expansion ties EXACTLY at the minimal digit
    count — and which is ALSO only reached via the non-minimal
    Double.toString repair path — could therefore render with a final
    digit one off from the Python repr. Both renders would still roundtrip
    to the same double (the roundtrip equality check is what admits a
    candidate), so correctness of the value survives; only the digit
    string could differ. No such double has been constructed — the
    ordinate fuzz test (test_jvm_geom_ordinate_fuzz) has never hit one,
    and the repair path itself fires only on the rare JDK-4511638
    non-minimal strings."""
    # positional expansion of a sign-stripped candidate string bound as wc8
    expand = _let(
        [
            ("xe", "locate('E', wc8)"),
            ("xm", "IF(xe > 0, substring(wc8, 1, xe - 1), wc8)"),
            ("xx", "IF(xe > 0, CAST(substring(wc8, xe + 1) AS INT), 0)"),
            ("xd", "locate('.', xm)"),
            ("xg", "regexp_replace(replace(xm, '.', ''), '0+$', '')"),
            ("xp", "IF(xd > 0, xd - 1, length(xm)) + xx"),
            ("xi", "CASE WHEN xg = '' THEN '0' WHEN xp <= 0 THEN '0' "
                   "WHEN xp >= length(xg) THEN rpad(xg, xp, '0') "
                   "ELSE substring(xg, 1, xp) END"),
            ("xf", "regexp_replace(CASE WHEN xg = '' THEN '' WHEN xp <= 0 THEN "
                   "concat(repeat('0', -xp), xg) "
                   "WHEN xp >= length(xg) THEN '' "
                   "ELSE substring(xg, xp + 1) END, '0+$', '')"),
        ],
        "concat(xi, IF(xf = '', '', concat('.', xf)))",
    )
    # rt(k) for a RUNTIME k: does the correctly-rounded k-significant-digit
    # decimal of |d| cast back to |d|? (dynamic precision via a computed
    # format string keeps ONE template in the plan instead of 16 branches —
    # the first cut's static CASE chain doubled the render tree and the
    # typed tier's cold-plan cost)
    def rt(k_expr: str) -> str:
        return (
            f"CAST(format_string(concat('%.', CAST(({k_expr}) - 1 AS STRING), 'E'),"
            f" wa8) AS DOUBLE) = wa8"
        )

    # ascending minimal-k search, entered only when the JVM string is
    # non-minimal; the fold evaluates one format+cast per step until found
    search = _let(
        [("wf8", f"aggregate(sequence(1, CAST(wk8 - 1 AS INT)), 0, "
                 f"(wacc8, wi8) -> IF(wacc8 > 0, wacc8, IF({rt('wi8')}, wi8, 0)))")],
        "IF(wf8 > 0, format_string(concat('%.', CAST(wf8 - 1 AS STRING), 'E'), wa8),"
        " ws8)",
    )
    pos = _let(
        [
            ("wa8", f"abs({d})"),
            ("wj8", f"CAST({d} AS STRING)"),
            ("wn8", "substring(wj8, 1, 1) = '-'"),
            ("ws8", "IF(wn8, substring(wj8, 2), wj8)"),
            ("we8", "locate('E', ws8)"),
            ("wk8", "length(regexp_replace(replace("
                    "IF(we8 > 0, substring(ws8, 1, we8 - 1), ws8),"
                    " '.', ''), '0+$', ''))"),
            ("wc8", f"IF(wk8 <= 1 OR NOT ({rt('wk8 - 1')}), ws8, {search})"),
        ],
        f"concat(IF(wn8, '-', ''), {expand})",
    )
    return (
        f"CASE WHEN isnan({d}) THEN 'nan' "
        f"WHEN {d} = CAST('Infinity' AS DOUBLE) THEN 'inf' "
        f"WHEN {d} = CAST('-Infinity' AS DOUBLE) THEN '-inf' "
        f"WHEN {d} = 0.0D THEN '0' "  # ±0 both render '0'
        f"ELSE {pos} END"
    )


def _u64_hex_sql(g: str, p: str, le: str) -> str:
    """Hex string of the 8 bytes at 1-based position p of ``g``, byte-order
    normalized to big-endian (``le`` is a BOOLEAN expr)."""
    rev = ", ".join(f"hex(substring({g}, ({p}) + {j}, 1))" for j in reversed(range(8)))
    return f"IF({le}, concat({rev}), hex(substring({g}, {p}, 8)))"


def _dbl_at_sql(g: str, p: str, le: str) -> str:
    """IEEE-754 DOUBLE at position p of ``g`` (either byte order) — the
    FLOAT kind's exact 2^k reconstruction, generalized. Callers bounds-check
    p+7 <= octet_length(g); a short read here would mis-decode silently."""
    finite = (
        "CASE WHEN ge = 0 THEN gs * CAST(gm AS DOUBLE) * power(2.0D, -1074) "
        "ELSE gs * (CAST(gm AS DOUBLE) + 4503599627370496.0D)"
        " * power(2.0D, ge - 1075) END"
    )
    return _let(
        [("gu", f"CAST(conv({_u64_hex_sql(g, p, le)}, 16, 10) AS DECIMAL(20,0))"),
         ("ge", "CAST((gu div 4503599627370496) % 2048 AS INT)"),
         ("gm", "CAST(gu % 4503599627370496 AS BIGINT)"),
         ("gs", "IF(gu >= 9223372036854775808, -1.0D, 1.0D)")],
        f"CASE WHEN ge = 2047 THEN "
        f"IF(gm != 0, CAST('NaN' AS DOUBLE), "
        f"IF(gs < 0.0D, CAST('-Infinity' AS DOUBLE), CAST('Infinity' AS DOUBLE))) "
        f"ELSE {finite} END",
    )


def _u32_at_sql(g: str, p: str, le: str) -> str:
    """Unsigned 32-bit int at position p of ``g`` (either byte order) as
    BIGINT. Callers bounds-check p+3 <= octet_length(g)."""
    rev = ", ".join(f"hex(substring({g}, ({p}) + {j}, 1))" for j in reversed(range(4)))
    return (
        f"CAST(conv(IF({le}, concat({rev}), hex(substring({g}, {p}, 4))), 16, 10)"
        f" AS BIGINT)"
    )


def _pt_sql(g: str, p: str, le: str) -> str:
    """'x y' ordinate-pair text at position p (16 bytes, bounds-checked by
    the caller). The ordinate render rides a transform() over the two
    positions so its large expression tree appears ONCE per call site."""
    wn = _wkt_num_sql(_dbl_at_sql(g, "po8", le))
    return (
        f"array_join(transform(array(CAST({p} AS BIGINT), CAST(({p}) + 8 AS BIGINT)), "
        f"po8 -> {wn}), ' ')"
    )


def _geom_sql(raw_expr: str) -> str:
    """WKB → WKT render for a BINARY_GEOMETRY cell, pinned to
    `wire.wkb_to_wkt` + the hex fallback of `wire.render_value` (reference:
    JTS render `common/GeometryUtil.java:14-22`, ParseException→hex catch
    `value/WKBGeometry.java:42-48`). POINT/LINESTRING/POLYGON, both byte
    orders, optional EWKB SRID flag; anything else — Z/M flags, other
    geometry types, torn/short bytes, trailing bytes — falls back to
    lowercase hex exactly where the Python reader raises. Every byte read
    is bounds-checked BEFORE it happens, so garbage counts can't build
    runaway sequence() frames: ring/point counts are validated against the
    remaining byte budget first (any count the check rejects would also
    run Python's reader out of bounds → both paths hex)."""
    # NOTE on lambda nesting: every let-name here (g8/gl/ge8/gt/gw/gb/n8/
    # r8*/w*/g*) is distinct from its enclosing chain (sl → vp → these), so
    # no HOF variable shadowing occurs.
    g, gl, le = "g8", "gl8", f"(ascii(decode(substring(g8, 1, 1), 'ISO-8859-1')) = 1)"
    # linestring body at base gb with count n8 (n8 >= 1, bounds pre-checked)
    ring = (
        f"concat('(', array_join(transform(sequence(0, CAST(n8 - 1 AS INT)), "
        f"pj8 -> {_pt_sql(g, 'gb + 4 + pj8 * 16', 'ge8')}), ', '), ')')"
    )
    line_body = _let(
        [("n8", _u32_at_sql(g, "gb", "ge8"))],
        f"CASE WHEN {gl} != gb + 3 + 16 * n8 THEN NULL "
        f"WHEN n8 = 0 THEN 'LINESTRING ()' "
        f"ELSE concat('LINESTRING ', {ring}) END",
    )
    # polygon: fold over rings, each advancing the cursor by its own size;
    # state = (cursor, text, ok). nr8 is pre-capped by the byte budget
    # (each ring needs >= 4 bytes), so sequence() is bounded by gl/4.
    ring_at = (
        f"concat('(', array_join(transform(sequence(0, CAST(rn8 - 1 AS INT)), "
        f"pk8 -> {_pt_sql(g, 'rp8 + 4 + pk8 * 16', 'ge8')}), ', '), ')')"
    )
    ring_step = _let(
        [("rp8", "ac8.cur"),
         ("rn8", f"IF(ac8.cur + 3 <= {gl}, {_u32_at_sql(g, 'ac8.cur', 'ge8')}, NULL)")],
        f"IF(rn8 IS NOT NULL AND rp8 + 3 + 16 * rn8 <= {gl}, "
        f"named_struct('cur', rp8 + 4 + 16 * rn8, "
        f"'txt', concat(ac8.txt, IF(ri8 = 1, '', ', '), "
        f"IF(rn8 = 0, '()', {ring_at})), 'ok', true), "
        f"named_struct('cur', ac8.cur, 'txt', ac8.txt, 'ok', false))",
    )
    poly_fold = (
        f"aggregate(sequence(1, CAST(nr8 AS INT)), "
        f"named_struct('cur', CAST(gb + 4 AS BIGINT), 'txt', '', 'ok', true), "
        f"(ac8, ri8) -> IF(ac8.ok, {ring_step}, ac8))"
    )
    poly_done = _let(
        [("pf8", poly_fold)],
        f"IF(pf8.ok AND pf8.cur = {gl} + 1, "
        f"concat('POLYGON (', pf8.txt, ')'), NULL)",
    )
    poly_body = _let(
        [("nr8", _u32_at_sql(g, "gb", "ge8"))],
        f"CASE WHEN nr8 = 0 THEN IF({gl} = gb + 3, 'POLYGON ()', NULL) "
        f"WHEN nr8 > {gl} div 4 THEN NULL "
        f"ELSE {poly_done} END",
    )
    wkt = _let(
        [("ge8", le),
         ("gw", f"IF({gl} >= 5, {_u32_at_sql(g, '2', 'ge8')}, NULL)"),
         ("gt", "CAST(gw % 256 AS INT)"),
         ("gb", "IF((gw div 536870912) % 2 = 1, CAST(10 AS BIGINT), CAST(6 AS BIGINT))")],
        # flags check: type word may carry ONLY the low type byte + 0x20000000
        f"CASE WHEN gw IS NULL OR gw - (gw % 256)"
        f" - IF((gw div 536870912) % 2 = 1, 536870912, 0) != 0 THEN NULL "
        f"WHEN gt = 1 THEN IF({gl} = gb + 15, "
        f"concat('POINT (', {_pt_sql(g, 'gb', 'ge8')}, ')'), NULL) "
        f"WHEN gt = 2 THEN IF({gl} >= gb + 3, {line_body}, NULL) "
        f"WHEN gt = 3 THEN IF({gl} >= gb + 3, {poly_body}, NULL) "
        f"ELSE NULL END",
    )
    return _let(
        [("g8", raw_expr), ("gl8", "octet_length(g8)")],
        f"IF(g8 IS NULL, NULL, coalesce({wkt}, lower(hex(g8))))",
    )


def _render_sql(value_col: str, slot: str, with_geometry: bool = False) -> str:
    """Rendered STRING cell for one packed slot — semantics pinned to
    `wire.render_value`; the declared-type CAST happens outside (exactly
    `typed.project_table`'s map-string → cast contract; for FLOAT cells
    both engines cast their own exact shortest decimal rendering of the
    same double, so the value survives bit-exactly).

    This is generated ONCE per decode and applied to every cell through a
    shared `transform()` — one copy of the 13-kind tree in the plan instead
    of one per output column (optimizer time scales with tree size; the
    per-column version cost minutes of first-run planning at 32 cores).
    The slot expression must be cheap (a lambda variable).

    ``with_geometry`` gates the kind-8 WKB→WKT branch: measured r9, the
    UNTAKEN branch still costs ~1.8× at runtime (per-row cost tracks total
    expression size under the interpreted HOF path, laziness
    notwithstanding), so schemas with no geometry field keep the old
    NULL branch and pay nothing — the render specializes to the declared
    schema. `decode_typed_jvm` auto-enables it when any declared wire
    field is geometry-typed."""
    q = _Frag(value_col)
    v = value_col
    kind = f"CAST({slot} div {_KS} AS INT)"

    # CHARACTER: charset name (1-byte even-zigzag len) then bytes
    cs_branches = " ".join(
        f"WHEN '{w}' THEN decode(cby, '{j}')" for w, j in _CHARSETS.items()
    )
    char_sql = _let(
        [("csl", f"IF({q.b('vp')} % 2 = 0 AND {q.b('vp')} < 128, "
                 f"CAST({q.b('vp')} div 2 AS INT), NULL)"),
         ("csn", f"CAST(substring({v}, vp + 1, csl) AS STRING)"),
         ("cby", q.raw("(vp + 1 + csl)"))],
        f"CASE WHEN cby IS NULL THEN NULL "
        f"WHEN csl = 0 THEN lower(hex(cby)) "  # missing charset → bare hex
        f"ELSE CASE lower(csn) {cs_branches} "
        # unresolvable charset: render_value's `cs_'hex'`, original case
        f"ELSE concat(csn, '_''', lower(hex(cby)), '''') END END",
    )

    # FLOAT: 8 big-endian IEEE-754 bytes → DOUBLE via exact 2^k arithmetic.
    # ±Inf/NaN render the repr() strings 'inf'/'-inf'/'nan' and go through
    # CAST like the Python path does — so both engines raise under ANSI and
    # both yield NULL under non-ANSI, identically.
    def _float(body: str) -> str:
        return _let(
            [("fu", f"CAST(conv(hex(substring({v}, vp, 8)), 16, 10) AS DECIMAL(20,0))"),
             ("fe", "CAST((fu div 4503599627370496) % 2048 AS INT)"),
             ("fm", "CAST(fu % 4503599627370496 AS BIGINT)"),
             ("fs", "IF(fu >= 9223372036854775808, -1.0D, 1.0D)")],
            body,
        )

    special = "IF(fm != 0, 'nan', IF(fs < 0.0D, '-inf', 'inf'))"
    finite = (
        "CASE WHEN fe = 0 THEN fs * CAST(fm AS DOUBLE) * power(2.0D, -1074) "
        "ELSE fs * (CAST(fm AS DOUBLE) + 4503599627370496.0D)"
        " * power(2.0D, fe - 1075) END"
    )
    float_str = _float(
        f"IF(fe = 2047, {special}, CAST(({finite}) AS STRING))"
    )

    # TIMESTAMP: sec + micros varints → UTC render (session tz is UTC on
    # every load path, so timestamp→string matches Python's isoformat up to
    # trailing fraction zeros, which the declared-type cast normalizes; a
    # declared STRING column would diverge there — disclosed).
    ts_sql = _let(
        [("tsp", f"vp + {q.vlen('vp', 7)}")],
        f"CAST(timestamp_micros({q.vz('vp', 7)} * 1000000"
        f" + {q.vz('tsp', 4)}) AS STRING)",
    )

    # DATETIME / TIMESTAMP_TZ: segment-bitmap render, zero-date → NULL
    has = {name: f"(dm div {bit} % 2 = 1)" for name, bit in
           [("y", 1), ("mo", 2), ("d", 4), ("t", 8), ("ns", 16), ("tz", 32)]}
    date_part = (
        f"IF({has['y']}, concat(lpad(CAST(dy AS STRING), 4, '0'), "
        f"IF({has['mo']}, concat('-', lpad(CAST(dmo AS STRING), 2, '0'), "
        f"IF({has['d']}, concat('-', lpad(CAST(dd AS STRING), 2, '0')), '')), '')), NULL)"
    )
    time_part = (
        f"concat(lpad(CAST({q.b('dtp')} div 2 AS STRING), 2, '0'), ':', "
        f"lpad(CAST({q.b('dtp + 1')} div 2 AS STRING), 2, '0'), ':', "
        f"lpad(CAST({q.b('dtp + 2')} div 2 AS STRING), 2, '0'), "
        f"IF({has['ns']}, concat('.', lpad(CAST({q.vz('dnp', 5)} div 1000 AS STRING),"
        f" 6, '0')), ''))"
    )
    tz_part = (
        f"CAST(substring({v}, dtzp + 1, CAST({q.b('dtzp')} div 2 AS INT)) AS STRING)"
    )
    dt_sql = _let(
        [("dm", f"{q.b('vp')} div 2"),
         ("dyl", f"IF(dm % 2 = 1, {q.vlen('(vp + 1)', 3)}, 0)"),
         ("dy", f"IF(dm % 2 = 1, {q.vz('(vp + 1)', 3)}, NULL)"),
         ("dmp", "vp + 1 + dyl"),
         ("dmo", f"IF(dm div 2 % 2 = 1, CAST({q.b('dmp')} div 2 AS INT), NULL)"),
         ("ddp", "dmp + IF(dm div 2 % 2 = 1, 1, 0)"),
         ("dd", f"IF(dm div 4 % 2 = 1, CAST({q.b('ddp')} div 2 AS INT), NULL)"),
         ("dtp", "ddp + IF(dm div 4 % 2 = 1, 1, 0)"),
         ("dnp", "dtp + IF(dm div 8 % 2 = 1, 3, 0)"),
         ("dtzp", f"dnp + IF(dm div 16 % 2 = 1, {q.vlen('dnp', 5)}, 0)")],
        f"CASE WHEN coalesce(dy, 1) = 0 OR coalesce(dmo, 1) = 0"
        f" OR coalesce(dd, 1) = 0 THEN NULL "
        f"ELSE concat_ws(' ', {date_part}, IF({has['t']}, {time_part}, NULL), "
        f"IF({has['tz']}, {tz_part}, NULL)) END",
    )

    obj_txt = q.txt("(vp + 1)")  # skip single-byte subtype tag
    obj_hex = f"lower(hex({q.raw('(vp + 1)')}))"

    rendered = (
        f"CASE {kind} "
        f"WHEN 0 THEN NULL WHEN 12 THEN NULL "
        f"WHEN 1 THEN {q.txt('vp')} WHEN 3 THEN {q.txt('vp')} "
        f"WHEN 9 THEN {q.txt('vp')} "
        f"WHEN 2 THEN {char_sql} "
        f"WHEN 4 THEN {float_str} "
        f"WHEN 5 THEN {ts_sql} "
        f"WHEN 6 THEN {dt_sql} WHEN 7 THEN {dt_sql} "
        + (f"WHEN 8 THEN {_geom_sql(q.raw('vp'))} " if with_geometry else "")
        + f"WHEN 10 THEN {obj_hex} WHEN 11 THEN {obj_txt} "
        f"WHEN 13 THEN CAST({q.raw('vp')} AS STRING) "
        # unknown kinds (and kind 8 when no geometry field is declared):
        # NULL — the Python path renders geometry fully either way
        f"ELSE NULL END"
    )
    return _let([("vp", f"CAST({slot} % {_KS} AS INT)")], rendered)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def _anchor_sql(value_col: str, fd: bytes) -> str:
    """1-based byte position of the constant field-def section (0 = absent)."""
    return (
        f"locate(decode(X'{fd.hex()}', 'ISO-8859-1'), "
        f"decode({value_col}, 'ISO-8859-1'))"
    )


def _anchor_resolved_sql(value_col: str, fd: bytes) -> str:
    """Guard-verified anchor position with ONE retry (0 = no valid anchor).

    locate() finds the FIRST occurrence of the field-def bytes; a record
    whose header region (transaction id, source position, a tag value)
    happens to embed those bytes would otherwise shadow the true anchor
    and get dropped by the guard. The retry re-searches past a
    guard-failing first hit, so one embedded copy is tolerated; a record
    carrying TWO embedded copies before the real anchor is still dropped
    (skip semantics — bounded by design, the Python path decodes such
    records exactly)."""
    pat = f"decode(X'{fd.hex()}', 'ISO-8859-1')"
    dv = f"decode({value_col}, 'ISO-8859-1')"
    retry = _let(
        [("fd2", f"locate({pat}, {dv}, fd1 + 1)")],
        f"IF({_anchor_guard_sql(value_col, 'fd2')}, fd2, 0)",
    )
    return _let(
        [("fd1", f"locate({pat}, {dv})")],
        f"CASE WHEN {_anchor_guard_sql(value_col, 'fd1')} THEN fd1 "
        f"WHEN fd1 = 0 THEN 0 ELSE {retry} END",
    )


def _anchor_guard_sql(value_col: str, fd_col: str) -> str:
    """The anchor is real iff the zigzag varint of the implied payload
    length (payload = field defs + images = everything from the anchor on)
    ends exactly at the anchor. A same-bytes collision inside a value body
    cannot satisfy this (the guard reads the bytes just before the anchor)."""
    q = _Frag(value_col)
    z = f"(2 * (octet_length({value_col}) - {fd_col} + 1))"
    b1, b2, b3 = q.b(f"{fd_col} - 1"), q.b(f"{fd_col} - 2"), q.b(f"{fd_col} - 3")
    return (
        f"({fd_col} > 0 AND CASE "
        f"WHEN {z} < 128 THEN {b1} = {z} "
        f"WHEN {z} < 16384 THEN {b2} = 128 + {z} % 128 AND {b1} = {z} div 128 "
        f"WHEN {z} < 2097152 THEN {b3} = 128 + {z} % 128 "
        f"AND {b2} = 128 + ({z} div 128) % 128 AND {b1} = {z} div 16384 "
        f"ELSE false END)"
    )


def _rename_tag_sql(value_col: str, key: str, lo: str, hi: str) -> str:
    """Logical-rename tag value (`l_db_name`/`l_tb_name`) via byte search in
    the tag region (between header end `lo` and the anchor `hi`). Tag keys
    are written sorted, so the first in-range hit is the real tag
    (`LazyRecordDeserializer.java:319-322`). A key string inside another
    tag's VALUE that sorts before the real tag would mis-hit — disclosed
    caveat; the Python path parses tags exactly."""
    q = _Frag(value_col)
    key_b = len(key.encode())
    lit = bytes([key_b * 2]) + key.encode()  # zigzag(len) + key bytes
    loc = (
        f"locate(decode(X'{lit.hex()}', 'ISO-8859-1'), "
        f"decode({value_col}, 'ISO-8859-1'), greatest({lo}, 1))"
    )
    # value decode via the generic len-prefixed fragment (1-3 byte varint
    # lengths, so rename values up to <1 MiB decode — a single-byte-only
    # read would silently fall back to the PHYSICAL name for >=64-char
    # rename values and misfilter)
    return _let(
        [("tgl", loc), ("tvp", f"tgl + {key_b + 1}")],
        f"CASE WHEN tgl = 0 OR tgl > {hi} THEN NULL ELSE {q.txt('tvp')} END",
    )


def decode_typed_jvm(
    raw_df: DataFrame,
    schema: T.StructType,
    wire_fields: list[FieldDef],
    table: str,
    ops: tuple[str, ...] = ("INSERT", "UPDATE", "DELETE"),
    value_col: str = "value",
    include_metadata: bool = True,
    renames: str = "locate",
) -> DataFrame:
    """Raw CDC bytes → typed changelog rows with ZERO Python in the plan —
    the JVM twin of `decode_cdc(...)` → `project_table(...)` for a
    declared-schema table. Output matches the Python path column-for-column:
    ``(ts, record_id, *schema fields, op)`` with UPDATE doubled into UB/UA.

    ``wire_fields`` is the declared field list as the producer writes it
    (names/type_names/ids/encodings must match the wire bytes — they form
    the locate() anchor). ``renames='locate'`` honors l_db_name/l_tb_name
    overrides via tag byte-search; ``'off'`` treats physical names as final.

    Drop semantics are 'skip': records failing the validity contract
    (poison, anchor-guard failure, unsupported sizes, incomplete
    consumption) are removed JVM-side — expressions cannot raise.
    """
    if len(schema.fields) != len(wire_fields):
        raise ValueError("declared schema and wire field list must have equal arity")
    if renames not in ("locate", "off"):
        raise ValueError(f"renames must be 'locate' or 'off', got {renames!r}")
    from flink_dts_connector_spark.formats.jvmheader import _valid_sql, tier1_sql

    nf = len(wire_fields)
    fd = fielddef_bytes(wire_fields)
    v = value_col
    q = _Frag(v)
    # schema-specialized render: the WKB branch enters the plan only when a
    # declared field is geometry-typed (measured r9: even UNTAKEN, the
    # branch costs ~1.8x at runtime — expression size is not free under the
    # interpreted HOF path)
    with_geom = any("GEOM" in f.type_name.upper() for f in wire_fields)

    # Cheap cut only — NOT the full prefilter(): its lean header fold is
    # redundant here (the value fold + exact keep below re-derive op/table),
    # and measured it doubles the per-record cost. The contains() tier kills
    # foreign-table mass at byte-scan speed; the anchor guard then kills
    # anything without our exact field-def bytes (heartbeats, DDL,
    # other-schema tables); the generator keep is the exact residual.
    valid = f"({v} IS NOT NULL AND {_valid_sql(v)})"
    t1 = tier1_sql(v, [table])
    df = raw_df.where(F.expr(f"{valid} AND {t1}" if t1 else valid))
    df = df.withColumn("_fd", F.expr(_anchor_resolved_sql(v, fd)))
    df = df.where(F.col("_fd") > 0)
    df = df.withColumn("_th", F.expr(_hdr_fold_sql(v)))
    df = df.withColumn(
        "_ti", F.expr(_img_fold_sql(v, nf, images_start=f"_fd + {len(fd)}"))
    )

    # exact residual filter, folded into the explode generator: a record
    # that fails it explodes an empty array — no Filter node above the fold
    op_codes = sorted(int(OperationType[o]) for o in ops)
    db_s = q.sl_str("_th.dbsl")
    tb_s = q.sl_str("_th.tbsl")
    sc_s = f"IF({q.b('2')} < 2, NULL, {q.sl_str('_th.scsl')})"
    rendered_db = (
        f"IF(_th.st = {int(SourceType.SQLServer)}, concat('[', {db_s}, ']'), {db_s})"
    )
    rendered_tb = (
        f"IF(_th.st = {int(SourceType.SQLServer)}, "
        f"concat('[', coalesce({sc_s}, {db_s}), '].[', {tb_s}, ']'), {tb_s})"
    )
    if renames == "locate":
        eff_db = f"coalesce({_rename_tag_sql(v, 'l_db_name', '_th.pos', '_fd')}, {rendered_db})"
        eff_tb = f"coalesce({_rename_tag_sql(v, 'l_tb_name', '_th.pos', '_fd')}, {rendered_tb})"
    else:
        eff_db, eff_tb = rendered_db, rendered_tb
    tbl_lit = table.replace("'", "''")
    keep = (
        f"(_th.pos IS NOT NULL AND _th.pos <= _fd"
        f" AND _ti.pos IS NOT NULL AND _ti.pos = octet_length({v}) + 1"
        f" AND _th.op IN ({', '.join(map(str, op_codes))})"
        f" AND concat({eff_db}, '.', {eff_tb}) = '{tbl_lit}')"
    )

    def img(side: str) -> str:
        off = 0 if side == "b" else nf
        flag = "_ti.bf" if side == "b" else "_ti.af"
        cells = ", ".join(
            f"'s{i}', IF({flag} = 1, _ti.v{off + i}, CAST(0 AS BIGINT))"
            for i in range(1, nf + 1)
        )
        return f"named_struct({cells})"

    chg = (
        f"IF({keep}, CASE _th.op "
        f"WHEN {int(OperationType.INSERT)} THEN "
        f"array(named_struct('op', '{OP_INSERT}', 'img', {img('a')})) "
        f"WHEN {int(OperationType.DELETE)} THEN "
        f"array(named_struct('op', '{OP_DELETE}', 'img', {img('b')})) "
        f"ELSE array(named_struct('op', '{OP_UPDATE_BEFORE}', 'img', {img('b')}), "
        f"named_struct('op', '{OP_UPDATE_AFTER}', 'img', {img('a')})) END, "
        f"array())"
    )
    df = df.withColumn("_chg", F.explode(F.expr(chg)))

    # one shared render pass over the chosen image's slots (tree appears
    # once in the plan), then trivial per-column element_at + declared cast
    slots = ", ".join(f"_chg.img.s{i}" for i in range(1, nf + 1))
    df = df.withColumn(
        "_r",
        F.expr(
            f"transform(array({slots}), sl -> "
            f"{_render_sql(v, 'sl', with_geometry=with_geom)})"
        ),
    )
    cols: list[Column] = []
    if include_metadata:
        cols.append(F.expr("timestamp_seconds(_th.ts)").alias("ts"))
        cols.append(F.col("_th.id").alias("record_id"))
    for i, f in enumerate(schema.fields, start=1):
        cols.append(
            F.expr(f"CAST(_r[{i - 1}] AS {f.dataType.simpleString()})").alias(f.name)
        )
    cols.append(F.col("_chg.op").alias("op"))
    return df.select(*cols)
