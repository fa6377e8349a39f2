"""Fixed-layout wire codec — the JVM-speed decode path.

The reference's DTS record payload is self-describing (per-field type tags,
variable length — `DtsRecord.java` lazy parse), which our `formats/wire.py`
mirrors; that layout cannot be decoded by Spark built-ins, so its decode
runs in Python (`SCALING.md` "wire decode ceiling"). THIS module is the
other half of the scale answer: when the producer can emit a FIXED layout,
encode and decode are pure column expressions — whole-stage-codegen'd,
zero Python, shipping the per-core ceiling from ~6.5k rec/s (Python varint
path) to JVM scan speed.

Layout (ASCII byte-pair hex for numerics — fixed 97 chars per record):

    off len field
      0   1 op            I / B (update-before) / A (update-after) / D
      1  16 record id     hex, zero-padded
     17  16 o_orderkey    hex
     33  16 o_custkey     hex
     49  16 price cents   hex
     65  16 order epoch ms hex
     81   1 o_orderstatus
     82  15 o_orderpriority, right-space-padded

Every encode/decode below is `concat/lpad/hex/conv/substring/trim` — all
JVM. Op/table filtering happens on `substring(value, 1, 1)` BEFORE any
field decode, preserving the reference's header-first laziness contract
(`DTSSubscribeRowDataDeserializationSchema.java:68-74`) in codegen form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

REC_LEN = 97


def _hex16(col: Column) -> Column:
    return F.lpad(F.hex(col.cast("bigint")), 16, "0")


def encode_orders_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the orders CDC stream RELATIONALLY (same semantics as the
    Python generator: every order INSERTs; %10 orders get a +10% price
    bump as UB/UA; %7 orders get a '9-RUSH' priority change as UB/UA —
    applied after the price bump; %97 orders are DELETEd last with their
    current image) and encode each record into the fixed layout with pure
    column expressions. Returns one column ``value: string``."""
    from flink_dts_connector_spark.session import load_table

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("c0"),
        F.unix_millis("o_orderdate").alias("ems"),
        "o_orderstatus",
        "o_orderpriority",
    )
    o = o.withColumn(
        "c1", F.expr("CASE WHEN o_orderkey % 10 = 0 THEN c0 + c0 div 10 ELSE c0 END")
    ).withColumn(
        "p1",
        F.expr("CASE WHEN o_orderkey % 7 = 0 THEN '9-RUSH' ELSE o_orderpriority END"),
    )

    def rec(op: str, rid: Column, cents: Column, prio: Column) -> Column:
        return F.concat(
            F.lit(op),
            _hex16(rid),
            _hex16(F.col("o_orderkey")),
            _hex16(F.col("o_custkey")),
            _hex16(cents),
            _hex16(F.col("ems")),
            F.substring(F.col("o_orderstatus"), 1, 1),
            F.rpad(prio, 15, " "),
        )

    k = F.col("o_orderkey")
    inserts = o.select(
        rec("I", k * 4, F.col("c0"), F.col("o_orderpriority")).alias("value")
    )
    u1 = o.where(k % 10 == 0)
    u1_rows = u1.select(
        rec("B", k * 4 + 1, F.col("c0"), F.col("o_orderpriority")).alias("value")
    ).unionAll(u1.select(rec("A", k * 4 + 1, F.col("c1"), F.col("o_orderpriority")).alias("value")))
    u2 = o.where(k % 7 == 0)
    u2_rows = u2.select(
        rec("B", k * 4 + 2, F.col("c1"), F.col("o_orderpriority")).alias("value")
    ).unionAll(u2.select(rec("A", k * 4 + 2, F.col("c1"), F.col("p1")).alias("value")))
    dels = o.where(k % 97 == 0).select(
        rec("D", k * 4 + 3, F.col("c1"), F.col("p1")).alias("value")
    )
    return inserts.unionAll(u1_rows).unionAll(u2_rows).unionAll(dels)


def decode_fixed(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Decode the fixed layout — every field one `conv(substring(...))`,
    all inside whole-stage codegen (guarded by
    tests/test_plan_shapes.py::test_fixed_wire_plan_jvm_only).

    Torn/truncated records (length != REC_LEN) are dropped BEFORE any
    field decode — the fixed layout's one-expression poison guard (the
    varint codec's richer per-field tolerance lives in `decoder.py`;
    `cdc_poison_rate` audits that path)."""
    df = df.where(F.length(F.col(value_col)) == REC_LEN)
    v = F.col(value_col)

    def num(off: int) -> Column:
        return F.conv(F.substring(v, off + 1, 16), 16, 10).cast("bigint")

    return df.select(
        F.substring(v, 1, 1).alias("op"),
        num(1).alias("record_id"),
        num(17).alias("o_orderkey"),
        num(33).alias("o_custkey"),
        num(49).alias("cents"),
        F.timestamp_millis(num(65)).alias("o_orderdate"),
        F.substring(v, 82, 1).alias("o_orderstatus"),
        F.rtrim(F.substring(v, 83, 15)).alias("o_orderpriority"),
    )


def fixed_sign(op: Column | str = "op") -> Column:
    """+1 for I/A (update-after), −1 for B (update-before)/D."""
    op = F.col(op) if isinstance(op, str) else op
    return (
        F.when(op.isin("I", "A"), F.lit(1)).when(op.isin("B", "D"), F.lit(-1)).otherwise(F.lit(0))
    )


# ---------------------------------------------------------------------------
# v2: fixed-slot VALUE-ZOO layout — the JVM twin of the self-describing
# union's scalar kinds (reference decode jump table
# `impl/LazyRecordDeserializer.java:152-260`). Where v1 above is one
# orders-shaped record, v2 covers the scalar ValueKinds with a kind-tagged
# fixed-width slot per field:
#
#     record := op(1) id_hex(16) slot*            (slot width = 40 chars)
#     slot   := kind(1) payload(39)
#     kind   'S': text-carried value (INTEGER digits / DECIMAL text incl.
#                 NaN/Infinity / CHARACTER post-charset-decode utf8 text):
#                 2-hex char-length + text (trailing-space safe)
#     kind   'F': FLOAT as sign char + 18-digit micro-scaled integer
#     kind   'T': TIMESTAMP as 16-hex micros-since-epoch
#     kind   'D': DATETIME, subkind 'F' full yyyyMMddHHmmss + 6-digit micros
#                            subkind 'P' date-only yyyyMMdd
#                            subkind 'Z' zero-date (renders NULL)
#     kind   'N': NULL / EMPTY
#
# Both encode and decode are pure column expressions (concat/lpad/conv/
# substring/date_add — zero Python, plan-guarded), and the decode's
# when-chain over the kind char IS the jump table, in codegen form.
# Timestamp rendering decomposes micros arithmetically over a DATE literal
# (date_add + lpad), so it is session-timezone-independent — date_format
# over a TIMESTAMP would render in local time and break across drivers.
# The CHARACTER slot carries post-charset-decode utf8 text: a fixed-slot
# producer normalizes encodings at write time (the self-describing wire +
# Python path keeps the full charset zoo, `formats/wire.py:render_value`).
# ---------------------------------------------------------------------------

ZOO_SLOT_W = 40


def _slot_text(text: Column) -> Column:
    """'S' + 2-hex char length + text, right-space-padded to the slot."""
    return F.rpad(
        F.concat(F.lit("S"), F.lpad(F.lower(F.hex(F.length(text))), 2, "0"), text),
        ZOO_SLOT_W,
        " ",
    )


def _slot_float_micros(v: Column) -> Column:
    """'F' + sign + 18-digit |value|*1e6 (exact for the layout's contract:
    producers quantize floats to micro precision at write time)."""
    micros = F.round(F.abs(v) * 1000000).cast("bigint")
    sign = F.when(v < 0, F.lit("-")).otherwise(F.lit("+"))
    return F.rpad(
        F.concat(F.lit("F"), sign, F.lpad(micros.cast("string"), 18, "0")),
        ZOO_SLOT_W,
        " ",
    )


def _slot_ts_micros(total_micros: Column) -> Column:
    return F.rpad(
        F.concat(F.lit("T"), F.lpad(F.hex(total_micros.cast("bigint")), 16, "0")),
        ZOO_SLOT_W,
        " ",
    )


def _slot_datetime(subkind: str, digits: Column | None) -> Column:
    body = F.lit("D" + subkind) if digits is None else F.concat(F.lit("D" + subkind), digits)
    return F.rpad(body, ZOO_SLOT_W, " ")


def _slot_null() -> Column:
    return F.rpad(F.lit("N"), ZOO_SLOT_W, " ")


#: (field name, expected rendering) — pure data, importable without an
#: active SparkContext; doubles as the DuckDB oracle rows
#: (`cdc_fixed_wire_zoo` builds a VALUES table from it).
ZOO_FIXED_EXPECTED: list[tuple[str, str | None]] = [
    ("z_long_min", str(-(2**63))),
    ("z_big_integer", str(2**70 + 7)),
    ("z_decimal", "12345.678901"),
    ("z_decimal_nan", "NaN"),
    ("z_decimal_inf", "-Infinity"),
    ("z_utf8", "héllo 🎉"),
    ("z_trailing_space", "pad  "),
    ("z_double", "-2.5"),
    ("z_double_frac", "1234.56789"),
    ("z_ts", "2023-11-14 22:13:20.123456"),
    ("z_datetime", "2024-02-29 23:59:59.123456"),
    ("z_partial_date", "2024-05-17"),
    ("z_zero_date", None),
    ("z_null", None),
]


#: the fixed-zoo schema: (field name, slot expression, expected rendering).
def zoo_fixed_cases() -> list[tuple[str, Column, str | None]]:
    cases = _zoo_fixed_cases()
    assert [(n, e) for n, _, e in cases] == ZOO_FIXED_EXPECTED
    return cases


def _zoo_fixed_cases() -> list[tuple[str, Column, str | None]]:
    return [
        ("z_long_min", _slot_text(F.lit(str(-(2**63)))), str(-(2**63))),
        ("z_big_integer", _slot_text(F.lit(str(2**70 + 7))), str(2**70 + 7)),
        ("z_decimal", _slot_text(F.lit("12345.678901")), "12345.678901"),
        ("z_decimal_nan", _slot_text(F.lit("NaN")), "NaN"),
        ("z_decimal_inf", _slot_text(F.lit("-Infinity")), "-Infinity"),
        ("z_utf8", _slot_text(F.lit("héllo 🎉")), "héllo 🎉"),
        ("z_trailing_space", _slot_text(F.lit("pad  ")), "pad  "),
        ("z_double", _slot_float_micros(F.lit(-2.5)), "-2.5"),
        ("z_double_frac", _slot_float_micros(F.lit(1234.56789)), "1234.56789"),
        (
            "z_ts",
            _slot_ts_micros(F.lit(1700000000 * 1000000 + 123456)),
            "2023-11-14 22:13:20.123456",
        ),
        (
            "z_datetime",
            _slot_datetime("F", F.lit("20240229235959123456")),
            "2024-02-29 23:59:59.123456",
        ),
        ("z_partial_date", _slot_datetime("P", F.lit("20240517")), "2024-05-17"),
        ("z_zero_date", _slot_datetime("Z", None), None),
        ("z_null", _slot_null(), None),
    ]


def encode_zoo_fixed(spark: SparkSession, n_copies: int = 64) -> DataFrame:
    """N copies of the fixed-zoo record, spread across partitions (the
    render must be location-independent, like the varint zoo fixture).
    Pure column expressions: op + 16-hex id + one slot per field."""
    cases = zoo_fixed_cases()
    rec = F.concat(
        F.lit("I"), F.lpad(F.hex(F.col("id")), 16, "0"), *[slot for _, slot, _ in cases]
    )
    return spark.range(n_copies).repartition(8).select(rec.alias("value"))


def decode_zoo_fixed(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Fixed-zoo decode + render: one (field, rendered) row per field —
    the column-expression jump table. Torn records (wrong length) drop
    before any slot is read, like `decode_fixed`."""
    cases = zoo_fixed_cases()
    rec_len = 17 + ZOO_SLOT_W * len(cases)
    df = df.where(F.length(F.col(value_col)) == rec_len)
    v = F.col(value_col)

    def render_slot(i: int) -> Column:
        o = 18 + i * ZOO_SLOT_W  # 1-based start of slot i
        kind = F.substring(v, o, 1)
        body = F.substring(v, o + 1, ZOO_SLOT_W - 1)
        # the slot payload after kind+2-hex-length is ZOO_SLOT_W - 3 chars;
        # clamp the read there and render NULL for a corrupt length field so
        # a bad record can never silently bleed into the neighboring slot
        max_text = ZOO_SLOT_W - 3
        text_len = F.conv(F.substring(v, o + 1, 2), 16, 10).cast("int")
        safe_len = F.when(text_len <= F.lit(max_text), text_len)
        text = F.substring(v, o + 3, max_text).substr(F.lit(1), safe_len)
        sign = F.when(F.substring(v, o + 1, 1) == "-", F.lit(-1)).otherwise(F.lit(1))
        fmicros = F.conv(F.substring(v, o + 2, 18), 10, 10).cast("bigint")
        fval = (sign * fmicros).cast("double") / 1000000.0
        tmicros = F.conv(F.substring(v, o + 1, 16), 16, 10).cast("bigint")
        # tz-independent render: date arithmetic over a DATE anchor + lpad'd
        # time digits (never date_format over a TIMESTAMP)
        days = (tmicros / F.lit(86400000000)).cast("bigint")
        rem = tmicros - days * F.lit(86400000000)
        t_render = F.concat(
            F.date_format(F.date_add(F.lit("1970-01-01").cast("date"), days.cast("int")), "yyyy-MM-dd"),
            F.lit(" "),
            F.lpad((rem / F.lit(3600000000)).cast("bigint").cast("string"), 2, "0"),
            F.lit(":"),
            F.lpad(((rem / F.lit(60000000)).cast("bigint") % 60).cast("string"), 2, "0"),
            F.lit(":"),
            F.lpad(((rem / F.lit(1000000)).cast("bigint") % 60).cast("string"), 2, "0"),
            F.lit("."),
            F.lpad((rem % F.lit(1000000)).cast("string"), 6, "0"),
        )
        dsub = F.substring(v, o + 1, 1)
        ddigits = F.substring(v, o + 2, 20)
        d_full = F.concat(
            F.substring(ddigits, 1, 4), F.lit("-"), F.substring(ddigits, 5, 2),
            F.lit("-"), F.substring(ddigits, 7, 2), F.lit(" "),
            F.substring(ddigits, 9, 2), F.lit(":"), F.substring(ddigits, 11, 2),
            F.lit(":"), F.substring(ddigits, 13, 2), F.lit("."),
            F.substring(ddigits, 15, 6),
        )
        d_partial = F.concat(
            F.substring(ddigits, 1, 4), F.lit("-"), F.substring(ddigits, 5, 2),
            F.lit("-"), F.substring(ddigits, 7, 2),
        )
        # float render: CAST(double AS STRING) (Java minimal repr — the
        # layout contract pins producer values to plain-decimal magnitudes)
        return (
            F.when(kind == "N", F.lit(None).cast("string"))
            .when(kind == "S", text)
            .when(kind == "F", fval.cast("string"))
            .when(kind == "T", t_render)
            .when(
                kind == "D",
                F.when(dsub == "Z", F.lit(None).cast("string"))
                .when(dsub == "P", d_partial)
                .otherwise(d_full),
            )
            .otherwise(F.concat(F.lit("??"), body))
        )

    pairs = F.array(
        *[
            F.struct(F.lit(name).alias("field"), render_slot(i).alias("rendered"))
            for i, (name, _, _) in enumerate(cases)
        ]
    )
    return df.select(
        F.substring(v, 1, 1).alias("op"),
        F.conv(F.substring(v, 2, 16), 16, 10).cast("bigint").alias("record_id"),
        F.explode(pairs).alias("fr"),
    ).select("op", "record_id", "fr.field", "fr.rendered")
