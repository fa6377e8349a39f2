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
