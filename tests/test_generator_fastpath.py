"""r13 optimization round: the fused orders-stream encoder must be
byte-identical to encode_record over _records_for_order — every cdc_* query
hash rides on these bytes, so the equivalence is pinned over every branch
combination of the generator's record law (INSERT always; UPDATE %10;
UPDATE %7; DELETE %97; HEARTBEAT %50; DDL %200; and their overlaps)."""

from __future__ import annotations

import datetime as dt
from collections import namedtuple

from flink_dts_connector_spark.formats.wire import encode_record
from flink_dts_connector_spark.sources.generator import (
    _fast_order_records,
    _records_for_order,
)

Row = namedtuple(
    "Row",
    "o_orderkey o_custkey o_orderstatus o_totalprice o_orderdate o_orderpriority",
)

PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _row(k: int) -> Row:
    return Row(
        k,
        k % 1500 + 1,
        "OFP"[k % 3],
        100.0 + k * 1.37,
        dt.datetime(1995, 3, 14, 8, 0, 0) + dt.timedelta(days=k % 2400),
        PRIORITIES[k % 5],
    )


def test_fast_order_records_byte_identical():
    # 1..400 covers every single-branch case; the extras cover multi-branch
    # overlaps: %70 (both updates), %350/%9700/%33950 (updates+hb / +delete),
    # %200 DDL with updates, %194000 (hb+ddl+delete), max-ish keys
    keys = list(range(1, 401)) + [
        700, 970, 1400, 4850, 9700, 13580, 33950, 97000, 194000, 679000, 5999975,
    ]
    for k in keys:
        row = _row(k)
        ref = [(r.id, r.ts, encode_record(r)) for r in _records_for_order(row)]
        fast = _fast_order_records(row)
        assert len(ref) == len(fast), f"okey {k}: record count"
        for (ri, rt, rb), (fi, ft, fb) in zip(ref, fast):
            assert ri == fi and rt == ft, f"okey {k}: id/ts ({ri},{rt}) != ({fi},{ft})"
            assert rb == fb, f"okey {k} record {ri}: bytes differ"


def test_fast_order_records_price_edge_cases():
    # cents arithmetic: sub-dollar, exact dollar, large totals, .x0 cents
    for price in (0.01, 0.10, 1.00, 999999.99, 123456.70, 0.99, 10.05):
        row = Row(10, 7, "O", price, dt.datetime(1998, 12, 31, 23, 59, 59), "5-LOW")
        ref = [encode_record(r) for r in _records_for_order(row)]
        fast = [b for _, _, b in _fast_order_records(row)]
        assert ref == fast, f"price {price}"
