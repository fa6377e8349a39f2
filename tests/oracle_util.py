"""Local re-implementation of the driver's oracle comparison: run a registry
query on Spark and its oracle SQL on DuckDB over the same parquet tables,
then compare row count + order-insensitive values (columns sorted by name).

Exactness: the engine's determinism contract (plans/registry.py) means float
cells must match BIT-EXACTLY — no tolerance is applied, so any
order-sensitivity bug shows up locally before the driver sees it.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = {}
    for r in rows:
        key = tuple(_norm_cell(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


# duckdb type name → acceptable Spark simpleString prefixes. Catches the
# int-vs-bigint class of schema drift the driver's gate would flag.
_TYPE_MAP = {
    "BIGINT": ("bigint",),
    "INTEGER": ("int",),
    "DOUBLE": ("double",),
    "FLOAT": ("float", "double"),
    "VARCHAR": ("string",),
    "TIMESTAMP": ("timestamp",),
    "DATE": ("date",),
    "BOOLEAN": ("boolean",),
    # HUGEINT deliberately absent: an uncast SUM(<integer>) makes DuckDB
    # return HUGEINT, and the driver's value hash then diverges from Spark's
    # BIGINT even when the numbers agree (3 red rows in round 1). Oracle SQL
    # must CAST(SUM(...) AS BIGINT); check_schema_types rejects HUGEINT.
}


def check_schema_types(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    d_types = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
    s_types = {f.name: f.dataType.simpleString() for f in spark_df.schema.fields}
    for col, dt in d_types.items():
        base = dt.split("(")[0]
        assert base != "HUGEINT", (
            f"oracle column {col} is HUGEINT — wrap the SUM in CAST(... AS BIGINT) "
            "or the driver's hash gate will fail even with identical values"
        )
        ok = _TYPE_MAP.get(base)
        if ok is None:
            continue  # unmapped duckdb type — value compare still applies
        st = s_types.get(col, "<missing>")
        assert any(st.startswith(p) for p in ok), f"type drift on {col}: spark={st} duckdb={dt}"


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"column mismatch: {s_cols} vs {d_cols}"
    check_schema_types(spark_df, con, sql)
    assert len(s_rows) == len(d_rows), f"row count: spark={len(s_rows)} duckdb={len(d_rows)}"
    ms_s, ms_d = _multiset(s_rows, s_cols), _multiset(d_rows, d_cols)
    if ms_s != ms_d:
        only_s = {k: c for k, c in ms_s.items() if ms_d.get(k) != c}
        only_d = {k: c for k, c in ms_d.items() if ms_s.get(k) != c}
        raise AssertionError(
            "value mismatch\n"
            f"  spark-only (≤5): {list(only_s.items())[:5]}\n"
            f"  duckdb-only (≤5): {list(only_d.items())[:5]}"
        )
