"""Hilbert curve transform (operators/curation.py): the unrolled SQL steps
must equal the canonical xy2d loop for every grid cell, in BOTH engines,
and the curve must have its defining adjacency property (consecutive d →
grid neighbors), which Morton lacks."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from flink_dts_connector_spark.operators.curation import (
    hilbert_d_py,
    hilbert_sql_steps,
)


def test_reference_is_a_bijection_with_adjacency():
    """Exhaustive at 32x32: xy2d is a bijection onto [0, 1024) and every
    consecutive pair of curve positions is grid-adjacent (Manhattan
    distance exactly 1) — the property that makes equal-size shards cover
    tighter rectangles than Morton."""
    pos = {}
    for x in range(32):
        for y in range(32):
            d = hilbert_d_py(5, x, y)
            assert 0 <= d < 1024
            pos[d] = (x, y)
    assert len(pos) == 1024
    for d in range(1023):
        (x0, y0), (x1, y1) = pos[d], pos[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1, (d, pos[d], pos[d + 1])


def test_sql_steps_match_reference_duckdb():
    con = duckdb.connect()
    steps = hilbert_sql_steps(8)
    sql = (
        "WITH base AS (SELECT x.x AS xb, y.y AS yb"
        " FROM (SELECT unnest(generate_series(0, 255, 7)) AS x) x,"
        " (SELECT unnest(generate_series(0, 255, 11)) AS y) y)"
    )
    prev = "base"
    for i in range(0, len(steps), 3):
        cols = ", ".join(f"{e} AS {a}" for a, e in steps[i : i + 3])
        name = f"s{i // 3}"
        sql += f", {name} AS (SELECT *, {cols} FROM {prev})"
        prev = name
    rows = con.execute(f"{sql} SELECT xb, yb, hd7 FROM {prev}").fetchall()
    assert len(rows) >= 800
    for x, y, d in rows:
        assert d == hilbert_d_py(8, x, y), (x, y, d)


def test_sql_steps_match_reference_spark(spark):
    grid = (
        spark.range(0, 256, 13)
        .select(F.col("id").alias("xb"))
        .crossJoin(spark.range(0, 256, 19).select(F.col("id").alias("yb")))
    )
    cur = grid
    for alias, expr in hilbert_sql_steps(8):
        cur = cur.withColumn(alias, F.expr(expr))
    for r in cur.select("xb", "yb", "hd7").collect():
        assert r["hd7"] == hilbert_d_py(8, r["xb"], r["yb"]), (r["xb"], r["yb"])
