#!/usr/bin/env python
"""Synthesize a local sf1 (10x sf0.1) dataset for the third point of the
shuffle-linearity curve (SCALING.md §shuffle-linearity).

The driver's testdata stops at sf0.1; sf1 is built deterministically from
it — 10 concatenated copies with RE-KEYED entity ids (every key column
shifted by copy_index * (max_key + 1), consistently across fact and
dimension tables so joins stay referentially intact). Two columns get a
per-copy DECORRELATION so data semantics scale linearly instead of
quadratically:

- documents.text: copies 1..9 suffix every token with `_c<k>` — without
  it, each doc would have 9 identical twins and every near-dup/LSH bucket
  would deepen 10x, making pair generation grow 100x BY DATA SEMANTICS
  (a real duplicate explosion, not an implementation leak — wrong thing
  to measure).
- embeddings.embedding: copies 1..9 nudge the first component by k/1000
  so exact-duplicate vectors don't stack in ANN cells.

region/nation are fixed dimension tables and are copied once, unscaled —
exactly like TPC-H, where nation/region do not scale with SF.

Output: <repo>/sf1_data/*.parquet (gitignored). Deterministic: pure
column arithmetic over the seed-pinned sf0.1 fixtures, no RNG.

Usage: python tools/gen_sf1.py [out_dir] [--copies N] [--tables a,b,c]

r13: ``--copies 100 --tables documents,embeddings,events --embed-rotate``
builds the sf10 SUBSET for the third decade step (BENCH_r13_sf10.json) —
same re-keying and decorrelation laws, two orders of magnitude over
sf0.1. The token suffix `_c<k>` grows with k, so the documents MASS
ratio vs sf0.1 exceeds the ×100 row ratio — per SCALING.md's r12 rule
every linearity claim divides by SUM(LENGTH(text)), not row counts.

``--embed-rotate`` replaces the first-component nudge with a per-copy
CIRCULAR ROTATION (+ whole-vector negation for copies ≥ 64): the nudge
is decorrelation enough for exact-duplicate stacking but NOT for
threshold-cosine at 0.35 — at 100 copies every vector would gain ~99
near-twins (cos ≈ 1), a ×copies² DATA-SEMANTICS pair explosion that
would swamp the implementation measurement, the embedding analogue of
the documents problem the `_c<k>` suffix solves. Rotation preserves
norms and component distributions while sending copy-twin cosines to
~0/−1 ((rot, neg) is unique per copy below 128). sf1_data keeps the
historical nudge law — its oracle sweeps pin that fixture.
"""

from __future__ import annotations

import os
import sys

SRC = "/root/testdata/sf0.1"
COPIES = 10

#: key columns to shift per table: {table: {column: stride_source_column}}
#: stride_source_column names the table+column whose max defines the stride,
#: so foreign keys shift by the SAME stride as the primary they reference.
KEYED = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "events": {
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
    },
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}
UNSCALED = ["region", "nation"]


def main() -> None:
    import duckdb

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    args = sys.argv[1:]
    copies = COPIES
    tables = None
    embed_rotate = False
    pos = []
    i = 0
    while i < len(args):
        if args[i] == "--copies":
            copies = int(args[i + 1])
            i += 2
        elif args[i] == "--tables":
            tables = args[i + 1].split(",")
            i += 2
        elif args[i] == "--embed-rotate":
            embed_rotate = True
            i += 1
        else:
            pos.append(args[i])
            i += 1
    out_dir = pos[0] if pos else os.path.join(repo, "sf1_data")
    keyed = {t: c for t, c in KEYED.items() if tables is None or t in tables}
    unscaled = [t for t in UNSCALED if tables is None or t in tables]
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()

    strides: dict[tuple[str, str], int] = {}
    for tbl, cols in keyed.items():
        for _, src in cols.items():
            if src not in strides:
                strides[src] = (
                    con.execute(
                        f"SELECT max({src[1]}) + 1 FROM read_parquet('{SRC}/{src[0]}.parquet')"
                    ).fetchone()[0]
                )

    for tbl in unscaled:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{tbl}.parquet')) "
            f"TO '{out_dir}/{tbl}.parquet' (FORMAT PARQUET)"
        )
        print(f"{tbl}: copied unscaled")

    for tbl, cols in keyed.items():
        desc = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{tbl}.parquet')"
        ).fetchall()
        names = [d[0] for d in desc]
        selects = []
        for k in range(copies):
            exprs = []
            for c in names:
                if c in cols:
                    exprs.append(f"{c} + {k * strides[cols[c]]} AS {c}")
                elif tbl == "documents" and c == "text" and k > 0:
                    exprs.append(
                        f"regexp_replace(text, '(\\S+)', '\\1_c{k}', 'g') AS text"
                    )
                elif tbl == "embeddings" and c == "embedding" and k > 0:
                    if embed_rotate:
                        rot, neg = k % 64, k >= 64
                        base = (
                            "embedding"
                            if rot == 0
                            else f"list_concat(embedding[{rot + 1}:], embedding[1:{rot}])"
                        )
                        if neg:
                            base = f"list_transform({base}, v -> -v)"
                        exprs.append(f"CAST({base} AS FLOAT[]) AS embedding")
                    else:
                        exprs.append(
                            "CAST(list_prepend(embedding[1] + "
                            f"{k / 1000.0}, embedding[2:]) AS FLOAT[]) AS embedding"
                        )
                else:
                    exprs.append(c)
            selects.append(
                f"SELECT {', '.join(exprs)} FROM read_parquet('{SRC}/{tbl}.parquet')"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) "
            f"TO '{out_dir}/{tbl}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out_dir}/{tbl}.parquet')"
        ).fetchone()[0]
        print(f"{tbl}: {n} rows")
    print(f"sf1 written to {out_dir}")


if __name__ == "__main__":
    main()
