#!/usr/bin/env python
"""Driver-gate simulator: run EVERY registry query at a given SF in a
vanilla SparkSession (no repo confs — mirrors the external driver) and
compare against its DuckDB oracle: row count, schema (column names), and an
order-insensitive value hash. Also flags vacuous results (0 rows) — the
round-1 lesson that threshold queries can silently go empty at bigger SFs.

Usage:  python tools/sweep.py [--json OUT.json] [sf_dir] [query_name ...]
Output: one line per query + a summary; exit 1 on any failure. With
--json, also writes a CORRECTNESS-style per-query artifact (the in-repo
record of full-registry verification — the driver's own gate caps at 50).
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

#: queries whose result is legitimately empty/small at some SFs (none today —
#: add names here only with a comment justifying it)
ALLOW_EMPTY: set[str] = set()


def norm(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def hash_rows(cols, rows) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    import duckdb

    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(repo, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.ui.enabled", "false")
        # local-mode default heap is 1g — too small for the sf0.1 sweep
        # (the driver JVM hosts all executor threads); still a VANILLA
        # session in every conf the gate cares about
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, osql = mod.queries(), mod.oracle_sql()
    names = sorted(n for n in qs if not only or n in only)
    fails, rows_only, empty = [], [], []
    results: dict[str, dict] = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, sf_dir)
            scols = df.columns
            srows = [[r[c] for c in scols] for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {type(e).__name__}: {e}", flush=True)
            fails.append(name)
            results[name] = {"err": f"{type(e).__name__}: {e}"}
            continue
        el = time.perf_counter() - t0
        if len(srows) == 0 and name not in ALLOW_EMPTY:
            print(f"EMPTY {name} ({el:.1f}s)", flush=True)
            empty.append(name)
            results[name] = {"spark_rows": 0, "err": "empty result"}
            continue
        sql = osql.get(name)
        if sql is None:
            rows_only.append(name)
            print(f"rows  {name}: {len(srows)} rows (no oracle) ({el:.1f}s)", flush=True)
            results[name] = {"spark_rows": len(srows), "rows_only": True, "err": None}
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"OERR {name}: {type(e).__name__}: {e}", flush=True)
            fails.append(name)
            results[name] = {"err": f"oracle: {type(e).__name__}: {e}"}
            continue
        ok_rows = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        ok_hash = ok_schema and hash_rows(scols, srows) == hash_rows(ocols, orows)
        results[name] = {
            "rows_match": ok_rows,
            "schema_match": ok_schema,
            "hash_match": ok_hash,
            "spark_rows": len(srows),
            "oracle_rows": len(orows),
            "sec": round(el, 1),
            "err": None,
        }
        if ok_rows and ok_schema and ok_hash:
            print(f"OK   {name}: {len(srows)} rows ({el:.1f}s)", flush=True)
        else:
            print(
                f"FAIL {name}: rows {len(srows)}/{len(orows)} "
                f"schema={ok_schema} hash={ok_hash} ({el:.1f}s)",
                flush=True,
            )
            fails.append(name)
    print(
        f"\nsummary: {len(names)} run, {len(fails)} failed, "
        f"{len(empty)} empty, {len(rows_only)} rows-only: {sorted(rows_only)}"
    )
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "queries": results}, f, indent=1)
        print(f"wrote {json_out}")
    if fails or empty:
        print("FAILED:", sorted(fails + empty))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
