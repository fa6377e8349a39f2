#!/usr/bin/env python
"""Full-registry sf1 sweep over the PROGRAMMATICALLY enumerated
magnitude-safe subset (r8 verdict item 2).

The registry's determinism contract routes money aggregates through exact
DECIMALs and casts the FINAL value to DOUBLE. DuckDB's DECIMAL(38,6)→DOUBLE
conversion is only correctly rounded while the scaled numerator stays under
2^53 — i.e. |value| < ~9.0e9 at scale 6 (`plans/registry.py` header). At
sf1 some aggregates exceed that, so their hash comparison would test
DuckDB's rounding, not this engine. This tool therefore:

1. runs every query's DuckDB oracle at sf1 FIRST and asserts the
   2^53-safe bound on every FLOAT output cell (integers compare exactly at
   any magnitude — only the decimal→double cast is lossy);
2. excludes violators with the measured max magnitude as the listed
   reason (no silent caps), plus rows-only queries (no oracle to compare)
   and oracles that exceed the per-query time budget;
3. sweeps everything else Spark-vs-DuckDB with the same rows/schema/hash
   compare the driver gate uses.

Usage: python tools/sweep_sf1.py [--json OUT.json] [sf_dir] [query ...]
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sweep import TABLES, hash_rows  # noqa: E402

SAFE_ABS = 9.0e9  # |double| bound for correctly-rounded DECIMAL(38,6)→DOUBLE
ORACLE_BUDGET_SEC = 900  # DuckDB per-oracle wall budget (interrupt + exclude)

#: threshold queries whose result is legitimately EMPTY at sf1 — both
#: engines agree on zero rows, and the same query is non-vacuous and
#: hash-green at sf0.01/0.1. Add names only with the reason spelled out.
ALLOW_EMPTY_SF1 = {
    # k-anonymity audit (k=5): the 50k-doc sf1 corpus has no
    # (lang, source, len_bucket) group smaller than 5 — nothing violates
    "privacy_k_anonymity",
}


def run_oracle(con, sql: str):
    """Run one oracle with a wall-clock budget; returns (cols, rows) or
    raises. A timer interrupts DuckDB so a pathological sf1 oracle can't
    hang the sweep. The interrupt is gated on a `done` flag checked inside
    the callback (ADVICE r9): without it, a timer firing between fetchall()
    returning and timer.cancel() would interrupt the SHARED connection and
    abort the NEXT query's oracle, mislabeling a healthy query as
    budget-exceeded."""
    done = threading.Event()
    lock = threading.Lock()  # makes check-then-interrupt atomic vs. completion

    def _interrupt():
        with lock:
            if not done.is_set():
                con.interrupt()

    timer = threading.Timer(ORACLE_BUDGET_SEC, _interrupt)
    timer.start()
    try:
        res = con.execute(sql)
        cols = [d[0] for d in res.description]
        rows = res.fetchall()
        return cols, rows
    finally:
        with lock:
            done.set()
        timer.cancel()


def float_bound_violation(rows, bound: float = SAFE_ABS) -> float | None:
    """Max |float cell| if any exceeds ``bound``, else None. NaN/Inf pass
    (they survive both engines' casts bit-exactly).

    The bound is tag-driven (r10, VERDICT r9 #7):
      * default: SAFE_ABS = 9.0e9, the DECIMAL(38,6)->DOUBLE bound;
      * ``dec2``: the query's final casts use DECIMAL(38,2) in BOTH
        engines (dsum2, plans/relational.py) -> bound 9.0e13;
      * ``i64dbl``: every float output is an int64/exact-integer ->
        double conversion or arithmetic thereon — correctly rounded in
        both engines at any magnitude -> no bound."""
    import math

    worst = None
    for r in rows:
        for v in r:
            if isinstance(v, float) and math.isfinite(v) and abs(v) >= bound:
                if worst is None or abs(v) > worst:
                    worst = abs(v)
    return worst


def bound_for_tags(qtags: tuple) -> float:
    if "i64dbl" in qtags:
        return float("inf")
    if "dec2" in qtags:
        return 9.0e13
    return SAFE_ABS


def main() -> int:
    import duckdb

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
    sf_dir = args[0] if args else os.path.join(repo, "sf1_data")
    only = set(args[1:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]"
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # sf1 tables are single parquet files; the 128m default yields 1-2
        # input splits and idles the cores. Smaller splits = full
        # parallelism AND a harsher partition-order scramble for the
        # order-insensitive hash to survive — a stronger determinism test,
        # not a weaker gate.
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    con.execute("SET memory_limit='32GB'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    from flink_dts_connector_spark.plans.registry import all_queries

    tags = {n: q.tags for n, q in all_queries().items()}
    qs, osql = mod.queries(), mod.oracle_sql()
    names = sorted(n for n in qs if not only or n in only)
    excluded: dict[str, str] = {}
    results: dict[str, dict] = {}
    fails: list[str] = []
    for name in names:
        sql = osql.get(name)
        if sql is None:
            excluded[name] = "no SQL oracle (rows-only contract)"
            print(f"SKIP {name}: rows-only", flush=True)
            continue
        # r12: snapshot oracles are no longer sf1 holes — tools/gen_snapshots.py
        # pins an sf1 content-key block (VALUES or committed parquet), so the
        # snapshot-tagged queries sweep at sf1 like everything else.
        t0 = time.perf_counter()
        try:
            ocols, orows = run_oracle(con, sql)
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            if "INTERRUPT" in msg.upper() or "interrupted" in msg.lower():
                excluded[name] = f"oracle exceeded {ORACLE_BUDGET_SEC}s budget at sf1"
            else:
                excluded[name] = f"oracle error at sf1: {type(e).__name__}: {msg[:160]}"
            print(f"SKIP {name}: {excluded[name]}", flush=True)
            continue
        o_el = time.perf_counter() - t0
        bound = bound_for_tags(tags.get(name, ()))
        worst = float_bound_violation(orows, bound)
        if worst is not None:
            excluded[name] = (
                f"float output |{worst:.4g}| >= {bound:.1e} "
                f"(DuckDB DECIMAL->DOUBLE 2^53-safe bound, plans/registry.py)"
            )
            print(f"SKIP {name}: {excluded[name]}", flush=True)
            continue
        t1 = time.perf_counter()
        try:
            df = qs[name](spark, sf_dir)
            scols = df.columns
            srows = [[r[c] for c in scols] for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {type(e).__name__}: {e}", flush=True)
            fails.append(name)
            results[name] = {"err": f"{type(e).__name__}: {e}"}
            continue
        s_el = time.perf_counter() - t1
        ok_rows = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        ok_hash = ok_schema and hash_rows(scols, srows) == hash_rows(ocols, orows)
        ok_nonempty = len(srows) > 0 or name in ALLOW_EMPTY_SF1
        results[name] = {
            "rows_match": ok_rows,
            "schema_match": ok_schema,
            "hash_match": ok_hash,
            "spark_rows": len(srows),
            "oracle_rows": len(orows),
            "spark_sec": round(s_el, 1),
            "oracle_sec": round(o_el, 1),
            "err": None if ok_nonempty else "empty result",
        }
        if ok_rows and ok_schema and ok_hash and ok_nonempty:
            print(f"OK   {name}: {len(srows)} rows ({s_el:.1f}s)", flush=True)
        else:
            print(
                f"FAIL {name}: rows {len(srows)}/{len(orows)} "
                f"schema={ok_schema} hash={ok_hash} ({s_el:.1f}s)",
                flush=True,
            )
            fails.append(name)
        if json_out:
            _flush(json_out, sf_dir, names, results, fails, excluded)
    green = [
        n
        for n, r in results.items()
        if r.get("hash_match") and r.get("rows_match") and not r.get("err")
    ]
    print(
        f"\nsummary: {len(names)} considered, {len(results)} swept, "
        f"{len(green)} green, {len(fails)} failed, {len(excluded)} excluded"
    )
    if json_out:
        _flush(json_out, sf_dir, names, results, fails, excluded)
        print(f"wrote {json_out}")
    return 1 if fails else 0


def _flush(json_out, sf_dir, names, results, fails, excluded) -> None:
    """Write the artifact; called after EVERY query so a killed or crashed
    run still leaves a complete record of what it covered."""
    green = [
        n
        for n, r in results.items()
        if r.get("hash_match") and r.get("rows_match") and not r.get("err")
    ]
    with open(json_out, "w") as f:
        json.dump(
            {
                "sf_dir": sf_dir,
                "safe_abs_bound": SAFE_ABS,
                "considered": len(names),
                "swept": len(results),
                "green": len(green),
                "failed": sorted(fails),
                "excluded": excluded,
                "results": results,
            },
            f,
            indent=1,
            sort_keys=True,
        )


if __name__ == "__main__":
    raise SystemExit(main())
