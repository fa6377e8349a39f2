#!/usr/bin/env python
"""Registry-wide physical-plan audit: the 100 TB hygiene telemetry.

For every BATCH query in the registry (streaming queries execute their
stream inside the query fn; their rolled-up batch plan is not the
interesting one), build the DataFrame at the given SF and walk the
formatted physical plan, recording the operators that decide whether the
plan survives a 1000-executor scale-up:

  exchanges_hash      shuffles (hashpartitioning) — each is a full
                      data movement of its input
  exchanges_single    SinglePartition exchanges — driver-killer IF the
                      frame is corpus-sized (tiny aggregate/topk frames
                      are fine; the summary flags queries where a single-
                      partition exchange sits directly above a scan)
  exchanges_range     rangepartitioning — global sorts
  broadcasts          BroadcastExchange (dims/probes riding onto facts)
  smj                 SortMergeJoin (expected ~0: dims broadcast, the
                      bucketed-join test covers the co-located case)
  cartesian           CartesianProduct (expected 0 — broadcast nested
                      loop is the sanctioned small-side form)
  python_eval         Python UDF/map evaluations (expected only in the
                      decode/multimodal/watermark families)
  scans               parquet scans
  wscg                WholeStageCodegen spans (JVM-compiled pipelines)

Hard assertions (exit 1): no CartesianProduct anywhere; rangepartitioning
only in the allowlist below; python_eval only in the known
Python-boundary families.

Usage: python tools/plan_audit.py [--json OUT.json] [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: queries allowed a rangepartitioning exchange (global ORDER BY in the
#: query's contract — all of them are top-k-bounded or tiny final frames)
RANGE_ALLOWED = {
    "q2_cheapest_part_per_type",  # ORDER BY in spec; final frame is tiny
    "q3_shipping_priority",  # top-10 by revenue (TakeOrdered when possible)
    "q10_returned_items",  # top-20
    "q15_top_supplier",
    "q18_large_volume_orders",
    "q21_sole_late_supplier",
}

#: families where a Python boundary is the documented design (Arrow-batched)
PYTHON_OK_PREFIXES = (
    "cdc_",  # wire decode (mapInPandas) — SCALING.md "wire-decode ceiling"
    "multimodal_",  # media decode stub (mapInPandas)
    "dedup_simhash",  # vectorized numpy sign aggregation (pandas_udf)
    "proj_udtf_",  # Python UDTF API-surface demo — declarative twin is the hot path
    # r13: the tiled exact-GEMM cosine pair join (applyInPandas tile verify)
    # and the cogroup-GEMM k-means assignment — SCALING.md §r13; both are
    # the documented BLAS-rate replacements for interpreted HOF hot loops
    "neardup_cosine_pairs",
    "dedup_embedding_components",
    "curate_semdedup",
)


def main() -> int:
    args = [a for a in sys.argv[1:]]
    out_json = None
    if "--json" in args:
        i = args.index("--json")
        out_json = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    only = set(args[1:])  # optional query-name filter (audit just these)

    from pyspark.sql import SparkSession

    from flink_dts_connector_spark.plans.registry import all_queries

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        # the audit reads the STATIC physical plan; with AQE on, explain
        # wraps it in AdaptiveSparkPlan(isFinalPlan=false) which defers
        # codegen annotation to runtime — so neither "WholeStageCodegen"
        # nor "[codegen id : N]" ever appears and the wscg counter reads 0
        # for every plan (the r8 dead-counter finding). Static operator
        # counts (joins/exchanges/scans) are the same either way; AQE stays
        # on in the bench/sweep sessions where it actually executes.
        .config("spark.sql.adaptive.enabled", "false")
        .appName("fdcs-plan-audit")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    queries = all_queries()
    report: dict[str, dict] = {}
    failures: list[str] = []
    for name, q in sorted(queries.items()):
        if only and name not in only:
            continue
        if "streaming" in q.tags:
            continue  # stream executes inside fn; audited by its own guards
        try:
            df = q.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001 — record, keep auditing
            report[name] = {"error": str(e)[:200]}
            failures.append(f"{name}: plan build failed: {e}")
            continue
        single_spots = len(re.findall(r"Arguments: SinglePartition", plan))
        stats = {
            "exchanges_hash": len(re.findall(r"Arguments: hashpartitioning", plan)),
            "exchanges_single": single_spots,
            "exchanges_range": len(re.findall(r"Arguments: rangepartitioning", plan)),
            "broadcasts": plan.count("BroadcastExchange"),
            "smj": plan.count("SortMergeJoin"),
            "cartesian": plan.count("CartesianProduct"),
            "python_eval": len(
                re.findall(r"ArrowEvalPython|BatchEvalPython|MapInPandas|FlatMapGroupsInPandas", plan)
            ),
            "scans": len(re.findall(r"Scan parquet", plan)),
            # formatted-mode explain renders codegen membership as
            # "[codegen id : N]" per node, NOT "WholeStageCodegen" (that
            # string only appears in simple mode) — the r8 counter matched
            # the latter and reported 0 spans everywhere. Distinct ids =
            # number of whole-stage-codegen spans in the plan.
            "wscg": len(set(re.findall(r"\[codegen id : (\d+)\]", plan))),
        }
        report[name] = stats
        if stats["cartesian"]:
            failures.append(f"{name}: CartesianProduct in plan")
        if stats["exchanges_range"] and name not in RANGE_ALLOWED:
            failures.append(f"{name}: rangepartitioning (global sort) not allowlisted")
        if stats["python_eval"] and not name.startswith(PYTHON_OK_PREFIXES):
            failures.append(f"{name}: unexpected Python boundary in plan")

    audited = [n for n in report if "error" not in report[n]]
    stat_keys = (
        "exchanges_hash", "exchanges_single", "exchanges_range", "broadcasts",
        "smj", "cartesian", "python_eval", "scans", "wscg",
    )
    totals = {k: sum(report[n][k] for n in audited) for k in stat_keys}
    # codegen-coverage floor: a codegen regression (e.g. an accidental
    # interpreted-only expression tree or a conf disabling WSCG) must trip
    # the audit, not silently zero a counter (the r8 failure mode). Only
    # meaningful on full-registry runs — a hand-picked `only` set could be
    # legitimately all-Python.
    wscg_cov = (
        sum(1 for n in audited if report[n]["wscg"] >= 1) / len(audited)
        if audited
        else 0.0
    )
    if not only and audited and wscg_cov < 0.80:
        failures.append(
            f"codegen coverage {wscg_cov:.0%} of audited plans < 80% floor"
        )
    summary = {
        "sf_dir": sf_dir,
        "audited": len(audited),
        "skipped_streaming": sum(1 for q in queries.values() if "streaming" in q.tags),
        "totals": totals,
        "wscg_coverage": round(wscg_cov, 4),
        "failures": failures,
        "queries": report,
    }
    for line in failures:
        print("FAIL", line)
    print(
        f"audited {len(audited)} batch plans: "
        f"{totals.get('smj', 0)} SMJ, {totals.get('cartesian', 0)} cartesian, "
        f"{totals.get('exchanges_range', 0)} range-exchanges, "
        f"{totals.get('broadcasts', 0)} broadcasts, "
        f"{totals.get('python_eval', 0)} python boundaries, "
        f"{totals.get('wscg', 0)} codegen spans ({wscg_cov:.0%} coverage); "
        f"{len(failures)} failures"
    )
    if out_json:
        with open(out_json, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"wrote {out_json}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
