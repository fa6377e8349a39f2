#!/usr/bin/env python
"""Shuffle-linearity measurement (SCALING.md §shuffle-linearity).

For one flagship query per heavy family, record the TOTAL shuffle-write
bytes its execution produces at two scale factors. If a family's shuffle
budget scales with the INPUT (the design claim: shingle/band/cell/posting
keys bound every quadratic), a 10× data step must produce ~10× the
exchange bytes — not ~100× (an all-pairs leak) and not a constant dominated
by some materialized side state.

Metrics come from the Spark UI REST API (a dedicated session with the UI
enabled — the tuned session keeps it off), summing `shuffleWriteBytes`
over the completed stages between snapshots, so the number is the real
exchange traffic incl. AQE re-plans, not a plan-time estimate.

Usage: python tools/measure_shuffle.py [--json OUT.json] [--sfs d1,d2,...] [query ...]
r8: --sfs extends the curve to any number of points (default adds the
locally synthesized sf1 from tools/gen_sf1.py when present — a third
decade, 0.01 -> 0.1 -> 1); growth is reported per consecutive 10x step.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "dedup_minhash_md5",          # MinHash-LSH: shingle/band keys
    "ann_topk_ivfpq",             # IVF-PQ: cell/codebook keys
    "search_bm25_topk",           # BM25: posting keys
    "sketch_count_min_heavy_hitters",  # CMS: sketch cells
]
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIRS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
# third decade: the locally synthesized sf1 (tools/gen_sf1.py), when built
_SF1 = os.path.join(_REPO, "sf1_data")
if os.path.exists(os.path.join(_SF1, "lineitem.parquet")):
    SF_DIRS.append(_SF1)

#: the delta-of-sums technique below is only sound while NO completed stage
#: is evicted from the UI store between snapshots (default retention is
#: 1000 stages — a long run can cross it and silently under-count). Raised
#: retention + a non-negativity assert turn that silent skew into a failure.
RETAINED = "100000"


def completed_stage_bytes(sc) -> tuple[int, int, int]:
    url = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/stages?status=complete"
    stages = json.load(urllib.request.urlopen(url))
    return (
        sum(s["shuffleWriteBytes"] for s in stages),
        sum(s["inputBytes"] for s in stages),
        len(stages),
    )


def main() -> None:
    # flags are accepted in any order (r8 ADVICE: the old sequential
    # if-blocks silently treated `--sfs ... --json OUT` as query names)
    args = sys.argv[1:]
    out_path = None
    sf_dirs = SF_DIRS
    while args and args[0].startswith("--"):
        flag = args[0]
        if flag == "--json":
            out_path = args[1]
        elif flag == "--sfs":
            sf_dirs = args[1].split(",")
        else:
            raise SystemExit(f"unknown flag {flag!r} (expected --json or --sfs)")
        args = args[2:]
    names = args or DEFAULT_QUERIES
    unknown = [n for n in names if n.startswith("--")]
    if unknown:
        raise SystemExit(f"flags must precede query names: {unknown}")

    from flink_dts_connector_spark.plans.registry import all_queries
    from flink_dts_connector_spark.session import get_spark

    spark = get_spark(
        app_name="fdcs-shuffle-measure",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": RETAINED,
            "spark.ui.retainedJobs": RETAINED,
        },
    )
    sc = spark.sparkContext
    queries = all_queries()
    results: dict[str, dict] = {}
    for name in names:
        fn = queries[name].fn
        per_sf = {}
        for sf_dir in sf_dirs:
            w0, i0, n0 = completed_stage_bytes(sc)
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            w1, i1, n1 = completed_stage_bytes(sc)
            assert w1 >= w0 and i1 >= i0 and n1 >= n0, (
                f"{name}@{sf_dir}: stage eviction between snapshots "
                f"(w {w0}->{w1}, n {n0}->{n1}) — raise RETAINED"
            )
            sf = os.path.basename(sf_dir.rstrip("/"))
            per_sf[sf] = {"shuffle_write_bytes": w1 - w0, "input_bytes": i1 - i0}
        sfs = list(per_sf)
        growths = [
            round(
                per_sf[b]["shuffle_write_bytes"]
                / max(per_sf[a]["shuffle_write_bytes"], 1),
                2,
            )
            for a, b in zip(sfs, sfs[1:])
        ]
        per_sf["shuffle_growth_per_10x_step"] = growths
        # back-compat: the first step is the r7 artifact's single ratio
        per_sf["shuffle_growth_10x_data"] = growths[0] if growths else None
        results[name] = per_sf
        print(f"{name}: {json.dumps(per_sf)}")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1)
    # one-line verdict per query
    for name, r in results.items():
        gs = r["shuffle_growth_per_10x_step"]
        tag = "LINEAR-ish" if all(g < 30 for g in gs) else "SUPERLINEAR"
        print(f"VERDICT {name}: per-10x-step shuffle growth {gs} [{tag}]")


if __name__ == "__main__":
    main()
