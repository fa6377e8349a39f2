#!/usr/bin/env python
"""State-store provider drill for the stream-stream interval join
(r8 verdict item 5): HDFS-backed (in-heap hashmap) vs RocksDB (native,
off-heap) at sf0.1 and sf1, with per-batch state metrics.

The interval join is the most expensive headline query; its cost is
stateful micro-batch overhead, so the state-store provider is the lever
worth measuring. Reports min-of-N wall plus the stateOperators progress
metrics (rows total / removed = watermark evictions, memory used) from the
final micro-batch of each run.

Usage: python tools/statestore_drill.py [--json OUT.json] [--runs N] [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROVIDERS = {
    "hdfs": "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    "rocksdb": "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
}


def run_once(spark, sf_dir: str) -> tuple[float, list[dict]]:
    """One availableNow run of the interval join; returns (wall_sec,
    stateOperators metrics of the last progress)."""
    import tempfile

    from pyspark.sql import functions as F  # noqa: F401

    from flink_dts_connector_spark.plans.streaming_queries import (
        _interval_join_frame,
    )
    from flink_dts_connector_spark.streaming.runner import pinned_shuffle_partitions

    with pinned_shuffle_partitions(spark):
        j = _interval_join_frame(spark, sf_dir)
        ckpt = tempfile.mkdtemp(prefix="fdcs_ssdrill_ckpt_")
        t0 = time.perf_counter()
        q = (
            j.writeStream.format("noop")
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        prog = q.lastProgress
    ops = []
    if prog:
        for so in prog.get("stateOperators", []):
            ops.append(
                {
                    "operator": so.get("operatorName"),
                    "numRowsTotal": so.get("numRowsTotal"),
                    "numRowsRemoved": so.get("numRowsRemoved"),
                    "memoryUsedBytes": so.get("memoryUsedBytes"),
                    "commitTimeMs": so.get("allRemovalsTimeMs"),
                }
            )
    return wall, ops


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    runs = 3
    while args and args[0].startswith("--"):
        if args[0] == "--json":
            json_out = args[1]
        elif args[0] == "--runs":
            runs = int(args[1])
        else:
            raise SystemExit(f"unknown flag {args[0]!r}")
        args = args[2:]
    sf_dirs = args or ["/root/testdata/sf0.1", "/root/repo/sf1_data"]

    from pyspark.sql import SparkSession

    report: dict[str, dict] = {}
    for prov_name, prov_cls in PROVIDERS.items():
        # fresh session per provider: the provider class is sticky per
        # checkpoint, and executor-side native handles shouldn't leak
        # between configurations
        spark = (
            SparkSession.builder.master(
                f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]"
            )
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "24g")
            .config("spark.sql.streaming.stateStore.providerClass", prov_cls)
            .appName(f"fdcs-ssdrill-{prov_name}")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        for sf_dir in sf_dirs:
            sf = os.path.basename(sf_dir.rstrip("/"))
            walls, last_ops = [], []
            for _ in range(runs):
                wall, ops = run_once(spark, sf_dir)
                walls.append(round(wall, 2))
                last_ops = ops
            report.setdefault(sf, {})[prov_name] = {
                "walls_sec": walls,
                "best_sec": min(walls),
                "state_operators": last_ops,
            }
            print(
                f"{prov_name:8s} {sf}: best {min(walls):.2f}s of {walls}; "
                f"state rows {[o['numRowsTotal'] for o in last_ops]} "
                f"removed {[o['numRowsRemoved'] for o in last_ops]}",
                flush=True,
            )
        spark.stop()
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
