#!/usr/bin/env python
"""Decade-step scaling bench: run a query set at TWO fixture dirs (e.g.
sf1_data vs sf10_data) in one session and report each query's wall ratio
against its MASS ratio — the byte/char/row denominator rule SCALING.md
records from r12 (the sf fixtures' documents get LONGER per copy, so row
ratios under-state the data). The per-query verdict is

    excess = wall_ratio / mass_ratio   (target: <= 1.2 per the r12
                                        verdict's item-5 done criterion)

Protocol: min-of-2 noop-sink runs per (query, dir), each run preceded by
an adjacent q6 sentinel at sf0.1 (the bench.py sentinel, constant-cost
across dirs) so box load during the long sweep is attributable from the
artifact. Queries resolve through the registry, same as bench.py.

Usage: python tools/bench_decade.py --json OUT.json [--old DIR] [--new DIR] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SENTINEL_DIR = "/root/testdata/sf0.1"

#: query -> which table's mass is its scaling denominator
MASS = {
    # documents char mass (the `_c<k>` suffix grows text super-linearly)
    "dedup_minhash_probe": "doc_chars",
    "search_trigram_substring": "doc_chars",
    "search_rrf_fusion": "doc_chars",
    "text_quality_rules": "doc_chars",
    "text_rake_keywords": "doc_chars",
    "search_chunk_ann": "doc_chars",
    # media payload size is a doc_id law -> scales with doc ROWS
    "multimodal_mp3_spectrum": "doc_rows",
    "multimodal_mp3_reservoir": "doc_rows",
    "multimodal_avc_slice_headers": "doc_rows",
    "multimodal_avc_weighted_pred": "doc_rows",
    "multimodal_mp3_spectrum_mixed": "doc_rows",
    "multimodal_mp4_fragmented": "doc_rows",
    "multimodal_gif_animated": "doc_rows",
    "multimodal_png_interlaced": "doc_rows",
    "multimodal_id3v24_metadata": "doc_rows",
    # index-maintenance twins tokenize/shingle the text corpus
    "stream_bm25_maintenance": "doc_chars",
    "stream_trigram_maintenance": "doc_chars",
    # embedding row mass
    "neardup_cosine_pairs": "emb_rows",
    "dedup_embedding_components": "emb_rows",
    "curate_semdedup": "emb_rows",
    "ann_topk_ivf": "emb_rows",
    "ann_recall_report": "emb_rows",
    "ml_knn_label_confusion": "emb_rows",
    # event row mass
    "sketch_hll_time_cube": "event_rows",
    "stream_hourly_windows": "event_rows",
    "events_spatial_neighbor_pairs_salted": "event_rows",
    "stream_stream_interval_join": "event_rows",
    # r14 session-2 touched rows
    "sketch_count_min_heavy_hitters": "doc_chars",
    "text_hash_embedding": "doc_chars",
    "search_phrase_positions": "doc_chars",
    "curate_token_budget": "doc_chars",
    # CDC rows derive their changelog mass from the orders table
    "cdc_signed_count_sketch": "order_rows",
    "curate_incremental_pipeline": "doc_chars",
}

RUNS = 2


def _mass(con, d: str) -> dict:
    out = {}
    out["doc_chars"] = con.execute(
        f"SELECT SUM(LENGTH(text)) FROM read_parquet('{d}/documents.parquet')"
    ).fetchone()[0]
    out["doc_rows"] = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{d}/documents.parquet')"
    ).fetchone()[0]
    out["emb_rows"] = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{d}/embeddings.parquet')"
    ).fetchone()[0]
    out["event_rows"] = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{d}/events.parquet')"
    ).fetchone()[0]
    out["order_rows"] = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{d}/orders.parquet')"
    ).fetchone()[0]
    return out


def main() -> None:
    import duckdb

    from flink_dts_connector_spark.plans.registry import all_queries
    from flink_dts_connector_spark.session import get_spark

    args = sys.argv[1:]
    json_out, old_dir, new_dir = None, "sf1_data", "sf10_data"
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--json":
            json_out = args[i + 1]
            i += 2
        elif args[i] == "--old":
            old_dir = args[i + 1]
            i += 2
        elif args[i] == "--new":
            new_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    if not names:
        names = list(MASS)

    con = duckdb.connect()
    mass_old, mass_new = _mass(con, old_dir), _mass(con, new_dir)
    mass_ratio = {k: mass_new[k] / mass_old[k] for k in mass_old}

    spark = get_spark(app_name="fdcs-bench-decade")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    sentinel = queries["q6_forecast_revenue"].fn

    def run_once(fn, d: str) -> float:
        t0 = time.perf_counter()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run_once(sentinel, SENTINEL_DIR)  # warm
    report = {
        "purpose": "r12 verdict item 5: third decade step (sf1 -> sf10 subset)",
        "old_dir": old_dir,
        "new_dir": new_dir,
        "protocol": f"min-of-{RUNS} noop-sink runs per (query, dir), adjacent "
        "q6@sf0.1 sentinel before every sample; excess = wall_ratio / mass_ratio",
        "note": "sf10 embeddings use --embed-rotate decorrelation (see "
        "tools/gen_sf1.py) so threshold-cosine pair SEMANTICS stay linear "
        "in copies instead of exploding x copies^2 by construction",
        "mass": {
            "old": mass_old,
            "new": mass_new,
            "ratio": {k: round(v, 3) for k, v in mass_ratio.items()},
        },
        "queries": {},
    }
    worst = 0.0
    for name in names:
        if name not in queries:
            print(f"SKIP {name}: not registered")
            continue
        fn = queries[name].fn
        row = {}
        for key, d in (("old", old_dir), ("new", new_dir)):
            samples, sents = [], []
            for _ in range(RUNS):
                sents.append(run_once(sentinel, SENTINEL_DIR))
                samples.append(run_once(fn, d))
            row[f"{key}_sec"] = round(min(samples), 3)
            row[f"{key}_sentinels"] = [round(s, 3) for s in sents]
        m = MASS.get(name, "doc_rows")
        row["wall_ratio"] = round(row["new_sec"] / max(row["old_sec"], 1e-9), 3)
        row["mass"] = m
        row["mass_ratio"] = round(mass_ratio[m], 3)
        row["excess"] = round(row["wall_ratio"] / row["mass_ratio"], 3)
        report["queries"][name] = row
        worst = max(worst, row["excess"])
        print(
            f"{name}: {row['old_sec']}s -> {row['new_sec']}s "
            f"(wall x{row['wall_ratio']}, mass x{row['mass_ratio']}, "
            f"excess {row['excess']})",
            flush=True,
        )
    report["worst_excess"] = round(worst, 3)
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(report, fh, indent=1)
            fh.write("\n")
        print(f"wrote {json_out}")


if __name__ == "__main__":
    main()
