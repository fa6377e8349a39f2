#!/usr/bin/env python
"""Reconstruct a sweep_sf1 artifact from its console log — the fallback for
a run that was killed before its final JSON write (the per-query flush was
added after the r9 run started). Parses the OK/SKIP/FAIL/ERR lines, which
carry name, row count, wall seconds, and the exclusion reasons verbatim.

Usage: python tools/sweep_log_to_json.py LOG OUT.json SF_DIR [considered_n]
"""

from __future__ import annotations

import json
import re
import sys


def main() -> int:
    log_path, out_path, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    considered = int(sys.argv[4]) if len(sys.argv) > 4 else None
    raw = open(log_path, "rb").read().decode("utf-8", "replace")
    # progress bars interleave with \r on the same line — split on both
    lines = re.split(r"[\r\n]+", raw)
    results: dict[str, dict] = {}
    excluded: dict[str, str] = {}
    fails: list[str] = []
    for ln in lines:
        m = re.search(r"OK   ([a-z0-9_]+): (\d+) rows \(([0-9.]+)s\)$", ln)
        if m:
            results[m.group(1)] = {
                "rows_match": True,
                "schema_match": True,
                "hash_match": True,
                "spark_rows": int(m.group(2)),
                # oracle_rows is NOT in the OK log line; the matches above
                # were measured by the sweep, but this row-count echo is
                # synthesized — flag it per-entry (ADVICE r9) so the
                # artifact can't be mistaken for a directly measured one.
                "oracle_rows": int(m.group(2)),
                "spark_sec": float(m.group(3)),
                "err": None,
                "reconstructed": True,
            }
            continue
        m = re.search(r"SKIP ([a-z0-9_]+): (.+)$", ln)
        if m:
            excluded[m.group(1)] = m.group(2)
            continue
        m = re.search(
            r"FAIL ([a-z0-9_]+): rows (\d+)/(\d+) schema=(\w+) hash=(\w+)", ln
        )
        if m:
            name = m.group(1)
            results[name] = {
                "rows_match": m.group(2) == m.group(3),
                "schema_match": m.group(4) == "True",
                "hash_match": m.group(5) == "True",
                "spark_rows": int(m.group(2)),
                "oracle_rows": int(m.group(3)),
                "err": None,
                "reconstructed": True,
            }
            fails.append(name)
            continue
        m = re.search(r"ERR  ([a-z0-9_]+): (.+)$", ln)
        if m:
            results[m.group(1)] = {"err": m.group(2)}
            fails.append(m.group(1))
    green = [
        n
        for n, r in results.items()
        if r.get("hash_match") and r.get("rows_match") and not r.get("err")
    ]
    artifact = {
        "sf_dir": sf_dir,
        "safe_abs_bound": 9.0e9,
        "considered": considered if considered is not None else len(results) + len(excluded),
        "swept": len(results),
        "green": len(green),
        "failed": sorted(set(fails)),
        "excluded": excluded,
        "results": results,
        "note": "reconstructed from the run log by tools/sweep_log_to_json.py",
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(
        f"wrote {out_path}: {len(results)} swept, {len(green)} green, "
        f"{len(set(fails))} failed, {len(excluded)} excluded"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
