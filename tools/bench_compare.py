#!/usr/bin/env python
"""Round-over-round bench adjudication on sentinel-normalized ratios.

The shared box's noisy-neighbor variance spans 2× (r5 lesson), so raw
seconds across rounds are not comparable; `bench.py` therefore interleaves
a fixed q6 sentinel and emits `queries_normalized` = min_sec / adjacent
sentinel_sec. This tool compares two BENCH_r{N}_local.json artifacts on
those ratios and prints the adjudication the r5/r6 verdicts used to do by
hand: the common-subset normalized totals, and per-query ratios above the
flag threshold (default 1.5 — chosen inside the residual noise envelope
of a min-of-3 / sentinel-normalized reading).

Usage: python tools/bench_compare.py OLD.json NEW.json [flag_ratio]
Exit code: 0 always (adjudication is a report, not a gate — a flagged
query means "rerun it solo on a quiet box before believing it").
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    old_path, new_path = sys.argv[1], sys.argv[2]
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    n_old, n_new = old["queries_normalized"], new["queries_normalized"]
    common = sorted(set(n_old) & set(n_new))
    tot_old = sum(n_old[k] for k in common)
    tot_new = sum(n_new[k] for k in common)
    print(
        f"common subset: {len(common)} queries; normalized totals "
        f"{tot_old:.1f} -> {tot_new:.1f} (ratio {tot_new / tot_old:.3f})"
    )
    print(
        f"sentinel median: {old['sentinel']['median']} -> {new['sentinel']['median']}"
    )
    flagged = [
        (n_new[k] / max(n_old[k], 1e-9), k)
        for k in common
        if n_new[k] / max(n_old[k], 1e-9) >= flag
    ]
    if flagged:
        print(f"flagged (ratio >= {flag}) — rerun solo before believing:")
        for r, k in sorted(flagged, reverse=True):
            print(f"  {k}: {n_old[k]:.2f} -> {n_new[k]:.2f} ({r:.2f}x)")
    else:
        print(f"no per-query ratio >= {flag}: flat within noise")
    added = sorted(set(n_new) - set(n_old))
    removed = sorted(set(n_old) - set(n_new))
    if added:
        print("new entries:", ", ".join(added))
    if removed:
        print("removed entries:", ", ".join(removed))


if __name__ == "__main__":
    main()
