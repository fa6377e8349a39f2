#!/usr/bin/env python
"""Round-over-round bench adjudication on raw AND sentinel-normalized ratios.

The shared box's noisy-neighbor variance spans 2× (r5 lesson), so raw
seconds across rounds are not comparable on their own; `bench.py` therefore
interleaves a fixed q6 sentinel and emits `queries_normalized` = min_sec /
adjacent sentinel_sec. But normalization has its own failure mode (the r7
lesson): when the SENTINEL speeds up between rounds, every normalized ratio
inflates and unchanged queries look regressed ("phantom regressions" — three
were hand-adjudicated in r7, all with raw times at/below the prior round).

This tool therefore compares two BENCH_r{N}_local.json artifacts on BOTH
ratio families and flags a query only when raw AND normalized both exceed
the threshold (default 1.5 — chosen inside the residual noise envelope of a
min-of-3 / sentinel-normalized reading). One family alone prints as a
sentinel-shift / noise note, not a flag.

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
    r_old, r_new = old["queries"], new["queries"]
    common = sorted(set(n_old) & set(n_new) & set(r_old) & set(r_new))
    tot_old = sum(n_old[k] for k in common)
    tot_new = sum(n_new[k] for k in common)
    raw_old = sum(r_old[k] for k in common)
    raw_new = sum(r_new[k] for k in common)
    print(
        f"common subset: {len(common)} queries; normalized totals "
        f"{tot_old:.1f} -> {tot_new:.1f} (ratio {tot_new / tot_old:.3f}); "
        f"raw totals {raw_old:.1f}s -> {raw_new:.1f}s "
        f"(ratio {raw_new / raw_old:.3f})"
    )
    print(
        f"sentinel median: {old['sentinel']['median']} -> {new['sentinel']['median']}"
    )

    def ratio(d_old, d_new, k):
        return d_new[k] / max(d_old[k], 1e-9)

    flagged, one_sided = [], []
    for k in common:
        rn, rr = ratio(n_old, n_new, k), ratio(r_old, r_new, k)
        if rn >= flag and rr >= flag:
            flagged.append((rn, rr, k))
        elif rn >= flag or rr >= flag:
            one_sided.append((rn, rr, k))
    if flagged:
        print(f"flagged (normalized AND raw >= {flag}) — rerun solo before believing:")
        for rn, rr, k in sorted(flagged, reverse=True):
            print(
                f"  {k}: norm {n_old[k]:.2f} -> {n_new[k]:.2f} ({rn:.2f}x); "
                f"raw {r_old[k]:.2f}s -> {r_new[k]:.2f}s ({rr:.2f}x)"
            )
    else:
        print(f"no query with BOTH ratios >= {flag}: flat within noise")
    if one_sided:
        print(
            f"one-sided >= {flag} (sentinel-shift / noise artifact, NOT flagged):"
        )
        for rn, rr, k in sorted(one_sided, reverse=True):
            print(
                f"  {k}: norm {rn:.2f}x, raw {rr:.2f}x "
                f"(raw {r_old[k]:.2f}s -> {r_new[k]:.2f}s)"
            )
    added = sorted(set(n_new) - set(n_old))
    removed = sorted(set(n_old) - set(n_new))
    if added:
        print("new entries:", ", ".join(added))
    if removed:
        print("removed entries:", ", ".join(removed))


if __name__ == "__main__":
    main()
