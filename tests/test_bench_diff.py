"""tools/bench_diff.py (r12): the committed round-over-round adjudicator.
Covers all three artifact shapes it accepts and the both-families flag rule
— driver-side only, no Spark session."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "bench_diff.py")


def _run(old, new, tmp_path, *extra):
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new))
    out = subprocess.run(
        [sys.executable, TOOL, str(po), str(pn), *extra],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout)


def _full(queries, sentinels, sentinel_median):
    return {
        "queries": queries,
        "queries_normalized": {
            k: round(v / sentinels[k], 3) for k, v in queries.items()
        },
        "sentinel_adjacent": sentinels,
        "sentinel": {"median": sentinel_median},
    }


def test_full_artifacts_flag_only_double_movers(tmp_path):
    old = _full({"a": 1.0, "b": 2.0, "c": 1.0}, {"a": 0.25, "b": 0.25, "c": 0.25}, 0.25)
    # a: raw AND normalized x2 (mover); b: raw x2 but sentinel x2 too
    # (normalized flat -> one-sided note); c: unchanged
    new = _full({"a": 2.0, "b": 4.0, "c": 1.0}, {"a": 0.25, "b": 0.5, "c": 0.25}, 0.3)
    rep = _run(old, new, tmp_path, "--flag", "1.4")
    movers = {r["query"] for r in rep["movers_raw_and_norm"]}
    notes = {r["query"] for r in rep["one_sided_notes"]}
    assert movers == {"a"}
    assert notes == {"b"}
    assert rep["common_queries"] == 3


def test_driver_wrapper_and_compact_line_shapes(tmp_path):
    compact = {
        "metric": "headline_queries_total_sec", "value": 3.0, "unit": "sec",
        "queries": {"a": 1.0, "b": 2.0}, "sentinel_median_sec": 0.25, "sf": 0.1,
    }
    wrapper = {"n": 11, "rc": 0, "tail": "noise\n" + json.dumps(compact) + "\n"}
    compact_new = dict(compact, queries={"a": 2.0, "b": 2.0, "c": 9.9})
    rep = _run(wrapper, compact_new, tmp_path)
    assert rep["common_queries"] == 2
    assert rep["added"] == ["c"] and rep["removed"] == []
    # normalized derived from sentinel_median_sec: a doubles in both families
    assert {r["query"] for r in rep["movers_raw_and_norm"]} == {"a"}


def test_reproduces_r10_r11_judge_numbers():
    """The committed driver artifacts must diff to the numbers the r11
    verdict quoted: 45 common queries, normalized total +9.4%, and
    stream_hourly_windows x2.89 leading the movers."""
    out = subprocess.run(
        [sys.executable, TOOL,
         os.path.join(REPO, "BENCH_r10.json"), os.path.join(REPO, "BENCH_r11.json")],
        capture_output=True, text=True, check=True,
    )
    rep = json.loads(out.stdout)
    assert rep["common_queries"] == 45
    assert rep["normalized_total_ratio"] == 1.094
    lead = rep["movers_raw_and_norm"][0]
    assert lead["query"] == "stream_hourly_windows"
    assert abs(lead["norm_ratio"] - 2.891) < 0.01
