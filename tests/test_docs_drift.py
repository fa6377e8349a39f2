"""Doc-drift guards — the r5/r6 verdicts both caught COVERAGE.md claiming a
weaker gate than a query actually has. Cheap asserts so it can't recur."""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_coverage_md_has_no_stale_rows_only_markers():
    """Every registry query is hash-gated (sweep r6: zero rows-only), so no
    COVERAGE.md row may label one '(rows-only)'. The legend's generic
    mention is allowed; a per-query claim is drift."""
    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    assert "(rows-only)" not in text


def test_gate_priority_resolves_and_is_50():
    """The driver's correctness gate = first 50 of GATE_PRIORITY; every
    name must be registered and the count pinned at exactly 50."""
    from flink_dts_connector_spark.plans.registry import GATE_PRIORITY, all_queries

    qs = all_queries()  # raises if a GATE_PRIORITY name is unregistered
    assert len(GATE_PRIORITY) == 50
    assert len(set(GATE_PRIORITY)) == 50
    assert list(qs)[:50] == list(GATE_PRIORITY)


def test_bench_headline_names_are_registered():
    """bench.py silently skips unknown names (`if n in queries`); assert
    they all resolve so a rename can't quietly shrink the headline set."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    from flink_dts_connector_spark.plans.registry import all_queries

    qs = all_queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, f"bench HEADLINE names not registered: {missing}"
