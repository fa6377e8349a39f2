"""Property tests for the sketch layer against pure-Python references.

Driver-style derandomized (pinned example exploration) — hypothesis
generates the multisets, Python computes ground truth, Spark computes the
sketch; properties must hold exactly (CMS one-sided error + linearity) or
within the estimator's analytic behavior (KMV small-group exactness).
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from flink_dts_connector_spark.operators import sketch as SK

ITEMS = st.lists(
    st.sampled_from(["a", "b", "c", "dd", "ee", "ff", "gg", "hh", "i", "j"]),
    min_size=1,
    max_size=40,
)


def _py_md5_mod(s: str, m: int) -> int:
    le = int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "little")
    return le % m


def _py_cms(items: list[str], depth: int = 4, width: int = 256) -> dict:
    cells: dict = {}
    for it in items:
        for j in range(depth):
            b = _py_md5_mod(f"cms{j}:{it}", width)
            cells[(j, b)] = cells.get((j, b), 0) + 1
    return cells


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(items=ITEMS)
def test_cms_cells_match_python_reference(spark, items):
    df = spark.createDataFrame([(w,) for w in items], "w string")
    got = {(r["j"], r["b"]): r["c"] for r in SK.cms_build(df, "w").collect()}
    assert got == _py_cms(items)


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(items=ITEMS)
def test_cms_estimates_dominate_exact_counts(spark, items):
    df = spark.createDataFrame([(w,) for w in items], "w string")
    sk = SK.cms_build(df, "w")
    probes = df.distinct()
    est = {r["w"]: r["cms_estimate"] for r in SK.cms_estimate(sk, probes, "w").collect()}
    import collections

    exact = collections.Counter(items)
    for w, n in exact.items():
        assert est[w] >= n


@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(keys=st.lists(st.integers(0, 200), min_size=1, max_size=60))
def test_kmv_small_groups_exact(spark, keys):
    df = spark.createDataFrame([(k, "g") for k in keys], "user_id long, g string")
    sk = SK.kmv_sketch(df, key_col="user_id", group_col="g", k=64)
    est = SK.kmv_distinct_estimate(sk, k=64).collect()
    n_distinct = len(set(keys))
    if n_distinct < 64:
        assert est[0]["distinct_est"] == n_distinct
