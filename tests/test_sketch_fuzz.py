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

from pyspark.sql import functions as F

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


VALS = st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60)


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=VALS)
def test_histogram_quantile_brackets_true_quantile(spark, vals):
    """The dyadic histogram's [est_lo, est_hi] bucket must contain the
    exact rank-ceil(q*n) value for every probed quantile, at every shift."""
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    s = sorted(vals)
    for shift in (4, 8):
        hist = SK.value_histogram(df, "g", "v", shift)
        qs = [(1, 2), (9, 10), (99, 100)]
        rows = SK.histogram_quantiles(hist, qs, shift).collect()
        assert len(rows) == len(qs)
        for r in rows:
            n = len(s)
            rank = max((r["q_num"] * n + r["q_den"] - 1) // r["q_den"], 1)
            exact = s[rank - 1]
            assert r["rank"] == rank
            assert r["est_lo"] <= exact <= r["est_hi"], (r, exact)
            assert r["est_hi"] - r["est_lo"] == (1 << shift) - 1


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=VALS)
def test_histogram_merge_equals_direct(spark, vals):
    """Cell-addition merge of arbitrary shards == whole-set build (the
    linearity that makes the sketch a per-day storable summary), including
    signed-weight cancellation: inserting then retracting a value leaves
    the cells exactly as before."""
    df = spark.createDataFrame(
        [("g", v, i % 3) for i, v in enumerate(vals)], "g string, v long, shard int"
    )
    shift = 6
    direct = {
        (r["g"], r["bucket"]): r["c"]
        for r in SK.value_histogram(df, "g", "v", shift).collect()
    }
    shards = [
        SK.value_histogram(df.where(F.col("shard") == i), "g", "v", shift)
        for i in range(3)
    ]
    merged = {
        (r["g"], r["bucket"]): r["c"]
        for r in SK.histogram_merge(*shards).collect()
    }
    assert merged == direct

    # turnstile: +1 rows then -1 rows for shard 0 cancel back to shards 1+2
    signed = df.select("g", "v", F.lit(1).alias("w")).unionByName(
        df.where(F.col("shard") == 0).select("g", "v", F.lit(-1).alias("w"))
    )
    maintained = {
        (r["g"], r["bucket"]): r["c"]
        for r in SK.value_histogram(signed, "g", "v", shift, weight_col="w")
        .where(F.col("c") != 0)
        .collect()
    }
    rest = {
        (r["g"], r["bucket"]): r["c"]
        for r in SK.histogram_merge(shards[1], shards[2]).collect()
        if r["c"] != 0
    }
    assert maintained == rest
