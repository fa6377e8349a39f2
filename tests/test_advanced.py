"""Advanced-operator checks without SQL oracles: approx-distinct error
bounds, as-of edge semantics, range-join bucketization correctness."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_dts_connector_spark.operators.asof import asof_join, range_join_buckets
from flink_dts_connector_spark.plans.registry import all_queries
from flink_dts_connector_spark.session import load_table


def test_approx_distinct_error_bound(spark, sf_dir):
    # The query now self-asserts the HLL++ error bound: within_bound columns
    # must be True everywhere, and the exact counts must equal countDistinct.
    got = {
        r["l_returnflag"]: r
        for r in all_queries()["agg_approx_distinct"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: (r["n_o"], r["n_p"])
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n_o"),
            F.countDistinct("l_partkey").alias("n_p"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for k, r in got.items():
        assert (r["exact_orders"], r["exact_parts"]) == exact[k]
        assert r["orders_within_bound"] and r["parts_within_bound"], f"{k}: HLL++ out of bound"


def test_asof_tolerance_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, 100, 1000), (2, 100, 2000), (3, 200, 500)], "id long, k long, t long"
    ).select("id", "k", F.timestamp_micros(F.col("t") * 1_000_000).alias("ts"))
    right = spark.createDataFrame(
        [(10, 100, 900), (11, 100, 1500), (12, 300, 100)], "rid long, k long, t long"
    ).select("rid", "k", F.timestamp_micros(F.col("t") * 1_000_000).alias("rts"))
    out = {
        r["id"]: r["rid"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts", right_cols=["rid", "rts"]
        ).collect()
    }
    assert out == {1: 10, 2: 11, 3: None}  # no right rows for k=200

    # tolerance: match older than 200s is nulled out
    out_tol = {
        r["id"]: r["rid"]
        for r in asof_join(
            left,
            right,
            on="k",
            left_ts="ts",
            right_ts="rts",
            right_cols=["rid", "rts"],
            tolerance_seconds=200,
        ).collect()
    }
    assert out_tol == {1: 10, 2: None, 3: None}  # 2000-1500=500s > 200s


def test_range_join_matches_theta_join(spark, sf_dir):
    """Bucketized range join must equal the plain theta join exactly."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("p_ts")
    )
    v = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("vid"), "user_id", F.col("ts").alias("view_ts")
    )
    bucketized = {
        (r["pid"], r["vid"])
        for r in range_join_buckets(
            p, v, on="user_id", left_ts="p_ts", right_ts="view_ts", max_gap_seconds=600
        ).collect()
    }
    theta = {
        (r["pid"], r["vid"])
        for r in p.join(v.withColumnRenamed("user_id", "u2"), F.col("user_id") == F.col("u2"))
        .where(
            (F.col("view_ts") <= F.col("p_ts"))
            & (F.unix_micros("view_ts") >= F.unix_micros("p_ts") - 600 * 1_000_000)
        )
        .collect()
    }
    assert bucketized == theta and len(bucketized) > 0
