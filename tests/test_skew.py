"""Skew helpers must be result-identical to their naive counterparts."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_dts_connector_spark.operators.skew import salted_join, two_phase_agg
from flink_dts_connector_spark.session import load_table


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    parts = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    plain = li.join(parts, "l_partkey", "inner").select("l_orderkey", "l_partkey", "p_brand")
    salted = salted_join(li, parts, on="l_partkey", salt=8).select(
        "l_orderkey", "l_partkey", "p_brand"
    )
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b and len(a) > 0


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b"), (99, "zz")], "k long, v string")
    small = spark.createDataFrame([(1, "x"), (2, "y")], "k long, w string")
    out = {
        (r["k"], r["w"]) for r in salted_join(big, small, on="k", how="left", salt=4).collect()
    }
    assert out == {(1, "x"), (2, "y"), (99, None)}


def test_salted_join_rejects_outer_modes(spark):
    import pytest

    big = spark.createDataFrame([(1, "a")], "k long, v string")
    small = spark.createDataFrame([(1, "x"), (7, "q")], "k long, w string")
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(big, small, on="k", how=how)


def test_two_phase_agg_equals_plain_agg(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        r["l_returnflag"]: (r["n"], float(r["s"]), r["mx"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("s"),
            F.max("l_orderkey").alias("mx"),
        )
        .collect()
    }
    twop = {
        r["l_returnflag"]: (r["n"], float(r["s"]), r["mx"])
        for r in two_phase_agg(
            li,
            ["l_returnflag"],
            {
                "n": (F.count(F.lit(1)), "sum"),
                "s": (F.sum(F.col("l_quantity").cast("decimal(18,6)")), "sum"),
                "mx": (F.max("l_orderkey"), "max"),
            },
            salt=16,
        ).collect()
    }
    assert plain == twop
