"""Scalar/aggregate function battery (SURVEY.md §2.4 "scalar fns" row):
string, date, percentile, unpivot, and ranking-distribution functions, each
pinned against the DuckDB twin with the engine-parity caveats encoded in
the oracle (dow offset, date_trunc return type, strpos/instr naming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flink_dts_connector_spark.plans.registry import register
from flink_dts_connector_spark.plans.relational import dec, dsum, t


@register(
    "agg_percentiles",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS p50_price,
       quantile_cont(l_extendedprice, 0.95) AS p95_price,
       quantile_cont(l_quantity, 0.5) AS median_qty
FROM lineitem GROUP BY l_returnflag
""",
    tags=("agg", "percentile"),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles — Spark `percentile` and DuckDB
    `quantile_cont` share the linear-interpolation definition, and the
    interpolation arithmetic is elementwise-deterministic."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50_price"),
            F.expr("percentile(l_extendedprice, 0.95)").alias("p95_price"),
            F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        )
    )


@register(
    "unpivot_lineitem_measures",
    oracle="""
SELECT 'quantity' AS measure,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total, COUNT(*) AS n
FROM lineitem
UNION ALL
SELECT 'extendedprice',
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE), COUNT(*)
FROM lineitem
UNION ALL
SELECT 'discount',
       CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE), COUNT(*)
FROM lineitem
""",
    tags=("unpivot",),
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (stack) wide measures into (measure, value) rows, then the
    usual exact aggregation — the melt shape for metric tables."""
    stacked = t(spark, sf_dir, "lineitem").selectExpr(
        "stack(3, 'quantity', l_quantity, 'extendedprice', l_extendedprice,"
        " 'discount', l_discount) AS (measure, value)"
    )
    return stacked.groupBy("measure").agg(
        dsum(dec("value"), "total"), F.count(F.lit(1)).alias("n")
    )


@register(
    "win_ntile_distribution",
    oracle="""
SELECT c_mktsegment, c_custkey,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
""",
    tags=("window", "distribution"),
)
def win_ntile_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist — rank-distribution functions over a
    total order (acctbal, custkey), identical rational arithmetic in both
    engines."""
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_custkey",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "proj_string_functions",
    oracle="""
SELECT c_custkey,
       substring(c_name, 10, 9) AS cust_num,
       CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
       lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded_key,
       split_part(c_name, '#', 1) AS name_prefix,
       reverse(c_mktsegment) AS seg_rev,
       repeat(left(c_mktsegment, 1), 3) AS seg_initials,
       CAST(length(replace(c_name, '0', '')) AS BIGINT) AS len_no_zero
FROM customer
""",
    tags=("projection", "string-fns"),
)
def proj_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function battery: substring/instr/lpad/split_part/reverse/
    repeat/replace — Spark `instr` == DuckDB `strpos`."""
    return t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.substring("c_name", 10, 9).alias("cust_num"),
        F.instr("c_name", "#").cast("bigint").alias("hash_pos"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded_key"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(1)).alias("name_prefix"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.repeat(F.substring("c_mktsegment", 1, 1), 3).alias("seg_initials"),
        F.length(F.regexp_replace("c_name", "0", "")).cast("bigint").alias("len_no_zero"),
    )


@register(
    "proj_date_functions",
    oracle="""
SELECT o_orderkey,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
       CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(extract(quarter FROM o_orderdate) AS BIGINT) AS o_quarter,
       CAST(extract(dow FROM o_orderdate) + 1 AS BIGINT) AS dow_sunday1,
       CAST(last_day(o_orderdate) AS DATE) AS month_end,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_epoch_start,
       CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3m
FROM orders
""",
    tags=("projection", "date-fns"),
)
def proj_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function battery. Encoded parity caveats: Spark dayofweek is
    1=Sunday vs DuckDB dow 0=Sunday (+1 in the oracle); DuckDB date_trunc
    returns DATE (cast to TIMESTAMP); add_months == interval-month addition
    (both clamp to month end)."""
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").cast("bigint").alias("o_year"),
        F.quarter("o_orderdate").cast("bigint").alias("o_quarter"),
        F.dayofweek("o_orderdate").cast("bigint").alias("dow_sunday1"),
        F.last_day("o_orderdate").alias("month_end"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_epoch_start"),
        F.add_months("o_orderdate", 3).cast("timestamp").alias("plus_3m"),
    )
