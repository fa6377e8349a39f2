"""Relational query battery (SURVEY.md §2.2–§2.4).

The reference connector delegates ALL relational operators to its host engine
(Flink Blink planner) — demonstrated by its SQL tests
(`src/test/java/.../sql/DtsTableISelectTCaseTest.java:83-91`,
`DtsTableIJoinTCase.java:64-88`). Here Spark SQL / Catalyst is the host
engine; these queries pin the full surface (projection/filter, all join
shapes, hash/sort aggregates, rollup/grouping-sets, window functions,
set ops, top-k, sessionization, JSON access) against a DuckDB oracle.

Scale notes (100 TB stance, checked via .explain on each):
 - filters/projections sit on the parquet scan (PushedFilters/ReadSchema);
 - dimension joins (region/nation/customer/supplier/part) broadcast — dims
   stay small at any SF, so the fact table is never shuffled for them;
 - fact-fact joins (orders⋈lineitem) shuffle once on the join key; AQE
   coalesces partitions and splits skew at runtime;
 - aggregates use algebraic functions → map-side partial aggregation.

Determinism: DOUBLE aggregation routes through exact decimal arithmetic —
see plans/registry.py docstring.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flink_dts_connector_spark.plans.registry import register
from flink_dts_connector_spark.session import load_table

# Exact-arithmetic casts (registry.py docstring). D18 for raw money/qty
# doubles (< 1e12 absolute), D8 for [0,2) factors like (1 - discount).
D18 = "decimal(18,6)"
D8 = "decimal(8,6)"


def dec(c: Column | str, typ: str = D18) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(typ)


def dsum(c: Column, alias: str) -> Column:
    """Exact decimal sum surfaced as DOUBLE (order-insensitive).

    The intermediate cast to DECIMAL(38,6) is exact (inputs carry ≤6 real
    decimal places) and keeps the final decimal→double conversion in the
    ≤2^53-numerator range where Spark and DuckDB round identically.
    """
    return F.sum(c).cast("decimal(38,6)").cast("double").alias(alias)


def dsum2(c: Column, alias: str) -> Column:
    """`dsum` with the final scale reduced to DECIMAL(38,2) — the registry
    header's prescribed fix for aggregates whose magnitude breaches the
    scale-6 2^53 bound at big SFs (r10, VERDICT r9 #7). The sum itself is
    still exact; only the FINAL value is rounded to cents before the
    double cast, identically in both engines (HALF_UP at scale 2), which
    raises the correctly-rounded DECIMAL→DOUBLE bound from ~9.0e9 to
    ~9.0e13 — two orders above the largest sf1 aggregate (3.8e11) with
    headroom to ~sf200. Queries using it carry the ``dec2`` tag so
    tools/sweep_sf1.py applies the matching bound.

    The rounding must be an EXPLICIT round(x, 2), not a bare cast to
    DECIMAL(38,2): Spark's decimal downscale cast rounds HALF_UP while
    DuckDB's TRUNCATES (measured: 270163925.4896 → .49 vs .48), so a bare
    cast diverges whenever the summed expression carries real sub-cent
    digits (disc_price has 4). Both engines' round() is half-away-from-
    zero on decimals, so the oracle mirrors `round(CAST(SUM(..) AS
    DECIMAL(38,6)), 2)`."""
    return (
        F.round(F.sum(c).cast("decimal(38,6)"), 2)
        .cast("decimal(38,2)")
        .cast("double")
        .alias(alias)
    )


#: SQL twin of dsum2: round half-away-from-zero at scale 2, then DOUBLE.
def sql_dsum2(sum_expr: str, alias: str) -> str:
    return (
        f"CAST(round(CAST(SUM({sum_expr}) AS DECIMAL(38,6)), 2) AS DOUBLE) AS {alias}"
    )


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def disc_price_col() -> Column:
    return dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"), D8)


# SQL fragment mirroring disc_price_col() for the DuckDB oracle.
SQL_DISC_PRICE = "CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(8,6))"


# ---------------------------------------------------------------------------
# TPC-H-adapted core
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)), 2) AS DOUBLE) AS sum_qty,
       CAST(round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)), 2) AS DOUBLE) AS sum_base_price,
       CAST(round(CAST(SUM({SQL_DISC_PRICE}) AS DECIMAL(38,6)), 2) AS DOUBLE) AS sum_disc_price,
       CAST(round(CAST(SUM({SQL_DISC_PRICE} * CAST(1 + l_tax AS DECIMAL(8,6))) AS DECIMAL(38,6)), 2) AS DOUBLE) AS sum_charge,
       CAST(round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)), 2) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)), 2) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("agg", "tpch", "dec2"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan-filter → partial+final hash aggregate, 8 aggregates."""
    l = t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc_price = disc_price_col()
    charge = disc_price * dec(F.lit(1) + F.col("l_tax"), D8)
    # dsum2: sf1+ sums breach the scale-6 bound (sum_charge hit 2.9e10);
    # final cents-rounding is applied identically in the oracle
    g = l.groupBy("l_returnflag", "l_linestatus").agg(
        dsum2(dec("l_quantity"), "sum_qty"),
        dsum2(dec("l_extendedprice"), "sum_base_price"),
        dsum2(disc_price, "sum_disc_price"),
        dsum2(charge, "sum_charge"),
        dsum(dec("l_discount"), "_sum_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return g.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        (F.col("sum_qty") / F.col("count_order")).alias("avg_qty"),
        (F.col("sum_base_price") / F.col("count_order")).alias("avg_price"),
        (F.col("_sum_disc") / F.col("count_order")).alias("avg_disc"),
        "count_order",
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
SELECT l_orderkey,
       CAST(CAST(SUM({SQL_DISC_PRICE}) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
       o_orderdate
FROM customer
JOIN orders    ON c_custkey = o_custkey
JOIN lineitem  ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    tags=("join", "agg", "topk", "tpch"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: broadcast dim-filtered join + agg + deterministic top-k.

    customer is broadcast (small side); orders⋈lineitem shuffles on orderkey.
    """
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    c = t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = t(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    l = t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(disc_price_col(), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
    tags=("join", "semi", "agg", "tpch"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 adapted (testdata lacks commit/receipt dates): EXISTS →
    left-semi join on (orderkey, shipdate > orderdate)."""
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
SELECT n_name, CAST(CAST(SUM({SQL_DISC_PRICE}) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
""",
    tags=("join", "agg", "tpch"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way join; all dims broadcast, facts shuffle on orderkey."""
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA").select("r_regionkey")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(disc_price_col(), "revenue"))
    )


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(8,6))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.06
  AND l_quantity < 24
""",
    tags=("agg", "filter", "tpch"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate; every predicate pushes to parquet."""
    l = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.02, 0.06))
        & (F.col("l_quantity") < 24)
    )
    return l.agg(dsum(dec("l_extendedprice") * dec("l_discount", D8), "revenue"))


@register(
    "q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name, CAST(CAST(SUM({SQL_DISC_PRICE}) AS DECIMAL(38,6)) AS DOUBLE) AS revenue, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    tags=("join", "agg", "topk", "tpch"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue per customer, deterministic top-20."""
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    l = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(disc_price_col(), "revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Grouping surfaces: rollup / grouping sets / pivot
# ---------------------------------------------------------------------------


@register(
    "agg_rollup_pricing",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    tags=("agg", "rollup"),
)
def agg_rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (flag, flag+status, grand total)."""
    return (
        t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum(dec("l_quantity"), "sum_qty"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "agg_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,2)) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
""",
    tags=("agg", "grouping-sets", "dec2"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via Spark SQL over a temp view (dec2: the grand-total
    cell reached 3.8e11 at sf1 — cents-rounded final in both engines)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,2)) AS DOUBLE) AS total
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


@register(
    "agg_pivot_linestatus",
    oracle="""
SELECT l_returnflag,
       CAST(CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DECIMAL(38,6)) AS DOUBLE) AS qty_O,
       CAST(CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DECIMAL(38,6)) AS DOUBLE) AS qty_F
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg", "pivot"),
)
def agg_pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns (maps to two conditional aggregates)."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(dec("l_quantity")).cast("decimal(38,6)").cast("double"))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
    )


@register(
    "agg_distinct_counts",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS n_supp,
       COUNT(DISTINCT l_partkey) AS n_part,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg", "distinct"),
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi countDistinct (expand-based distinct aggregation)."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "win_topk_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
    tags=("window", "topk"),
)
def win_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number (single shuffle on the partition key).

    No arithmetic on o_totalprice → raw doubles compare identically, and the
    (price DESC, orderkey) order is total, so rn is deterministic.
    """
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= 3)
    )


@register(
    "win_running_total",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,6)) AS DOUBLE) AS running_spend
FROM orders
""",
    tags=("window",),
)
def win_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer spend; frame order made total via orderkey."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.sum(dec("o_totalprice")).over(w).cast("decimal(38,6)").cast("double").alias("running_spend"),
        )
    )


@register(
    "win_dense_rank_parts",
    oracle="""
SELECT p_brand, p_partkey, p_retailprice, drk FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS drk
  FROM part
) WHERE drk <= 2
""",
    tags=("window", "topk"),
)
def win_dense_rank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank: ties share ranks; rows-with-rank≤2 is deterministic as a set."""
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    return (
        t(spark, sf_dir, "part")
        .select("p_brand", "p_partkey", "p_retailprice")
        .withColumn("drk", F.dense_rank().over(w).cast("bigint"))
        .where(F.col("drk") <= 2)
    )


@register(
    "win_lag_gap_events",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(gap_us) AS BIGINT) AS total_gap_us
FROM (
  SELECT user_id,
         COALESCE(epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0) AS gap_us
  FROM events
)
GROUP BY user_id
""",
    tags=("window", "events"),
)
def win_lag_gap_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() inter-event gaps per user in exact integer microseconds."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gaps = t(spark, sf_dir, "events").select(
        "user_id",
        F.coalesce(us - F.lag(us).over(w), F.lit(0).cast("bigint")).alias("gap_us"),
    )
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("gap_us").alias("total_gap_us")
    )


# ---------------------------------------------------------------------------
# Join shapes: semi / anti / outer; set operations
# ---------------------------------------------------------------------------


@register(
    "join_anti_customers_without_orders",
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
""",
    tags=("join", "anti"),
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join. The urgent-order condition keeps the
    result non-empty at every SF (order/customer ratios are fixed, so
    plain customers-without-any-orders is empty beyond sf0.001)."""
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti")


@register(
    "join_left_outer_null_path",
    oracle="""
SELECT o_orderkey, o_totalprice, c_name
FROM orders
LEFT JOIN customer ON o_custkey = c_custkey AND c_acctbal > 9000
WHERE o_orderkey % 100 = 0
""",
    tags=("join", "outer"),
)
def join_left_outer_null_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with a non-key join predicate (null-extension path)."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 100 == 0)
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    return (
        o.join(
            F.broadcast(c),
            (o.o_custkey == c.c_custkey) & (c.c_acctbal > 9000),
            "left",
        )
        .select("o_orderkey", "o_totalprice", "c_name")
    )


@register(
    "setop_nation_overlap",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
    tags=("setop",),
)
def setop_nation_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics) of two key sets."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "setop_except_all",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT ALL
SELECT s_nationkey AS nationkey FROM supplier
""",
    tags=("setop",),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics) — multiplicity-aware difference."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)


# ---------------------------------------------------------------------------
# Scalar projection / subqueries / JSON / sessionization
# ---------------------------------------------------------------------------


@register(
    "proj_scalar_concat",
    oracle="""
SELECT c_custkey, concat('dts-', c_name) AS tagged_name,
       upper(c_mktsegment) AS seg, length(c_name) AS name_len
FROM customer
""",
    tags=("projection",),
)
def proj_scalar_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function projection — parity with the reference's own SELECT
    test query `concat('dts-', name)`
    (`src/test/java/.../sql/DtsTableISelectTCaseTest.java:83-89`)."""
    return t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.concat(F.lit("dts-"), F.col("c_name")).alias("tagged_name"),
        F.upper("c_mktsegment").alias("seg"),
        F.length("c_name").cast("bigint").alias("name_len"),
    )


@register(
    "subq_above_nation_avg_balance",
    oracle="""
SELECT c_custkey, c_nationkey, c_acctbal
FROM (
  SELECT c_custkey, c_nationkey, c_acctbal,
         CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) OVER (PARTITION BY c_nationkey) AS DECIMAL(38,6)) AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY c_nationkey) AS nation_avg
  FROM customer
)
WHERE c_acctbal > nation_avg
""",
    tags=("subquery", "window"),
)
def subq_above_nation_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated 'above group average' — decorrelated to a window (one
    shuffle on nationkey instead of self-join). Average via exact decimal
    sum / count so the comparison is engine-identical."""
    w = W.partitionBy("c_nationkey")
    c = t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        (
            F.sum(dec("c_acctbal")).over(w).cast("decimal(38,6)").cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("nation_avg"),
    )
    return c.where(F.col("c_acctbal") > F.col("nation_avg")).drop("nation_avg")


@register(
    "events_json_extract",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n
FROM events
GROUP BY event_type
""",
    tags=("json", "events"),
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction (props is a JSON string column) + integer agg."""
    return (
        t(spark, sf_dir, "events")
        .select("event_type", F.get_json_object("props", "$.k").cast("bigint").alias("k"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "events_hourly_tumbling",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
    tags=("window-agg", "events"),
)
def events_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows via F.window (batch form of the streaming op).

    F.window's window.start for a 1h/epoch-aligned window == date_trunc(hour).
    """
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").start.alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum(dec("value"), "total_value"))
    )


@register(
    "events_sessionize",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > 1800000000 OR
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), sessions AS (
  SELECT user_id,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM flagged
)
SELECT user_id, COUNT(DISTINCT sess_id) AS n_sessions, COUNT(*) AS n_events
FROM sessions GROUP BY user_id
""",
    tags=("window", "sessionize", "events"),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag-gap > 30 min starts a session; cumsum labels it.

    Batch analogue of streaming session_window(ts, gap) — same shuffle shape
    (single exchange on user_id feeding both windows).
    """
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    e = t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    flagged = e.withColumn(
        "new_sess",
        F.when(
            F.lag("ts").over(w).isNull() | (us - F.lag(us).over(w) > 1800 * 1_000_000),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn("sess_id", F.sum("new_sess").over(wcum))
    return sess.groupBy("user_id").agg(
        F.countDistinct("sess_id").alias("n_sessions"), F.count(F.lit(1)).alias("n_events")
    )


@register(
    "events_json_struct",
    oracle="""
SELECT event_type,
       COUNT(*) FILTER (WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50) AS n_high,
       COUNT(*) AS n,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
""",
    tags=("json", "events"),
)
def events_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with a declared schema (vs get_json_object's path probes):
    parse props into a typed struct once, then ordinary column ops."""
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("k", T.LongType())])
    e = t(spark, sf_dir, "events").withColumn("p", F.from_json("props", schema))
    return e.groupBy("event_type").agg(
        F.count(F.when(F.col("p.k") > 50, 1)).alias("n_high"),
        F.count(F.lit(1)).alias("n"),
        F.max("p.k").alias("max_k"),
    )
