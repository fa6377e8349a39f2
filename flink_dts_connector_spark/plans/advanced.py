"""Second relational wave: scalar-subquery shapes, disjunctive pushdown,
HAVING on exact sums, approx-distinct, and the temporal joins (as-of /
range) the reference's host engine exposes as interval/temporal joins
(SURVEY.md §2.3) — built here with the scale-first operators in
operators/asof.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flink_dts_connector_spark.operators.asof import asof_join, range_join_buckets
from flink_dts_connector_spark.plans.registry import register
from flink_dts_connector_spark.plans.relational import D8, SQL_DISC_PRICE, dec, disc_price_col, dsum, t


@register(
    "q2_cheapest_part_per_type",
    oracle="""
SELECT p_type, p_partkey, p_retailprice
FROM part
QUALIFY p_retailprice = MIN(p_retailprice) OVER (PARTITION BY p_type)
""",
    tags=("subquery", "window", "tpch"),
)
def q2_cheapest_part_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp in testdata): per-group min scalar
    subquery, decorrelated to a window — one shuffle, keeps ties."""
    w = W.partitionBy("p_type")
    return (
        t(spark, sf_dir, "part")
        .select("p_type", "p_partkey", "p_retailprice", F.min("p_retailprice").over(w).alias("_m"))
        .where(F.col("p_retailprice") == F.col("_m"))
        .drop("_m")
    )


@register(
    "q7_volume_between_nations",
    oracle=f"""
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(CAST(SUM({SQL_DISC_PRICE}) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
""",
    tags=("join", "agg", "tpch"),
)
def q7_volume_between_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bidirectional nation-pair trade volume per ship year."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    pair = (
        (F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2")
    ) | ((F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == n1.c_nk)
        .join(F.broadcast(n2), s.s_nationkey == n2.s_nk)
        .where(pair)
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(dsum(disc_price_col(), "revenue"))
    )


@register(
    "q12_priority_by_year",
    oracle="""
SELECT CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate
GROUP BY 1
""",
    tags=("join", "agg", "tpch"),
)
def q12_priority_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts of late-shipped lines by year."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, (l.l_orderkey == o.o_orderkey) & (l.l_shipdate > o.o_orderdate))
        .groupBy(F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue_pct",
    oracle=f"""
SELECT 100.0 * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {SQL_DISC_PRICE} END) AS DECIMAL(38,6)) AS DOUBLE)
             / CAST(CAST(SUM({SQL_DISC_PRICE}) AS DECIMAL(38,6)) AS DOUBLE) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
""",
    tags=("join", "agg", "tpch"),
)
def q14_promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share — both sums exact-decimal, then one
    deterministic double division and scale."""
    l = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    dp = disc_price_col()
    agg = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", dp)).cast("decimal(38,6)").cast("double").alias("_promo"),
            F.sum(dp).cast("decimal(38,6)").cast("double").alias("_total"),
        )
    )
    return agg.select((F.lit(100.0) * F.col("_promo") / F.col("_total")).alias("promo_revenue_pct"))


@register(
    "q18_large_volume_orders",
    oracle="""
SELECT c_custkey, o_orderkey, o_orderdate,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total_qty
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2, 3
HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 150
""",
    tags=("join", "agg", "having", "tpch"),
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: HAVING on an exact decimal sum (threshold compare never
    touches floats)."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    c = t(spark, sf_dir, "customer").select("c_custkey")
    g = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate")
        .agg(F.sum(dec("l_quantity")).alias("_q"))
        .where(F.col("_q") > 150)
    )
    return g.select(
        "c_custkey", "o_orderkey", "o_orderdate",
        F.col("_q").cast("decimal(38,6)").cast("double").alias("total_qty"),
    )


@register(
    "q19_disjunctive_predicates",
    oracle=f"""
SELECT CAST(CAST(SUM({SQL_DISC_PRICE}) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#13' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#20' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
""",
    tags=("join", "filter", "tpch"),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs across both join sides — exercises Catalyst's
    disjunction handling and join-condition pushdown."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 11) & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#13") & F.col("l_quantity").between(10, 20) & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#20") & F.col("l_quantity").between(20, 30) & F.col("p_size").between(1, 15))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .where(cond)
        .agg(dsum(disc_price_col(), "revenue"))
    )


@register(
    "q22_idle_customers",
    oracle="""
WITH avg_bal AS (
  SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) / COUNT(*) AS v
  FROM customer WHERE c_acctbal > 0
)
SELECT c_custkey % 10 AS code_group,
       COUNT(*) AS numcust,
       CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > v
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY 1
""",
    tags=("subquery", "anti", "agg", "tpch"),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers above the global average balance (exact
    arithmetic, broadcast 1-row cross join) with no RECENT orders (anti
    join) — 'idle since 2000', calibrated non-empty on the testdata."""
    c = t(spark, sf_dir, "customer")
    avg_bal = (
        c.where(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(dec("c_acctbal")).cast("decimal(38,6)").cast("double")
                / F.count(F.lit(1))
            ).alias("v")
        )
    )
    o = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("v"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy((F.col("c_custkey") % 10).alias("code_group"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(dec("c_acctbal"), "totacctbal"),
        )
    )


@register(
    "agg_approx_distinct",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS orders_within_bound,
       TRUE AS parts_within_bound
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg", "approx"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counts (per returnflag), made oracle-checkable:
    Spark's HLL++ is deterministic for fixed data + rsd, so we emit the exact
    count plus a boolean asserting |approx − exact| ≤ 5%·exact; the oracle
    emits the exact count and literal TRUE. A wildly-off sketch therefore
    fails the hash gate rather than hiding behind a rows-only check.

    Shape notes from the r4 sweep's scaling table (this was the registry's
    one outlier, 88 s at sf0.1 in a default-memory vanilla session):
    (a) rsd = 0.02, not 0.01 — the tighter sketches (2^14+ registers per
    group per column) GC-thrashed for a 3.4× cost with no verdict change;
    measured margin at 0.02 is worst |err| 3.3% across all driver SFs,
    1.5× inside the asserted bound. (b) one single-distinct aggregate PER
    COLUMN, joined on the group key, instead of one multi-distinct
    aggregate — Spark plans the latter as an EXPAND that triples the fact
    table before the shuffle; two partial-distinct aggs scan twice but
    move a fraction of the rows (measured 3× faster, 8.8 s vanilla).
    This is the right 100 TB shape too: expand multiplies the corpus, a
    per-column distinct agg is map-side-combined."""
    li = t(spark, sf_dir, "lineitem")
    o = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("_ao"),
    )
    p = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("_ap"),
    )
    return (
        o.join(p, "l_returnflag")
        .select(
            "l_returnflag",
            "exact_orders",
            "exact_parts",
            (F.abs(F.col("_ao") - F.col("exact_orders")) * 100 <= F.col("exact_orders") * 5)
            .alias("orders_within_bound"),
            (F.abs(F.col("_ap") - F.col("exact_parts")) * 100 <= F.col("exact_parts") * 5)
            .alias("parts_within_bound"),
        )
    )


@register(
    "asof_purchase_last_view",
    oracle="""
WITH purchases AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
), views AS (
  SELECT event_id AS view_event_id, user_id, ts AS view_ts FROM events WHERE event_type = 'view'
), matched AS (
  SELECT p.event_id, v.view_event_id, v.view_ts
  FROM purchases p JOIN views v
    ON p.user_id = v.user_id AND v.view_ts <= p.ts
  QUALIFY ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY v.view_ts DESC, v.view_event_id DESC) = 1
)
SELECT p.event_id, p.user_id, p.ts, p.value, m.view_event_id, m.view_ts
FROM purchases p LEFT JOIN matched m ON p.event_id = m.event_id
""",
    tags=("join", "asof"),
)
def asof_purchase_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase picks the user's latest view at-or-before
    it. Union+window implementation (operators/asof.py) — one shuffle on
    user_id, no per-key pair blow-up; ties broken by view_event_id."""
    ev = t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_event_id"),
        "user_id",
        F.col("ts").alias("view_ts"),
    )
    return asof_join(
        purchases,
        views,
        on="user_id",
        left_ts="ts",
        right_ts="view_ts",
        right_cols=["view_event_id", "view_ts"],
        tie_break="view_event_id",
    )


@register(
    "range_join_purchase_views",
    oracle="""
SELECT p.event_id AS purchase_id, v.event_id AS view_id,
       epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
FROM events p JOIN events v
  ON p.user_id = v.user_id
 AND v.ts <= p.ts AND epoch_us(v.ts) >= epoch_us(p.ts) - 600000000
WHERE p.event_type = 'purchase' AND v.event_type = 'view'
""",
    tags=("join", "range"),
)
def range_join_purchase_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: every (purchase, view) pair of the same user within 10
    minutes — bucketized equi-join shape (operators/asof.py) instead of a
    nested-loop theta join."""
    ev = t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("view_ts")
    )
    joined = range_join_buckets(
        purchases.withColumnRenamed("ts", "p_ts"),
        views,
        on="user_id",
        left_ts="p_ts",
        right_ts="view_ts",
        max_gap_seconds=600,
    )
    return joined.select(
        "purchase_id",
        "view_id",
        (F.unix_micros("p_ts") - F.unix_micros("view_ts")).alias("gap_us"),
    )


@register(
    "q13_order_count_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
) GROUP BY c_count
""",
    tags=("join", "agg", "tpch"),
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: histogram of per-customer order counts including the
    zero-order bucket (left join keeps empty customers)."""
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "5-LOW").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(CAST(SUM({SQL_DISC_PRICE}) AS DECIMAL(38,6)) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
    tags=("join", "subquery", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: revenue view + max scalar subquery (ties kept). Exact
    decimal revenue makes the max comparison engine-identical."""
    l = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(disc_price_col(), "total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("m"))
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("m"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 3000)
GROUP BY p_brand, p_size
""",
    tags=("join", "anti", "distinct", "tpch"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per part attribute with a
    NOT IN exclusion subquery (anti join on a broadcast exclusion list)."""
    excluded = t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 3000).select(
        "s_suppkey"
    )
    p = t(spark, sf_dir, "part").where(F.col("p_type") != "PROMO").select(
        "p_partkey", "p_brand", "p_size"
    )
    l = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(excluded), l.l_suppkey == excluded.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
WITH part_avg AS (
  SELECT l_partkey AS pk,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem JOIN part_avg ON l_partkey = pk
WHERE l_quantity < 0.2 * avg_qty
""",
    tags=("join", "subquery", "agg", "tpch"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated per-part average decorrelated to an aggregate
    + join; the threshold compare uses the exact-decimal average cast to
    double (identical in both engines)."""
    l = t(spark, sf_dir, "lineitem")
    part_avg = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.sum(dec("l_quantity")).cast("decimal(38,6)").cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        l.join(part_avg, l.l_partkey == part_avg.pk)
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("decimal(38,6)").cast("double") / 7.0).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "q21_sole_late_supplier",
    oracle="""
WITH l AS (
  SELECT l_orderkey, l_suppkey, o_orderdate, l_shipdate
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
)
SELECT s_name, COUNT(DISTINCT a.l_orderkey) AS numwait
FROM l a
JOIN supplier ON a.l_suppkey = s_suppkey
WHERE a.l_shipdate > a.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM l b WHERE b.l_orderkey = a.l_orderkey AND b.l_suppkey <> a.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM l c WHERE c.l_orderkey = a.l_orderkey
                    AND c.l_suppkey <> a.l_suppkey
                    AND c.l_shipdate > c.o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
""",
    tags=("join", "semi", "anti", "tpch"),
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (shipdate>orderdate+60d standing in for the missing
    receipt/commit dates): suppliers who were the ONLY late shipper in
    multi-supplier finished orders — EXISTS + NOT EXISTS as semi/anti joins
    over one shared shuffle of the order-lines."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lines = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_suppkey", "o_orderdate", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)
    a = lines.where(late).alias("a")
    others = lines.alias("b")
    with_other = a.join(
        others,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_suppkey") != F.col("b.l_suppkey")),
        "left_semi",
    )
    other_late = lines.where(late).alias("c")
    sole_late = with_other.alias("a2").join(
        other_late,
        (F.col("a2.l_orderkey") == F.col("c.l_orderkey"))
        & (F.col("a2.l_suppkey") != F.col("c.l_suppkey")),
        "left_anti",
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_late.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )


@register(
    "q8_market_share",
    oracle=f"""
WITH base AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         {SQL_DISC_PRICE} AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
)
SELECT o_year,
       CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume END) AS DECIMAL(38,6)) AS DOUBLE)
         / CAST(CAST(SUM(volume) AS DECIMAL(38,6)) AS DOUBLE) AS mkt_share
FROM base GROUP BY o_year
""",
    tags=("join", "agg", "tpch"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's revenue share of a region's market per year —
    two exact-decimal sums, one deterministic division."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA").select("r_regionkey")
    vol = disc_price_col()
    base = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nk"))
    )
    agg = base.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_3", vol))
        .cast("decimal(38,6)").cast("double").alias("_n3"),
        F.sum(vol).cast("decimal(38,6)").cast("double").alias("_all"),
    )
    return agg.select("o_year", (F.col("_n3") / F.col("_all")).alias("mkt_share"))


@register(
    "q11_important_parts",
    oracle="""
WITH part_value AS (
  SELECT l_partkey,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS value
  FROM lineitem GROUP BY l_partkey
), stats AS (
  SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS v,
         COUNT(DISTINCT l_partkey) AS np
  FROM lineitem
)
SELECT l_partkey, value
FROM part_value, stats
WHERE value > 1.5 * (v / np)
""",
    tags=("agg", "subquery", "having", "tpch"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (lineitem value standing in for partsupp): parts
    worth > 1.5x the average part value — SF-invariant threshold from a
    global-stats scalar subquery as a broadcast 1-row cross join."""
    l = t(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    pv = l.groupBy("l_partkey").agg(
        F.sum(dec("l_extendedprice")).cast("decimal(38,6)").cast("double").alias("value")
    )
    stats = l.agg(
        F.sum(dec("l_extendedprice")).cast("decimal(38,6)").cast("double").alias("v"),
        F.countDistinct("l_partkey").alias("np"),
    )
    return (
        pv.crossJoin(F.broadcast(stats))
        .where(F.col("value") > 1.5 * (F.col("v") / F.col("np")))
        .select("l_partkey", "value")
    )


@register(
    "q20_promo_part_suppliers",
    oracle="""
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'PROMO'
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 50
)
""",
    tags=("join", "semi", "having", "tpch"),
)
def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: IN over a grouped-HAVING subquery → left-semi join
    on the qualifying supplier set; threshold on an exact decimal sum."""
    p = t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    l = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    qualifying = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(dec("l_quantity")).alias("_q"))
        .where(F.col("_q") > 50)
        .select("l_suppkey")
        .distinct()
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return s.join(qualifying, s.s_suppkey == qualifying.l_suppkey, "left_semi")


@register(
    "q9_profit_by_nation_year",
    oracle="""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(CAST(SUM(
         CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(8,6))
         - CAST(p_retailprice AS DECIMAL(18,6)) * CAST(l_quantity AS DECIMAL(9,0)) * CAST(0.1 AS DECIMAL(8,6))
       ) AS DECIMAL(38,6)) AS DOUBLE) AS profit
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
""",
    tags=("join", "agg", "tpch"),
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (p_retailprice·qty·0.1 standing in for the missing
    ps_supplycost): profit per supplier nation per year over parts matching
    a LIKE pattern — exact decimal revenue-minus-cost."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = t(spark, sf_dir, "part").where(F.col("p_name").like("%widget%")).select(
        "p_partkey", "p_retailprice"
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    # qty is integral (1..50): DECIMAL(9,0) keeps the triple product at
    # precision (37,12) — exact in BOTH engines (a (18,6) cast would push
    # past 38 and trigger engine-specific precision loss)
    profit = disc_price_col() - dec("p_retailprice") * dec("l_quantity", "decimal(9,0)") * dec(
        F.lit(0.1), D8
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("nation", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(F.sum(profit).cast("decimal(38,6)").cast("double").alias("profit"))
    )
