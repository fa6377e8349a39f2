"""Source/sink breadth (SURVEY.md §2.1): the reference implements no sinks
(tests print; dims come from JDBC) — Spark provides them all. These round
trips pin the formats this engine reads/writes plus partitioned-write
pruning, the scale-relevant sink property."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_dts_connector_spark.session import load_table


def _assert_same_rows(a, b):
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_parquet_roundtrip(spark, sf_dir, tmp_path):
    df = load_table(spark, sf_dir, "nation")
    out = str(tmp_path / "nation_pq")
    df.write.mode("overwrite").parquet(out)
    _assert_same_rows(df, spark.read.parquet(out))


def test_csv_roundtrip_with_schema(spark, sf_dir, tmp_path):
    df = load_table(spark, sf_dir, "region")
    out = str(tmp_path / "region_csv")
    df.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema(df.schema).option("header", True).csv(out)
    _assert_same_rows(df, back)


def test_json_roundtrip_with_schema(spark, sf_dir, tmp_path):
    df = load_table(spark, sf_dir, "supplier")
    out = str(tmp_path / "supplier_json")
    df.write.mode("overwrite").json(out)
    back = spark.read.schema(df.schema).json(out)
    _assert_same_rows(df, back)


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """Partitioned parquet + a partition-key filter must show PartitionFilters
    in the scan (no full-table read) — the 100 TB sink contract."""
    df = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_part")
    df.write.mode("overwrite").partitionBy("o_year").parquet(out)

    q = spark.read.parquet(out).where(F.col("o_year") == 1996)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_year" in plan.split("PartitionFilters")[1][:200]
    expected = df.where(F.col("o_year") == 1996).count()
    assert q.count() == expected > 0


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    df = load_table(spark, sf_dir, "part")
    out = str(tmp_path / "part_orc")
    df.write.mode("overwrite").orc(out)
    _assert_same_rows(df, spark.read.orc(out))
