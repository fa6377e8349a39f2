"""Decode-once columnar CDC store (`formats/ingest.py`).

The oracle-level proof (store-served typed changelog hash-matches the
wire-path oracle) lives in the registry (`cdc_ingest_once` and the
`cdc_store_*` twins); these tests pin the storage-layer contracts the
oracle can't see: partition layout, empty-table fidelity, pruning guard,
and in-session ingest caching.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_dts_connector_spark.datamodel.envelope import ENVELOPE_SCHEMA
from flink_dts_connector_spark.formats.ingest import (
    NO_TABLE,
    envelope_checksum,
    ingest_once,
    read_store,
)


@pytest.fixture(scope="module")
def store(spark, sf_dir) -> str:
    return ingest_once(spark, sf_dir)


def test_store_partition_layout(store):
    """Hive layout: one directory per (tbl_part, ingest_month); heartbeats
    (tbl='') land under the NO_TABLE sentinel, not the lossy default
    partition."""
    parts = sorted(d for d in os.listdir(store) if d.startswith("tbl_part="))
    assert f"tbl_part={NO_TABLE}" in parts
    assert "tbl_part=orders" in parts
    assert "tbl_part=__HIVE_DEFAULT_PARTITION__" not in parts
    months = os.listdir(os.path.join(store, "tbl_part=orders"))
    assert months and all(m.startswith("ingest_month=") for m in months)
    # one file per directory: the repartition-on-partition-keys contract
    files = os.listdir(os.path.join(store, "tbl_part=orders", sorted(months)[0]))
    assert len([f for f in files if f.endswith(".parquet")]) == 1


def test_store_preserves_empty_tbl(spark, store):
    """tbl stays a DATA column: the heartbeat rows' tbl='' round-trips
    (partitioning directly on tbl would collapse '' and NULL into the
    default partition and read back NULL)."""
    stored = spark.read.parquet(store)
    n_empty = stored.where(F.col("tbl") == "").count()
    n_hb = stored.where(F.col("operation") == "HEARTBEAT").count()
    assert n_hb > 0 and n_empty == n_hb


def test_read_store_prunes_and_filters(spark, sf_dir):
    """read_store's table filter reaches PartitionFilters (asserted inside)
    and selects exactly the orders-table rows."""
    df = read_store(spark, sf_dir, table="orders")  # raises if not pruned
    assert df.where(F.col("tbl") != "orders").count() == 0
    assert df.count() > 0


def test_read_store_unknown_table_empty(spark, sf_dir):
    df = read_store(spark, sf_dir, table="no_such_table")
    assert df.count() == 0


def test_ingest_once_cached_per_session(spark, sf_dir, store):
    assert ingest_once(spark, sf_dir) == store


def test_envelope_checksum_detects_mutation(spark, store):
    """The audit checksum is actually sensitive: flipping one record's
    operation changes it; an order shuffle does not."""
    stored = spark.read.parquet(store).select(*[f.name for f in ENVELOPE_SCHEMA.fields])
    base = envelope_checksum(stored)
    shuffled = stored.orderBy(F.rand(seed=7))
    assert envelope_checksum(shuffled) == base
    mutated = stored.withColumn(
        "operation",
        F.when(F.col("id") == stored.agg(F.min("id")).collect()[0][0], F.lit("DELETE"))
        .otherwise(F.col("operation")),
    )
    assert envelope_checksum(mutated) != base


def test_ingest_filtered_single_table_store(spark, sf_dir):
    """r8: the filtered store over the multi-tenant topic holds ONLY the
    selected table's selected ops (the JVM prefilter + exact decode filter
    ran inside the streaming ingest), its micro-batch plan keeps the
    prefilter JVM-side, and the build's stored≡re-decoded audit passed
    (ingest_filtered raises otherwise). Foreign-table mass (the orders
    stream, heartbeats, DDL) must be absent."""
    from flink_dts_connector_spark.formats.ingest import ingest_filtered
    from flink_dts_connector_spark.sources.generator import DOC_DB, DOC_TBL

    store_dir = ingest_filtered(
        spark, sf_dir, tables=[f"{DOC_DB}.{DOC_TBL}"], ops=["INSERT"]
    )
    df = spark.read.parquet(store_dir)
    assert df.count() > 0
    bad = df.where(
        (F.col("tbl") != DOC_TBL)
        | (F.col("db") != DOC_DB)
        | (F.col("operation") != "INSERT")
    ).count()
    assert bad == 0
    # second call is cached: same directory, no re-ingest
    assert (
        ingest_filtered(spark, sf_dir, tables=[f"{DOC_DB}.{DOC_TBL}"], ops=["INSERT"])
        == store_dir
    )
    # force=True bypasses the cache READ: a fresh ingest runs (new scratch
    # store dir) and refreshes the cache entry — this is what lets bench.py
    # time a real ingest after HEADLINE already populated the key (r8 ADVICE)
    forced = ingest_filtered(
        spark, sf_dir, tables=[f"{DOC_DB}.{DOC_TBL}"], ops=["INSERT"], force=True
    )
    assert forced != store_dir
    assert (
        ingest_filtered(spark, sf_dir, tables=[f"{DOC_DB}.{DOC_TBL}"], ops=["INSERT"])
        == forced
    )
