"""Streaming integration beyond the oracle battery: custom stateful
operator, and the CDC decode pipeline running as a real stream with
foreachBatch upsert materialization."""

from __future__ import annotations

import tempfile
import uuid

import pandas as pd
import pytest

from pyspark.sql import functions as F

from flink_dts_connector_spark.session import load_table
from flink_dts_connector_spark.streaming.runner import read_stream_table


def test_stateful_running_counts(spark, sf_dir):
    """Custom stateful operator (applyInPandasWithState): per-user event
    counts accumulated across micro-batches must equal the batch groupBy."""
    try:
        from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    except ImportError:
        pytest.skip("applyInPandasWithState state API unavailable")

    ev = read_stream_table(spark, sf_dir, "events")

    def count_fn(key, pdf_iter, state):
        total = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [total]})

    out = (
        ev.groupBy("user_id")
        .applyInPandasWithState(
            count_fn,
            outputStructType="user_id bigint, n bigint",
            stateStructType="n bigint",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    name = f"st_{uuid.uuid4().hex[:10]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="fdcs_state_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last update per user = final count
    got = {
        r["user_id"]: r["n"]
        for r in spark.table(name)
        .groupBy("user_id")
        .agg(F.max("n").alias("n"))
        .collect()
    }
    expected = {
        r["user_id"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expected


def test_cdc_stream_foreachbatch_upsert(spark, sf_dir, tmp_path):
    """CDC bytes as a real stream: decode → typed changelog → foreachBatch
    upsert — final materialized state must equal the batch pipeline's."""
    from flink_dts_connector_spark.formats.decoder import decode_cdc
    from flink_dts_connector_spark.formats.typed import project_table
    from flink_dts_connector_spark.operators.changelog import materialize_upsert
    from flink_dts_connector_spark.plans.cdc_queries import ORDERS_CDC_SCHEMA
    from flink_dts_connector_spark.sources.generator import DB, TBL, generate_cdc_bytes

    raw_dir = str(tmp_path / "raw")
    generate_cdc_bytes(spark, sf_dir).write.parquet(raw_dir)

    raw_stream = spark.readStream.schema("value binary, partition int, offset long").parquet(
        raw_dir
    )
    env = decode_cdc(raw_stream, tables=[f"{DB}.{TBL}"], ops=["INSERT", "UPDATE", "DELETE"])
    chg = project_table(env, ORDERS_CDC_SCHEMA, table=f"{DB}.{TBL}")

    sink: list = []

    def upsert_batch(batch_df, epoch_id):
        sink.append(batch_df.toPandas())

    q = (
        chg.writeStream.foreachBatch(upsert_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = pd.concat(sink, ignore_index=True)
    all_chg = spark.createDataFrame(streamed, schema=chg.schema)
    got = (
        materialize_upsert(all_chg, ["o_orderkey"], order_cols=["ts", "record_id"])
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )

    batch_chg = project_table(
        decode_cdc(
            generate_cdc_bytes(spark, sf_dir),
            tables=[f"{DB}.{TBL}"],
            ops=["INSERT", "UPDATE", "DELETE"],
        ),
        ORDERS_CDC_SCHEMA,
        table=f"{DB}.{TBL}",
    )
    want = (
        materialize_upsert(batch_chg, ["o_orderkey"], order_cols=["ts", "record_id"])
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )
    got_rows = {tuple(r) for r in got.collect()}
    want_rows = {tuple(r) for r in want.collect()}
    assert got_rows == want_rows and len(got_rows) > 0


def test_stream_kill_restart_no_gaps(spark, sf_dir, tmp_path):
    """Failover contract (reference README.md:26-28): stop a CDC stream
    mid-flight, restart from the same checkpoint, and the union of outputs
    must cover every record exactly once (Structured Streaming WAL gives
    exactly-once into foreachBatch per epoch; re-delivered epochs replace,
    not duplicate)."""
    from flink_dts_connector_spark.formats.decoder import decode_cdc
    from flink_dts_connector_spark.sources.generator import generate_cdc_bytes

    raw_dir = str(tmp_path / "raw")
    # many small files so the stream takes several micro-batches
    generate_cdc_bytes(spark, sf_dir).repartition(8).write.parquet(raw_dir)
    ckpt = str(tmp_path / "ckpt")

    seen: dict[int, set] = {}

    def sink(batch_df, epoch_id):
        seen[epoch_id] = {r["id"] for r in batch_df.select("id").collect()}

    def run(stop_after_batches=None):
        raw_stream = (
            spark.readStream.schema("value binary, partition int, offset long")
            .option("maxFilesPerTrigger", 2)
            .parquet(raw_dir)
        )
        env = decode_cdc(raw_stream)
        q = (
            env.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if stop_after_batches is not None:
            while len(seen) < stop_after_batches and q.isActive:
                q.awaitTermination(0.2)
            q.stop()  # kill mid-stream
            q.awaitTermination()
        else:
            q.awaitTermination()

    run(stop_after_batches=2)  # first run: killed after ~2 batches
    n_after_kill = len(seen)
    run()  # restart from the same checkpoint → drains the rest
    assert len(seen) > n_after_kill

    all_ids = [i for s in seen.values() for i in s]
    expected = {r["id"] for r in decode_cdc(spark.read.parquet(raw_dir)).select("id").collect()}
    # no gaps, and no duplicates across epochs (exactly-once per epoch id)
    assert set(all_ids) == expected
    assert len(all_ids) == len(set(all_ids))


def test_chained_join_agg_delayed_watermark_cutoff(spark, tmp_path):
    """Pins the CHAINED-stateful emission boundary distinctly: a window
    whose end lies between (global watermark − join interval) and the
    global watermark must NOT emit — the downstream agg closes against the
    watermark delayed by the join's 1 h buffering, not the raw watermark.
    The fixture data never lands a window in that band, so this synthetic
    case is the only thing separating the two hypotheses."""
    import datetime as dt

    from flink_dts_connector_spark.plans.registry import all_queries

    base = dt.datetime(2024, 1, 1)

    def ev(eid, hh, mm, uid, typ):
        return dict(
            event_id=eid,
            ts=base + dt.timedelta(hours=hh, minutes=mm),
            user_id=uid,
            event_type=typ,
            value=1.0,
            props="{}",
        )

    rows = [
        # matched purchase in [10:00, 11:00) — end 11:00 ≤ W−1h → emits
        ev(1, 10, 29, 7, "view"),
        ev(2, 10, 30, 7, "purchase"),
        # matched purchase in [12:00, 13:00) — end 13:00 ∈ (W−1h, W] →
        # emits ONLY under the undelayed-watermark hypothesis
        ev(3, 12, 29, 8, "view"),
        ev(4, 12, 30, 8, "purchase"),
        # watermark anchors: max purchase 13:59 → W = 13:49; max view 14:30
        ev(5, 13, 59, 9, "purchase"),
        ev(6, 14, 30, 9, "view"),
    ]
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    sf_dir = str(tmp_path / "sf")
    import os

    os.makedirs(sf_dir)
    pdf.to_parquet(os.path.join(sf_dir, "events.parquet"))

    out = all_queries()["stream_chained_join_agg"].fn(spark, sf_dir)
    got = {(r["window_start"], r["n"]) for r in out.collect()}
    assert got == {(base + dt.timedelta(hours=10), 1)}, got


def test_stream_state_rows_match_closed_form(spark, sf_dir):
    """Runtime introspection vs closed form: after an availableNow windowed
    aggregation completes, the state store must hold EXACTLY the windows
    the final watermark has not evicted — numRowsTotal is not an opaque
    gauge, it is computable relationally (distinct (window, key) groups
    with window_end > max(ts) - delay). Pins the operational meaning of
    the state-size metric the SCALING.md budget math relies on."""
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from flink_dts_connector_spark.session import load_table
    from flink_dts_connector_spark.streaming.runner import (
        pinned_shuffle_partitions,
        read_stream_table,
    )

    ev = read_stream_table(spark, sf_dir, "events")
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"q_{uuid.uuid4().hex[:12]}"
    with pinned_shuffle_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="fdcs_state_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progress = q.lastProgress
    state_rows = progress["stateOperators"][0]["numRowsTotal"]

    batch = load_table(spark, sf_dir, "events")
    mx = batch.agg(F.max("ts")).collect()[0][0]
    expected = (
        batch.select(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .where(F.expr(f"w.end > timestamp'{mx}' - interval 10 minutes"))
        .select("w", "event_type")
        .distinct()
        .count()
    )
    assert state_rows == expected, (state_rows, expected)
