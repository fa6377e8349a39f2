"""Z-order serving layout for the decode-once CDC store.

`layout_zorder_skipping` / `layout_zorder_vs_linear` measured Morton
clustering on synthetic rectangles; this module APPLIES it to the real
store: re-cluster a table's stored changelog by the Morton interleave of
two probe dimensions and write a serving copy whose files each cover a
small RECTANGLE in (x, y) space. Parquet min/max statistics then prune a
2-D probe at the row-group level on EITHER dimension — a single-column
sort only prunes one (the lakehouse OPTIMIZE ZORDER contract, same idea
as the reference's range-partitioned replay windows:
`FlinkDtsKafkaConsumer.java:372-380` prunes on time only; a consumer
filtering on key AND time needs the interleave).

Scale notes (100 TB): the re-cluster is ONE range shuffle on the Morton
key (`repartitionByRange` samples the key space, so files are balanced
even when the dims are skewed) + a within-partition sort — the same cost
as any compaction pass, paid once per serving snapshot. The skip
measurement reads parquet FOOTERS only (pyarrow metadata, no row data),
which is exactly what the scan planner does — so the measured
touched-fraction is the fraction of bytes a 1000-executor scan would
actually read.
"""

from __future__ import annotations

import datetime
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_dts_connector_spark.operators.curation import zorder_key

#: (applicationId, sf_dir, table, layout) -> serving directory
_SERVE_CACHE: dict[tuple, str] = {}

#: Morton bits per dimension (1024 buckets) and serving file count. 32
#: files at toy SF = one row group each; at 100 TB the same code yields
#: thousands of files, each still a small (x, y) rectangle.
ZORDER_BITS = 10
SERVE_FILES = 32


def _as_long(df: DataFrame, name: str):
    """Integer view of a dim column; timestamps key on epoch seconds. ONE
    definition for both the base write and the delta merge — the two must
    key on the same grid or landing-file detection corrupts."""
    c = F.col(name)
    dt = dict(df.dtypes)[name]
    return F.unix_timestamp(c) if dt.startswith("timestamp") else c.cast("long")


def _bucket(col, mn, mx, bits: int = ZORDER_BITS):
    """Rank-free bucketization: map [mn, mx] onto 0..2^bits-1 with pure
    integer arithmetic (no window, no shuffle — min/max come from a 1-row
    broadcast agg)."""
    span = F.greatest(mx - mn + F.lit(1), F.lit(1))
    return F.floor(((col - mn) * F.lit(1 << bits)) / span).cast("long")


def write_layout(
    df: DataFrame,
    out_dir: str,
    dim_x: str,
    dim_y: str,
    layout: str = "zorder",
    files: int = SERVE_FILES,
) -> None:
    """Write ``df`` re-clustered for 2-D probes on integer-able columns
    ``dim_x``/``dim_y`` (timestamps are bucketed via epoch seconds).

    ``zorder``: Morton-interleave the bucketized dims, range-partition +
    sort on the key — every file covers a small (x, y) rectangle.
    ``linear``: range-partition + sort on ``dim_y`` alone (the natural
    time-clustered ingest order — the baseline a z-order must beat on
    x-filtered probes)."""
    if layout not in ("zorder", "linear"):
        raise ValueError(f"unknown layout: {layout}")

    if layout == "linear":
        out = df.repartitionByRange(files, F.col(dim_y)).sortWithinPartitions(dim_y)
        meta = {"layout": "linear", "dim_x": dim_x, "dim_y": dim_y}
    else:
        x, y = _as_long(df, dim_x), _as_long(df, dim_y)
        b = df.agg(
            F.min(x).alias("mnx"),
            F.max(x).alias("mxx"),
            F.min(y).alias("mny"),
            F.max(y).alias("mxy"),
        ).collect()[0]
        bounds = {k: int(b[k]) for k in ("mnx", "mxx", "mny", "mxy")}
        # zorder_key puts its SECOND argument in the higher bit of each
        # interleaved pair, so pass (y, x): with files = 2^(2k+1) the file
        # boundaries resolve dim_x one bit finer — the key dimension is
        # the one probes band on, time probes are already coarse. The zkey
        # column is KEPT in the files: its footer min/max per file is the
        # file's Morton range, which `merge_layout` uses to rewrite only
        # the files a delta actually lands in.
        out = (
            df.withColumn("zkey", _zkey_expr(x, y, bounds))
            .repartitionByRange(files, F.col("zkey"))
            .sortWithinPartitions("zkey")
        )
        meta = {
            "layout": "zorder",
            "dim_x": dim_x,
            "dim_y": dim_y,
            "bits": ZORDER_BITS,
            **bounds,
        }
    _stats_safe_write(df.sparkSession, out, out_dir, mode="overwrite")
    with open(os.path.join(out_dir, "_layout_meta.json"), "w") as fh:
        json.dump(meta, fh)


def _zkey_expr(x, y, bounds: dict):
    """Morton key from PLAN-TIME bound literals, clamped into the bucket
    grid — out-of-range values (a delta can exceed the base's min/max)
    land in the edge buckets, so their rectangles stay valid."""
    top = F.lit((1 << ZORDER_BITS) - 1)
    bx = F.least(
        F.greatest(_bucket(x, F.lit(bounds["mnx"]), F.lit(bounds["mxx"])), F.lit(0)),
        top,
    )
    by = F.least(
        F.greatest(_bucket(y, F.lit(bounds["mny"]), F.lit(bounds["mxy"])), F.lit(0)),
        top,
    )
    return zorder_key(by, bx, bits=ZORDER_BITS)


def _stats_safe_write(spark: SparkSession, out: DataFrame, out_dir: str, mode: str) -> None:
    """Parquet write with stats-bearing timestamps: Spark's default INT96
    encoding carries NO column statistics, which would make the time
    dimension unprunable. Scoped conf set + restore."""
    conf_key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "TIMESTAMP_MICROS")
    try:
        out.write.mode(mode).parquet(out_dir)
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)


def merge_layout(
    spark: SparkSession,
    serving_dir: str,
    delta: DataFrame,
    out_dir: str,
) -> dict:
    """INCREMENTAL z-order maintenance — the OPTIMIZE-clustering shape a
    100 TB serving layout needs: merging a delta must NOT rewrite the
    whole layout, only the files whose Morton range the delta actually
    lands in. Each serving file's z-range comes from its own zkey footer
    stats; delta rows are keyed with the SAME persisted bounds
    (`_layout_meta.json`), clamped at the grid edges; untouched files are
    carried into the new generation as-is (hard links when possible), and
    only (affected files ∪ delta) re-cluster through one range shuffle.

    Returns ``{"files_total", "files_rewritten", "rows_delta"}``. The new
    generation at ``out_dir`` serves identically to a full rebuild over
    base ∪ delta (content parity pinned in tests/test_layout_store.py)."""
    with open(os.path.join(serving_dir, "_layout_meta.json")) as fh:
        meta = json.load(fh)
    if meta.get("layout") != "zorder":
        raise ValueError("merge_layout requires a zorder serving layout")
    bounds = {k: meta[k] for k in ("mnx", "mxx", "mny", "mxy")}
    keyed = delta.withColumn(
        "zkey",
        _zkey_expr(
            _as_long(delta, meta["dim_x"]), _as_long(delta, meta["dim_y"]), bounds
        ),
    )
    # per-file Morton ranges from footers (tiny: one row per file)
    import pyarrow.parquet as pq

    ranges = []
    for dirpath, _, files in os.walk(serving_dir):
        for fname in files:
            if not fname.endswith(".parquet"):
                continue
            path = os.path.join(dirpath, fname)
            pf = pq.ParquetFile(path)
            i = pf.schema_arrow.names.index("zkey")
            zmin = zmax = None
            for rg in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(rg).column(i).statistics
                if st is None or not st.has_min_max:
                    continue
                zmin = st.min if zmin is None else min(zmin, st.min)
                zmax = st.max if zmax is None else max(zmax, st.max)
            if zmin is None:
                continue  # zero-row-group / stats-less part file: nothing lands here
            ranges.append((path, int(zmin), int(zmax)))
    # which files does the delta land in? (bounded: |files| rows broadcast)
    rng_df = spark.createDataFrame(ranges, "path string, zmin long, zmax long")
    hit = {
        r["path"]
        for r in keyed.join(
            F.broadcast(rng_df),
            (F.col("zkey") >= F.col("zmin")) & (F.col("zkey") <= F.col("zmax")),
        )
        .select("path")
        .distinct()
        .collect()
    }
    os.makedirs(out_dir, exist_ok=True)
    kept = 0
    for path, _, _ in ranges:
        if path in hit:
            continue
        dst = os.path.join(out_dir, "kept_" + os.path.basename(path))
        try:
            os.link(path, dst)
        except OSError:
            import shutil

            shutil.copy2(path, dst)
        kept += 1
    merged = keyed
    if hit:
        merged = spark.read.parquet(*sorted(hit)).unionByName(keyed)
    # one output file per rewritten file plus one for the delta's own mass
    n_files = len(hit) + 1
    out = merged.repartitionByRange(n_files, F.col("zkey")).sortWithinPartitions("zkey")
    _stats_safe_write(spark, out, out_dir, mode="append")
    with open(os.path.join(out_dir, "_layout_meta.json"), "w") as fh:
        json.dump(meta, fh)
    return {
        "files_total": len(ranges),
        "files_rewritten": len(hit),
        "rows_delta": keyed.count(),
    }


def custkey_band(
    spark: SparkSession, sf_dir: str, lo_pct: int = 45, hi_pct: int = 55
) -> tuple[int, int]:
    """Middle custkey band bounds as LITERALS (collected — only literal
    predicates reach PushedFilters). ONE definition for the registry
    probe, the bench layout tier, and the tests; the DuckDB oracle of
    `cdc_store_zorder_probe` necessarily carries its own SQL copy of the
    same integer arithmetic — keep them in lockstep."""
    from flink_dts_connector_spark.session import load_table

    b = (
        load_table(spark, sf_dir, "orders")
        .agg(
            F.expr(
                f"min(o_custkey) + (max(o_custkey) - min(o_custkey)) * {lo_pct} DIV 100"
            ).alias("lo"),
            F.expr(
                f"min(o_custkey) + (max(o_custkey) - min(o_custkey)) * {hi_pct} DIV 100"
            ).alias("hi"),
        )
        .collect()[0]
    )
    return int(b["lo"]), int(b["hi"])


def serve_store_zorder(
    spark: SparkSession,
    sf_dir: str,
    dim_x: str = "o_custkey",
    dim_y: str = "o_orderdate",
    layout: str = "zorder",
) -> str:
    """Serving copy of the orders changelog from the decode-once store,
    re-clustered per ``layout``. Cached per (session, sf_dir, layout) —
    the store build itself is shared with every other store-backed query
    via `ingest_once`'s cache."""
    key = (spark.sparkContext.applicationId, sf_dir, dim_x, dim_y, layout)
    cached = _SERVE_CACHE.get(key)
    if cached is not None:
        return cached
    from flink_dts_connector_spark.formats.ingest import read_store
    from flink_dts_connector_spark.formats.typed import project_table
    from flink_dts_connector_spark.sources.generator import DB, TBL
    from flink_dts_connector_spark.plans.cdc_queries import ORDERS_CDC_SCHEMA
    from flink_dts_connector_spark.streaming.runner import scratch_dir

    env = read_store(spark, sf_dir, table=TBL)
    chg = project_table(env, ORDERS_CDC_SCHEMA, table=f"{DB}.{TBL}")
    out = scratch_dir(f"fdcs_serve_{layout}_")
    write_layout(chg, out, dim_x, dim_y, layout=layout)
    _SERVE_CACHE[key] = out
    return out


def touched_row_groups(path: str, preds: dict[str, tuple]) -> tuple[int, int]:
    """(touched, total) row groups under ``path`` for a conjunctive range
    probe ``{col: (lo, hi)}``, judged on parquet footer min/max statistics
    only — the same decision the scan planner makes, measured without
    reading a single data page."""
    import pyarrow.parquet as pq

    touched = total = 0
    for dirpath, _, files in os.walk(path):
        for fname in files:
            if not fname.endswith(".parquet"):
                continue
            pf = pq.ParquetFile(os.path.join(dirpath, fname))
            names = pf.schema_arrow.names
            idx = {c: names.index(c) for c in preds}
            for rg in range(pf.metadata.num_row_groups):
                total += 1
                hit = True
                for col, (lo, hi) in preds.items():
                    st = pf.metadata.row_group(rg).column(idx[col]).statistics
                    if st is None or not st.has_min_max:
                        continue  # no stats -> cannot skip
                    mn, mx = st.min, st.max
                    # parquet timestamp stats come back UTC-aware; the
                    # engine runs in UTC, so compare naive-to-naive
                    if isinstance(mn, datetime.datetime) and mn.tzinfo is not None:
                        mn, mx = mn.replace(tzinfo=None), mx.replace(tzinfo=None)
                    if mx < lo or mn > hi:
                        hit = False
                        break
                if hit:
                    touched += 1
    return touched, total


def assert_pushed(df: DataFrame, cols: list[str]) -> None:
    """Assert every probe column's predicate reached the parquet scan's
    PushedFilters — without pushdown there is no row-group skipping and
    the z-order layout is dead weight."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    section = plan.split("PushedFilters:", 1)
    pushed = section[1].split("]", 1)[0] if len(section) > 1 else ""
    missing = [c for c in cols if c not in pushed]
    if missing:
        raise AssertionError(
            f"probe predicates not pushed to the scan ({missing}):\n{plan[:2000]}"
        )
