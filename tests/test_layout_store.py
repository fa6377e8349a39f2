"""Z-order serving layout of the decode-once store (formats/layout.py).

The layout_zorder_* studies measured Morton pruning on synthetic
rectangles; these tests measure it on the REAL store: the orders
changelog re-clustered by morton(o_custkey, o_orderdate) must let a
key-band probe skip most row groups on footer stats alone, while the
time-sorted baseline layout must read everything — and both layouts must
serve bit-identical probe results (layout is physical, never semantic).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from flink_dts_connector_spark.formats.layout import (
    assert_pushed,
    serve_store_zorder,
    touched_row_groups,
)


def _band(spark, sf_dir):
    from flink_dts_connector_spark.formats.layout import custkey_band

    return custkey_band(spark, sf_dir)


def _content(df):
    return sorted(
        (r["o_orderkey"], r["op"], r["record_id"]) for r in df.collect()
    )


def test_zorder_probe_content_is_layout_invariant(spark, sf_dir):
    """Same probe, three physical sources (zorder, linear, unclustered
    store scan) -> identical row multisets."""
    lo, hi = _band(spark, sf_dir)
    z = serve_store_zorder(spark, sf_dir, layout="zorder")
    lin = serve_store_zorder(spark, sf_dir, layout="linear")
    pz = spark.read.parquet(z).where(F.col("o_custkey").between(lo, hi))
    pl = spark.read.parquet(lin).where(F.col("o_custkey").between(lo, hi))
    assert_pushed(pz, ["o_custkey"])
    assert_pushed(pl, ["o_custkey"])
    rows = _content(pz)
    assert rows == _content(pl)
    assert len(rows) > 0


def test_zorder_skips_on_key_band_linear_does_not(spark, sf_dir):
    """The payoff: a middle-decile custkey band probe must SKIP most of
    the z-ordered serving files on min/max stats, while the time-sorted
    layout (no custkey clustering) touches ~everything."""
    lo, hi = _band(spark, sf_dir)
    z = serve_store_zorder(spark, sf_dir, layout="zorder")
    lin = serve_store_zorder(spark, sf_dir, layout="linear")
    tz, nz = touched_row_groups(z, {"o_custkey": (lo, hi)})
    tl, nl = touched_row_groups(lin, {"o_custkey": (lo, hi)})
    assert nz >= 16 and nl >= 16, f"layouts too coarse to measure ({nz}, {nl})"
    frac_z, frac_l = tz / nz, tl / nl
    # linear is time-sorted: custkey min/max per file spans the domain
    assert frac_l >= 0.9, f"baseline unexpectedly clustered: {tl}/{nl}"
    # morton: a 10% x-band intersects only the x-strips covering it
    assert frac_z <= 0.6, f"zorder did not skip: {tz}/{nz} vs linear {tl}/{nl}"
    assert frac_z < frac_l


def test_zorder_two_dim_box_prunes_on_both(spark, sf_dir):
    """2-D box (custkey band x one year; the fixture spans 1995-2001): the z-ordered layout must touch
    at most as many row groups as either single-dimension probe — the
    rectangle-per-file property composes across dimensions."""
    lo, hi = _band(spark, sf_dir)
    y0 = datetime.datetime(1997, 1, 1)
    y1 = datetime.datetime(1997, 12, 31, 23, 59, 59)
    z = serve_store_zorder(spark, sf_dir, layout="zorder")
    t_box, n = touched_row_groups(z, {"o_custkey": (lo, hi), "o_orderdate": (y0, y1)})
    t_x, _ = touched_row_groups(z, {"o_custkey": (lo, hi)})
    t_y, _ = touched_row_groups(z, {"o_orderdate": (y0, y1)})
    assert t_box <= min(t_x, t_y)
    assert t_box < n
    # and the probe itself still answers correctly through the layout
    probe = (
        spark.read.parquet(z)
        .where(F.col("o_custkey").between(lo, hi))
        .where(F.col("o_orderdate").between(F.lit(y0), F.lit(y1)))
    )
    assert_pushed(probe, ["o_custkey", "o_orderdate"])
    direct = (
        spark.read.parquet(serve_store_zorder(spark, sf_dir, layout="linear"))
        .where(F.col("o_custkey").between(lo, hi))
        .where(F.col("o_orderdate").between(F.lit(y0), F.lit(y1)))
    )
    assert _content(probe) == _content(direct)


def test_merge_layout_rewrites_only_landing_files(spark, sf_dir):
    """Incremental z-order maintenance: split the changelog into a base
    (everything outside the middle custkey band) and a localized delta
    (the band). Merging the delta must (a) serve content identical to a
    full rebuild over base ∪ delta, (b) rewrite only a strict subset of
    the serving files (the band lands in few Morton strips), and (c) keep
    the merged layout probe-prunable."""
    import tempfile

    from pyspark.sql import functions as F2

    from flink_dts_connector_spark.formats.ingest import read_store
    from flink_dts_connector_spark.formats.layout import (
        merge_layout,
        touched_row_groups,
        write_layout,
    )
    from flink_dts_connector_spark.formats.typed import project_table
    from flink_dts_connector_spark.plans.cdc_queries import ORDERS_CDC_SCHEMA
    from flink_dts_connector_spark.sources.generator import DB, TBL

    lo, hi = _band(spark, sf_dir)
    env = read_store(spark, sf_dir, table=TBL)
    chg = project_table(env, ORDERS_CDC_SCHEMA, table=f"{DB}.{TBL}")
    base = chg.where(~F2.col("o_custkey").between(lo, hi))
    delta = chg.where(F2.col("o_custkey").between(lo, hi))

    base_dir = tempfile.mkdtemp(prefix="fdcs_zmerge_base_")
    out_dir = tempfile.mkdtemp(prefix="fdcs_zmerge_out_") + "/g2"
    write_layout(base, base_dir, "o_custkey", "o_orderdate", layout="zorder")
    stats = merge_layout(spark, base_dir, delta, out_dir)
    assert stats["rows_delta"] == delta.count() > 0
    # localized delta -> strict subset of files rewritten
    assert 0 < stats["files_rewritten"] < stats["files_total"], stats

    merged_rows = _content(spark.read.parquet(out_dir))
    full_dir = tempfile.mkdtemp(prefix="fdcs_zmerge_full_")
    write_layout(chg, full_dir, "o_custkey", "o_orderdate", layout="zorder")
    assert merged_rows == _content(spark.read.parquet(full_dir))

    # merged generation still prunes a key-band probe on footer stats
    t_band, n_all = touched_row_groups(out_dir, {"o_custkey": (lo, hi)})
    assert t_band < n_all
