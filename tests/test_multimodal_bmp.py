"""Real BMP codec (operators/multimodal.py): byte-level format checks the
SQL oracle can't see — header layout, stride padding, and rejection of
non-BMP / unsupported variants."""

from __future__ import annotations

import struct

import pytest

from flink_dts_connector_spark.operators.multimodal import (
    attach_bmp_media,
    decode_bmp_features,
    encode_bmp,
)


def test_encode_bmp_is_valid_bmp():
    """Independent field-by-field check of the produced bytes against the
    BMP spec: magic, sizes, offset, 40-byte BITMAPINFOHEADER, BI_RGB,
    4-byte row stride."""
    w, h = 5, 3  # stride 16 = 15 bytes + 1 pad
    raw = encode_bmp(w, h, lambda x, y: (x, y, x + y))
    assert raw[:2] == b"BM"
    file_size = struct.unpack_from("<I", raw, 2)[0]
    offset = struct.unpack_from("<I", raw, 10)[0]
    assert file_size == len(raw) and offset == 54
    hdr, width, height = struct.unpack_from("<Iii", raw, 14)
    planes, bpp = struct.unpack_from("<HH", raw, 26)
    comp = struct.unpack_from("<I", raw, 30)[0]
    assert (hdr, width, height, planes, bpp, comp) == (40, w, h, 1, 24, 0)
    stride = (w * 3 + 3) & ~3
    assert len(raw) == offset + stride * h
    # bottom-up + BGR: the FIRST stored row is y = h-1; pixel (0, h-1) has
    # (r, g, b) = (0, h-1, h-1) stored as B,G,R
    assert raw[offset : offset + 3] == bytes((h - 1, h - 1, 0))


def test_decode_matches_pixel_formula(spark):
    ids = spark.range(20).withColumnRenamed("id", "doc_id")
    out = decode_bmp_features(attach_bmp_media(ids)).collect()
    assert len(out) == 20
    for r in out:
        i = r["doc_id"]
        w, h = 4 + i % 5, 3 + i % 4
        assert (r["width"], r["height"], r["n_pixels"]) == (w, h, w * h)
        exp_r = sum((i + 7 * x + 13 * y) % 256 for x in range(w) for y in range(h))
        exp_g = sum((2 * i + 3 * x + 5 * y) % 256 for x in range(w) for y in range(h))
        exp_b = sum((5 * i + x + 11 * y) % 256 for x in range(w) for y in range(h))
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == (exp_r, exp_g, exp_b)


def test_decode_rejects_non_bmp(spark):
    bad = spark.createDataFrame([(1, b"PNG\x00not-a-bmp" * 10)], "doc_id long, media binary")
    with pytest.raises(Exception, match="BMP"):
        decode_bmp_features(bad).collect()


def test_decode_rejects_unsupported_bpp(spark):
    raw = bytearray(encode_bmp(4, 4, lambda x, y: (0, 0, 0)))
    struct.pack_into("<H", raw, 28, 8)  # claim 8-bit palette
    bad = spark.createDataFrame([(1, bytes(raw))], "doc_id long, media binary")
    with pytest.raises(Exception, match="unsupported BMP"):
        decode_bmp_features(bad).collect()


def test_spread_gate_cheap_vs_heavy(spark):
    """r14 cheap-class spread gate: a µs-per-doc stage skips the
    round-robin exchange below CHEAP_SPREAD_MIN_ROWS_PER_CORE × cores and
    re-engages it past the threshold (same formula at every scale); heavy
    stages keep the unconditional single-row-group guard."""
    from flink_dts_connector_spark.operators.multimodal import (
        CHEAP_SPREAD_MIN_ROWS_PER_CORE,
        _spread,
    )

    cores = spark.sparkContext.defaultParallelism
    small = spark.range(100).coalesce(1)

    def n_exchanges(df):
        return df._jdf.queryExecution().executedPlan().toString().count("Exchange")

    # cheap + tiny rows metadata -> pass-through, no exchange
    assert n_exchanges(_spread(small, rows=100, heavy=False)) == 0
    # cheap + no metadata -> conservative pass-through
    assert n_exchanges(_spread(small, heavy=False)) == 0
    # cheap + rows past the per-core threshold -> the exchange re-engages
    big_rows = CHEAP_SPREAD_MIN_ROWS_PER_CORE * cores
    assert n_exchanges(_spread(small, rows=big_rows, heavy=False)) == 1
    # heavy (default) keeps the unconditional guard on an under-split frame
    assert n_exchanges(_spread(small)) == 1
    # an already-wide frame passes through even on the heavy path
    wide = spark.range(10_000).repartition(cores)
    assert _spread(wide).rdd.getNumPartitions() == cores


def test_attach_bmp_media_gated_output_identical(spark):
    """The gate changes partitioning only: attach+decode rows are identical
    with and without the spread exchange."""
    from flink_dts_connector_spark.operators.multimodal import (
        CHEAP_SPREAD_MIN_ROWS_PER_CORE,
    )

    docs = spark.range(64).withColumnRenamed("id", "doc_id")
    gated = decode_bmp_features(attach_bmp_media(docs, rows=64))
    spread = decode_bmp_features(
        attach_bmp_media(
            docs, rows=CHEAP_SPREAD_MIN_ROWS_PER_CORE * spark.sparkContext.defaultParallelism
        )
    )
    assert sorted(map(tuple, gated.collect())) == sorted(map(tuple, spread.collect()))
