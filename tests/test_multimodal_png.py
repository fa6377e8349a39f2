"""Real PNG codec (operators/multimodal.py): byte-level format checks the
SQL oracle can't see — signature + chunk framing, CRC-32 verification,
zlib inflate round-trip, and correct reconstruction through ALL FIVE
scanline filter types (None/Sub/Up/Average/Paeth)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from flink_dts_connector_spark.operators.multimodal import (
    attach_png_media,
    decode_png_features,
    decode_png_rgb,
    encode_png,
)


def _pixel_fn(i):
    return lambda x, y: (
        (3 * i + 5 * x + 17 * y) % 256,
        (7 * i + 11 * x + 2 * y) % 256,
        (i + 13 * x + 3 * y) % 256,
    )


def test_encode_png_is_valid_png():
    """Chunk-by-chunk structural check: signature, IHDR fields (8-bit RGB,
    no interlace), a deflate-valid IDAT whose scanline filter bytes cycle
    0..4, valid CRC on every chunk, IEND terminator."""
    w, h = 6, 7
    raw = encode_png(w, h, _pixel_fn(3))
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    pos, tags = 8, []
    while pos + 12 <= len(raw):
        (ln,) = struct.unpack_from(">I", raw, pos)
        tag = raw[pos + 4 : pos + 8]
        body = raw[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", raw, pos + 8 + ln)
        assert zlib.crc32(tag + body) & 0xFFFFFFFF == crc, tag
        tags.append(tag)
        if tag == b"IHDR":
            assert struct.unpack(">IIBBBBB", body) == (w, h, 8, 2, 0, 0, 0)
        if tag == b"IDAT":
            stream = zlib.decompress(body)
            assert len(stream) == (w * 3 + 1) * h
            filters = [stream[y * (w * 3 + 1)] for y in range(h)]
            assert filters == [y % 5 for y in range(h)]
        pos += 12 + ln
    assert tags == [b"IHDR", b"IDAT", b"IEND"]


def test_roundtrip_exercises_all_filters():
    """decode(encode(px)) == px for shapes tall enough that every filter
    type (incl. Paeth on row 4) contributes, across several pixel fields
    and widths (width 1 exercises the left=0 edge in Sub/Average/Paeth)."""
    for i in (0, 1, 9, 42):
        for w, h in ((1, 6), (4, 5), (8, 11)):
            fn = _pixel_fn(i)
            rgb = decode_png_rgb(encode_png(w, h, fn))
            expect = np.array(
                [[fn(x, y) for x in range(w)] for y in range(h)], dtype=np.uint8
            )
            assert rgb.shape == (h, w, 3)
            assert (rgb == expect).all()


def test_decode_matches_pixel_formula(spark):
    ids = spark.range(20).withColumnRenamed("id", "doc_id")
    rows = {
        r["doc_id"]: r
        for r in decode_png_features(attach_png_media(ids)).collect()
    }
    assert len(rows) == 20
    for i in range(20):
        w, h = 4 + i % 5, 5 + i % 4
        fn = _pixel_fn(i)
        px = [fn(x, y) for x in range(w) for y in range(h)]
        r = rows[i]
        assert (r["width"], r["height"], r["n_pixels"]) == (w, h, w * h)
        assert r["sum_r"] == sum(p[0] for p in px)
        assert r["sum_g"] == sum(p[1] for p in px)
        assert r["sum_b"] == sum(p[2] for p in px)


def test_decode_rejects_malformed():
    good = encode_png(4, 5, _pixel_fn(1))

    with pytest.raises(ValueError, match="not a PNG"):
        decode_png_rgb(b"GIF89a" + good[6:])

    corrupt = bytearray(good)
    corrupt[40] ^= 0xFF  # flip a byte inside IDAT without fixing its CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png_rgb(bytes(corrupt))

    # 16-bit depth is a disclosed unsupported variant: patch IHDR + its CRC
    deep = bytearray(good)
    deep[24] = 16
    body = bytes(deep[16:29])
    struct.pack_into(">I", deep, 29, zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="unsupported"):
        decode_png_rgb(bytes(deep))


def test_roundtrip_property_random_pixels():
    """Hypothesis sweep: decode(encode(px)) == px for arbitrary pixel
    fields and dimensions — including w=1 (no left neighbor anywhere) and
    h≥5 (every filter type appears). Catches de-filter arithmetic errors
    (e.g. Average's floor vs round, Paeth tie order) that a fixed formula
    might never hit."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=9),
        h=st.integers(min_value=5, max_value=11),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(w, h, seed):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        rgb = decode_png_rgb(encode_png(w, h, lambda x, y: tuple(int(v) for v in px[y, x])))
        assert (rgb == px).all()

    check()
