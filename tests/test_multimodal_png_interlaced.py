"""PNG Adam7 interlace tier (r13, operators/multimodal.py): the 7-pass
sub-image reconstruction, empty-pass byte discipline, exact stream
consumption, pass-map correctness against the published pattern, and
equality with the flat tier's sums on the shared pixel law."""

from __future__ import annotations

import struct
import zlib

import pytest

from flink_dts_connector_spark.operators.multimodal import (
    PNG_ADAM7_PASSES,
    decode_png_interlaced,
    decode_png_rgb,
    encode_png,
    encode_png_interlaced,
    png_adam7_pass,
    png_interlaced_features,
)

DOCS = list(range(120)) + [499, 999, 4999, 12345, 49999]


def _law(d):
    return lambda x, y: (
        (3 * d + 5 * x + 17 * y) % 256,
        (7 * d + 11 * x + 2 * y) % 256,
        (d + 13 * x + 3 * y) % 256,
    )


def test_pass_map_matches_published_pattern():
    grid = [
        [1, 6, 4, 6, 2, 6, 4, 6], [7] * 8, [5, 6, 5, 6, 5, 6, 5, 6],
        [7] * 8, [3, 6, 4, 6, 3, 6, 4, 6], [7] * 8,
        [5, 6, 5, 6, 5, 6, 5, 6], [7] * 8,
    ]
    for y in range(16):
        for x in range(16):
            assert png_adam7_pass(x, y) == grid[y % 8][x % 8]


def test_deinterlaced_pixels_equal_flat_tier():
    """The same pixel law encoded flat and interlaced must decode to the
    identical image — filters within passes, de-interlace mapping, and
    empty-pass handling all verified in one equality."""
    for d in DOCS:
        w, h = 4 + d % 5, 5 + d % 4
        fn = _law(d)
        _, _, pix = decode_png_interlaced(encode_png_interlaced(w, h, fn))
        flat = decode_png_rgb(encode_png(w, h, fn))
        for y in range(h):
            for x in range(w):
                assert pix[y][x] == tuple(int(v) for v in flat[y, x]), (d, x, y)


def test_empty_passes_emit_no_bytes():
    """At width 4 pass 2 (x0=4) is empty — its sub-image must contribute
    zero bytes, and a 1×1 image uses only pass 1."""
    raw = encode_png_interlaced(1, 1, lambda x, y: (9, 9, 9))
    w, h, pix = decode_png_interlaced(raw)
    assert (w, h) == (1, 1) and pix[0][0] == (9, 9, 9)
    # stream for 1x1 = exactly one filter byte + 3 channel bytes
    f = png_interlaced_features(raw)
    assert f[2] == 1  # n_passes


def test_every_filter_type_appears():
    seen = set()
    for d in DOCS[:40]:
        w, h = 4 + d % 5, 5 + d % 4
        raw = encode_png_interlaced(w, h, _law(d))
        # walk chunks to the IDAT, inflate, read filter bytes per pass
        pos = 8
        idat = bytearray()
        while pos < len(raw):
            (ln,) = struct.unpack_from(">I", raw, pos)
            tag = raw[pos + 4 : pos + 8]
            if tag == b"IDAT":
                idat += raw[pos + 8 : pos + 8 + ln]
            pos += 12 + ln
        stream = zlib.decompress(bytes(idat))
        off = 0
        for p, (x0, y0, dx, dy) in enumerate(PNG_ADAM7_PASSES):
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            for j in range(ph):
                seen.add(stream[off])
                off += 1 + pw * 3
    assert seen == {0, 1, 2, 3, 4}


def test_loud_rejections():
    d = 7
    w, h = 4 + d % 5, 5 + d % 4
    raw = encode_png_interlaced(w, h, _law(d))
    # CRC tamper
    b = bytearray(raw)
    b[-5] ^= 0xFF  # IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png_interlaced(bytes(b))
    # flat (non-interlaced) payload must be rejected by this tier
    with pytest.raises(ValueError, match="Adam7"):
        decode_png_interlaced(encode_png(w, h, _law(d)))
    # truncated stream
    with pytest.raises(ValueError):
        decode_png_interlaced(raw[: len(raw) - 6])
    # stream-length discipline: append a spurious byte inside the IDAT
    pos = 8
    while raw[pos + 4 : pos + 8] != b"IDAT":
        (ln,) = struct.unpack_from(">I", raw, pos)
        pos += 12 + ln
    (ln,) = struct.unpack_from(">I", raw, pos)
    body = raw[pos + 8 : pos + 8 + ln]
    stream = zlib.decompress(body)
    bad_body = zlib.compress(stream + b"\x00", 9)
    bad = (
        raw[:pos]
        + struct.pack(">I", len(bad_body))
        + b"IDAT"
        + bad_body
        + struct.pack(">I", zlib.crc32(b"IDAT" + bad_body) & 0xFFFFFFFF)
        + raw[pos + 12 + ln :]
    )
    with pytest.raises(ValueError, match="longer than the pass plan"):
        decode_png_interlaced(bad)
