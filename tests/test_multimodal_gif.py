"""Real GIF87a codec (operators/multimodal.py): byte-level format checks
the SQL oracle can't see — header/descriptor framing, sub-block
reassembly, and the from-scratch LZW layer (variable-width LSB-first
codes, CLEAR/END, width growth at 2^n, 4096-entry table reset)."""

from __future__ import annotations

import struct

import pytest

from flink_dts_connector_spark.operators.multimodal import (
    _gif_palette,
    _lzw_decode_gif,
    _lzw_encode_gif,
    attach_gif_media,
    decode_gif_features,
    decode_gif_indexes,
    encode_gif,
)


def _idx_fn(i):
    return lambda x, y: (3 * i + 5 * x + 17 * y) % 256


def test_encode_gif_is_valid_gif87a():
    """Structural check: signature, logical screen descriptor (global
    256-entry table flagged), palette bytes, image descriptor at (0,0)
    with matching dims, LZW min code size 8, sub-blocks terminated, 0x3B
    trailer last."""
    w, h = 7, 6
    raw = encode_gif(w, h, _idx_fn(5))
    assert raw[:6] == b"GIF87a"
    sw, sh, flags, bg, aspect = struct.unpack_from("<HHBBB", raw, 6)
    assert (sw, sh) == (w, h)
    assert flags & 0x80 and (2 << (flags & 7)) == 256
    pos = 13
    for i in range(256):
        assert tuple(raw[pos + 3 * i : pos + 3 * i + 3]) == _gif_palette(i)
    pos += 768
    assert raw[pos] == 0x2C
    left, top, iw, ih, iflags = struct.unpack_from("<HHHHB", raw, pos + 1)
    assert (left, top, iw, ih, iflags) == (0, 0, w, h, 0)
    assert raw[pos + 10] == 8  # LZW min code size
    assert raw[-1] == 0x3B and raw[-2] == 0x00


@pytest.mark.parametrize("i", [0, 1, 7, 42, 999])
def test_gif_roundtrip_pixel_exact(i):
    w, h = 5 + i % 4, 4 + i % 5
    raw = encode_gif(w, h, _idx_fn(i))
    dw, dh, idx, palette = decode_gif_indexes(raw)
    assert (dw, dh) == (w, h)
    want = bytes((3 * i + 5 * x + 17 * y) % 256 for y in range(h) for x in range(w))
    assert idx == want
    assert palette == [_gif_palette(k) for k in range(256)]


def test_lzw_width_growth_and_table_reset():
    """Cross the 512/1024/2048/4096 table boundaries: a high-entropy
    stream forces every width bump and at least one CLEAR/reset, and a
    constant stream exercises the run-compression path."""
    import random

    rng = random.Random(13)
    noisy = bytes(rng.randrange(256) for _ in range(25000))
    assert _lzw_decode_gif(_lzw_encode_gif(noisy), len(noisy)) == noisy
    flat = bytes([9]) * 40000
    enc = _lzw_encode_gif(flat)
    assert len(enc) < len(flat) // 20  # runs actually compress
    assert _lzw_decode_gif(enc, len(flat)) == flat


def test_gif_decoder_rejects_damage():
    raw = bytearray(encode_gif(6, 5, _idx_fn(2)))
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif_indexes(b"JUNK" + bytes(raw[4:]))
    # truncate mid sub-block stream
    with pytest.raises(ValueError):
        decode_gif_indexes(bytes(raw[: len(raw) - 8]))
    # corrupt a byte inside the LZW data (after palette + descriptor)
    broken = bytearray(raw)
    broken[13 + 768 + 12] ^= 0xFF
    with pytest.raises(ValueError):
        decode_gif_indexes(bytes(broken))


def test_gif_features_spark_roundtrip(spark, sf_dir):
    """End-to-end through Spark: attach payloads, decode features, pin a
    handful of rows against the closed-form pixel formula."""
    from flink_dts_connector_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    feats = {
        r["doc_id"]: r
        for r in decode_gif_features(attach_gif_media(docs)).collect()
    }
    for i, r in feats.items():
        w, h = 5 + i % 4, 4 + i % 5
        idx = [(3 * i + 5 * x + 17 * y) % 256 for y in range(h) for x in range(w)]
        assert (r["width"], r["height"], r["n_pixels"]) == (w, h, w * h)
        assert r["sum_r"] == sum(idx)
        assert r["sum_g"] == sum((2 * v) % 256 for v in idx)
        assert r["sum_b"] == sum((3 * v) % 256 for v in idx)


def test_gif89a_extension_blocks_skipped():
    """Real GIF89a files carry a Graphic Control Extension (0x21) before
    the image descriptor; the decoder must skip extension blocks instead
    of dying on 'expected image descriptor'."""
    raw = bytearray(encode_gif(6, 5, _idx_fn(4)))
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # introducer+label+4-byte block+term
    comment = b"\x21\xfe\x05hello\x00"
    insert_at = 13 + 768  # right after the global color table
    raw89 = b"GIF89a" + bytes(raw[6:insert_at]) + gce + comment + bytes(raw[insert_at:])
    w, h, idx, palette = decode_gif_indexes(raw89)
    assert (w, h) == (6, 5)
    assert idx == bytes((3 * 4 + 5 * x + 17 * y) % 256 for y in range(5) for x in range(6))
