"""Baseline JPEG codec (r10, `operators/multimodal.py`): genuine SOF0
grayscale files, bit-exact decode of the two-coefficient fixture blocks,
and loud rejection of everything the baseline-grayscale contract excludes."""

import struct

import numpy as np
import pytest

from flink_dts_connector_spark.operators.multimodal import (
    _jpeg_block_params,
    _JPEG_ZZ,
    decode_jpeg_gray,
    encode_jpeg_gray,
)


def test_encode_jpeg_is_valid_baseline_stream():
    raw = encode_jpeg_gray(16, 8, lambda bx, by: (100 + bx, 3))
    assert raw[:2] == b"\xff\xd8" and raw[-2:] == b"\xff\xd9"
    # marker inventory: DQT, SOF0, two DHTs, SOS — each with valid lengths
    seen = []
    i = 2
    while i < len(raw) - 2:
        assert raw[i] == 0xFF
        m = raw[i + 1]
        seen.append(m)
        ln = struct.unpack(">H", raw[i + 2 : i + 4])[0]
        if m == 0xDA:
            break
        i += 2 + ln
    assert seen.count(0xDB) == 1 and seen.count(0xC0) == 1
    assert seen.count(0xC4) == 2 and seen[-1] == 0xDA


def test_zigzag_is_the_standard_order():
    # spot-pin against the published sequence's head and the AC target
    assert _JPEG_ZZ[:6] == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2)]
    assert _JPEG_ZZ.index((4, 4)) == 39
    assert sorted(_JPEG_ZZ) == [(r, c) for r in range(8) for c in range(8)]


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 4, 5, 17, 255, 1000003])
def test_jpeg_roundtrip_bit_exact(doc_id):
    w, h = 8 * (1 + doc_id % 3), 8 * (1 + doc_id % 2)
    raw = encode_jpeg_gray(w, h, lambda bx, by: _jpeg_block_params(doc_id, bx, by))
    img = decode_jpeg_gray(raw)
    s = np.array([1, -1, -1, 1, 1, -1, -1, 1])
    want = np.zeros((h, w), dtype=np.int64)
    for by in range(h // 8):
        for bx in range(w // 8):
            c, k = _jpeg_block_params(doc_id, bx, by)
            want[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = c + k * np.outer(s, s)
    assert (img.astype(np.int64) == want).all()
    assert want.min() >= 0 and want.max() <= 255  # clamping never fires


def test_jpeg_decoder_rejects_damage():
    raw = encode_jpeg_gray(8, 8, lambda bx, by: (77, -5))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_gray(b"\x00" + raw)
    # flip SOF0 into SOF2 (progressive) — must be rejected, not mis-decoded
    sof = raw.index(b"\xff\xc0")
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg_gray(raw[:sof] + b"\xff\xc2" + raw[sof + 2 :])
    # declare 3 components — grayscale contract
    body = bytearray(raw)
    body[sof + 9] = 3
    with pytest.raises(ValueError, match="grayscale"):
        decode_jpeg_gray(bytes(body))
    with pytest.raises(ValueError, match="truncated|index"):
        decode_jpeg_gray(raw[:2])


def test_jpeg_bit_reader_destuffs():
    """A stuffed 0xFF 0x00 inside entropy data reads back as 0xFF bits;
    a bare marker raises."""
    from flink_dts_connector_spark.operators.multimodal import _JpegBitReader

    r = _JpegBitReader(bytes([0xFF, 0x00, 0b10100000]))
    assert r.bits(8) == 0xFF
    assert r.bits(3) == 0b101
    r2 = _JpegBitReader(bytes([0xFF, 0xD9]))
    with pytest.raises(ValueError, match="marker"):
        r2.bits(1)


def test_jpeg_features_spark_roundtrip(spark, sf_dir):
    """attach → decode over real documents: features equal the closed form
    the oracle uses (n_pixels from dims, sum_luma = 64*Σc, origin = Σ(c+k))."""
    from flink_dts_connector_spark.operators.multimodal import (
        attach_jpeg_media,
        decode_jpeg_features,
    )
    from flink_dts_connector_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").limit(40)
    got = {
        r["doc_id"]: r.asDict()
        for r in decode_jpeg_features(attach_jpeg_media(docs)).collect()
    }
    assert len(got) == 40
    for i, row in got.items():
        w, h = 8 * (1 + i % 3), 8 * (1 + i % 2)
        cs = [
            _jpeg_block_params(i, bx, by)
            for by in range(h // 8)
            for bx in range(w // 8)
        ]
        assert row["width"] == w and row["height"] == h
        assert row["n_pixels"] == w * h
        assert row["sum_luma"] == 64 * sum(c for c, _ in cs)
        assert row["sum_block_origin"] == sum(c + k for c, k in cs)


@pytest.mark.parametrize("doc_id", [1, 2, 5, 7, 11])  # all multi-MCU dims
def test_jpeg_restart_markers_roundtrip(doc_id):
    """DRI/RST path: restart intervals flush+byte-align, reset DC
    prediction, and cycle marker indices mod 8 — pixels identical to the
    restart-free encoding of the same blocks."""
    w, h = 8 * (1 + doc_id % 3), 8 * (1 + doc_id % 2)
    bf = lambda bx, by: _jpeg_block_params(doc_id, bx, by)  # noqa: E731
    plain = decode_jpeg_gray(encode_jpeg_gray(w, h, bf))
    with_rst = encode_jpeg_gray(w, h, bf, restart_interval=1)
    assert b"\xff\xdd" in with_rst and b"\xff\xd0" in with_rst
    assert (decode_jpeg_gray(with_rst) == plain).all()


def test_jpeg_rst_out_of_sequence_rejected():
    raw = encode_jpeg_gray(32, 16, lambda bx, by: (100 + bx, 2), restart_interval=1)
    # find the first RST0 marker in the entropy stream and bump its index
    sos = raw.index(b"\xff\xda")
    k = raw.index(b"\xff\xd0", sos)
    broken = raw[:k] + b"\xff\xd3" + raw[k + 2 :]
    with pytest.raises(ValueError, match="out of sequence|RST"):
        decode_jpeg_gray(broken)
