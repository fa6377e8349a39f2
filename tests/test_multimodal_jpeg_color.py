"""Color baseline JPEG codec (r12, `operators/multimodal.py`): genuine
YCbCr 4:2:0 SOF0 files — MCU interleave, per-component table routing,
three DC prediction chains, fixed-point color conversion — bit-exact
decode of the per-component two-coefficient fixture blocks, and loud
rejection of everything the 4:2:0 baseline contract excludes."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_dts_connector_spark.operators.multimodal import (
    _jpeg_color_block_params,
    decode_jpeg_color,
    encode_jpeg_color,
    jpeg_ycbcr_to_rgb_int,
)

_ids = st.integers(min_value=0, max_value=2**31 - 1)


def _fixture(doc_id: int) -> bytes:
    w, h = 16 * (1 + doc_id % 2), 16 * (1 + doc_id % 3)
    return encode_jpeg_color(
        w, h,
        lambda comp, bx, by: _jpeg_color_block_params(doc_id, comp, bx, by),
        restart_interval=2 if doc_id % 3 == 0 else 0,
    )


def test_encode_color_is_valid_baseline_stream():
    raw = _fixture(1)
    assert raw[:2] == b"\xff\xd8" and raw[-2:] == b"\xff\xd9"
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
    # two DQTs (luma all-1s, chroma all-2s), one SOF0, FOUR DHTs, SOS
    assert seen.count(0xDB) == 2 and seen.count(0xC0) == 1
    assert seen.count(0xC4) == 4 and seen[-1] == 0xDA
    sof = raw.index(b"\xff\xc0")
    assert raw[sof + 9] == 3  # 3 components
    assert raw[sof + 11] == 0x22  # Y sampled 2x2


@given(_ids)
@settings(max_examples=60, deadline=None)
def test_color_roundtrip_bit_exact(doc_id):
    w, h = 16 * (1 + doc_id % 2), 16 * (1 + doc_id % 3)
    y, cb, cr = decode_jpeg_color(_fixture(doc_id))
    assert y.shape == (h, w) and cb.shape == cr.shape == (h // 2, w // 2)
    s = np.array([1, -1, -1, 1, 1, -1, -1, 1])
    pat = np.outer(s, s)
    for comp, plane in ((0, y), (1, cb), (2, cr)):
        ph, pw = plane.shape
        want = np.zeros((ph, pw), dtype=np.int64)
        for by in range(ph // 8):
            for bx in range(pw // 8):
                c, k = _jpeg_color_block_params(doc_id, comp, bx, by)
                want[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = c + k * pat
        assert (plane.astype(np.int64) == want).all(), (doc_id, comp)
        assert want.min() >= 0 and want.max() <= 255  # clamp never fires


def test_chroma_table_routing_is_load_bearing():
    """Chroma coefficients are stored HALVED against the all-2s DQT slot 1;
    re-pointing Cb/Cr at the luma table (slot 0) must halve the decoded
    chroma plane — proof the decoder routes tables per component."""
    raw = bytearray(_fixture(2))
    sof = bytes(raw).index(b"\xff\xc0")
    # component spec triples start at sof+10: (id, samp, tq)
    assert raw[sof + 15] == 1 and raw[sof + 18] == 1  # Cb/Cr point at DQT 1
    _, cb_ok, _ = decode_jpeg_color(bytes(raw))
    raw[sof + 15] = 0
    raw[sof + 18] = 0
    _, cb_wrong, _ = decode_jpeg_color(bytes(raw))
    c, k = _jpeg_color_block_params(2, 1, 0, 0)
    assert int(cb_ok[0, 0]) == c + k
    # halving the stored coefficients halves the DC/AC excursion around the
    # 128 level shift: the wrong-table pixel lands at (c+k-128)/2 + 128
    # (rounded), strictly closer to 128 than the true value
    assert int(cb_wrong[0, 0]) != int(cb_ok[0, 0])
    assert abs(int(cb_wrong[0, 0]) - 128) < abs(int(cb_ok[0, 0]) - 128)
    assert abs(int(cb_wrong[0, 0]) - round((c + k - 128) / 2 + 128)) <= 1


def test_color_decoder_rejects_damage():
    raw = _fixture(4)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_color(b"\x00" + raw)
    sof = raw.index(b"\xff\xc0")
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg_color(raw[:sof] + b"\xff\xc2" + raw[sof + 2 :])
    body = bytearray(raw)
    body[sof + 9] = 1  # declare grayscale — color contract
    with pytest.raises(ValueError, match="3 components"):
        decode_jpeg_color(bytes(body))
    body = bytearray(raw)
    body[sof + 11] = 0x11  # Y sampling 1x1 — not 4:2:0
    with pytest.raises(ValueError, match="4:2:0"):
        decode_jpeg_color(bytes(body))
    with pytest.raises(ValueError, match="truncated|index"):
        decode_jpeg_color(raw[:2])


@given(_ids, st.data())
@settings(max_examples=80, deadline=None)
def test_color_corruption_never_silent_crash(doc_id, data):
    """Flip one byte anywhere: the decoder either raises ValueError (loud
    rejection) or returns planes of the contracted shapes — never another
    exception type."""
    raw = bytearray(_fixture(doc_id % 1000))
    pos = data.draw(st.integers(min_value=0, max_value=len(raw) - 1))
    bit = data.draw(st.integers(min_value=0, max_value=7))
    raw[pos] ^= 1 << bit
    try:
        y, cb, cr = decode_jpeg_color(bytes(raw))
    except (ValueError, IndexError, KeyError, struct.error):
        return  # loud, typed rejection of structural damage
    assert y.shape[0] % 16 == 0 and y.shape[1] % 16 == 0
    assert cb.shape == cr.shape == (y.shape[0] // 2, y.shape[1] // 2)


def test_restart_resets_all_three_predictors():
    """With DRI, pixels must equal the restart-free encoding of the same
    blocks — including chroma (a decoder resetting only the luma predictor
    diverges)."""
    fn = lambda comp, bx, by: _jpeg_color_block_params(9, comp, bx, by)  # noqa: E731
    a = decode_jpeg_color(encode_jpeg_color(32, 48, fn, restart_interval=2))
    b = decode_jpeg_color(encode_jpeg_color(32, 48, fn, restart_interval=0))
    for pa, pb in zip(a, b):
        assert (pa == pb).all()


def test_fixed_point_rgb_matches_float_law():
    """The 16.16 fixed-point transform tracks the JFIF float law within
    1 LSB everywhere (and is exactly reproducible in integer SQL)."""
    rng = np.random.RandomState(5)
    for _ in range(500):
        y, cb, cr = (int(v) for v in rng.randint(0, 256, 3))
        r, g, b = jpeg_ycbcr_to_rgb_int(y, cb, cr)
        rf = min(max(round(y + 1.402 * (cr - 128)), 0), 255)
        gf = min(max(round(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)), 0), 255)
        bf = min(max(round(y + 1.772 * (cb - 128)), 0), 255)
        assert abs(r - rf) <= 1 and abs(g - gf) <= 1 and abs(b - bf) <= 1


def test_color_features_spark_roundtrip(spark, sf_dir):
    """attach → decode over real documents: features equal the closed form
    the oracle uses."""
    from flink_dts_connector_spark.operators.multimodal import (
        attach_jpeg_color_media,
        decode_jpeg_color_features,
    )
    from flink_dts_connector_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").limit(30)
    got = {
        r["doc_id"]: r.asDict()
        for r in decode_jpeg_color_features(attach_jpeg_color_media(docs)).collect()
    }
    assert len(got) == 30
    for i, row in got.items():
        w, h = 16 * (1 + i % 2), 16 * (1 + i % 3)
        assert (row["width"], row["height"], row["n_pixels"]) == (w, h, w * h)
        yv = [
            _jpeg_color_block_params(i, 0, bx, by)
            for by in range(h // 8)
            for bx in range(w // 8)
        ]
        assert row["sum_y"] == 64 * sum(c for c, _ in yv)
        assert row["sum_block_origin_y"] == sum(c + k for c, k in yv)
        sr = sg = sb = 0
        for my in range(h // 16):
            for mx in range(w // 16):
                y0 = sum(_jpeg_color_block_params(i, 0, 2 * mx, 2 * my))
                cb0 = sum(_jpeg_color_block_params(i, 1, mx, my))
                cr0 = sum(_jpeg_color_block_params(i, 2, mx, my))
                r_, g_, b_ = jpeg_ycbcr_to_rgb_int(y0, cb0, cr0)
                sr, sg, sb = sr + r_, sg + g_, sb + b_
        assert (row["sum_r"], row["sum_g"], row["sum_b"]) == (sr, sg, sb)
