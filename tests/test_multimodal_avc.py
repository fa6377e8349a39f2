"""AVC SPS/PPS header battery (operators/multimodal.py, r11): genuine
Exp-Golomb round-trips, REAL emulation-prevention escaping both ways, and
loud rejection of every malformation class a decoder guards against."""

from __future__ import annotations

import random

import pytest

from flink_dts_connector_spark.operators.multimodal import (
    _ebsp_escape,
    _ebsp_unescape,
    _MsbBitReader,
    _MsbBitWriter,
    _se_read,
    _se_write,
    _ue_read,
    _ue_write,
    avc_config_features,
    avc_fixture_params,
    encode_avc_config,
)


def test_exp_golomb_roundtrip():
    w = _MsbBitWriter()
    vals_ue = [0, 1, 2, 3, 7, 8, 100, 2**16]
    vals_se = [0, 1, -1, 2, -2, 63, -64]
    for v in vals_ue:
        _ue_write(w, v)
    for v in vals_se:
        _se_write(w, v)
    w.put(1, 1)
    r = _MsbBitReader(w.flush())
    assert [_ue_read(r) for _ in vals_ue] == vals_ue
    assert [_se_read(r) for _ in vals_se] == vals_se


def test_emulation_escape_roundtrip_property():
    """Any byte string survives escape→unescape bit-exactly, and the
    escaped form never contains an unescaped start-code prefix."""
    rng = random.Random(7)
    for trial in range(200):
        n = rng.randrange(0, 40)
        # bias toward zeros so 00 00 0x runs actually occur
        raw = bytes(rng.choice((0, 0, 0, 1, 2, 3, 0xFF)) for _ in range(n))
        esc = _ebsp_escape(raw)
        for i in range(len(esc) - 2):
            assert not (esc[i] == 0 and esc[i + 1] == 0 and esc[i + 2] <= 2), (
                trial, raw.hex(), esc.hex())
        back, n_esc = _ebsp_unescape(esc)
        assert back == raw
        assert n_esc == len(esc) - len(raw)


def test_unescaped_start_code_rejected():
    with pytest.raises(ValueError, match="unescaped start-code"):
        _ebsp_unescape(b"\x12\x00\x00\x01\x44")


def test_trailing_emulation_byte_rejected():
    """A 03 after 00 00 as the LAST byte of the NAL escapes nothing (§7.4.1
    requires a following 00-03); silently consuming it would yield an RBSP
    ending in the forbidden 00 00 run (r11 ADVICE)."""
    with pytest.raises(ValueError, match="trailing emulation byte"):
        _ebsp_unescape(b"\x12\x00\x00\x03")


def test_roundtrip_matches_fixture_law():
    for d in (0, 1, 2, 3, 4, 5, 11, 42, 1234, 10**6):
        p = avc_fixture_params(d)
        got = avc_config_features(encode_avc_config(d))
        assert got[:8] == (
            p["profile_idc"], p["level_idc"], (p["w_mbs"] + 1) * 16,
            (p["h_mbs"] + 1) * 16, p["refs"], p["poc_type"], p["cabac"],
            26 + p["qp_off"],
        )


def _flip(raw: bytes, pos: int, bit: int) -> bytes:
    b = bytearray(raw)
    b[pos] ^= 1 << bit
    return bytes(b)


def test_rejections():
    raw = encode_avc_config(5)
    # forbidden_zero_bit on the SPS NAL header (byte 4)
    with pytest.raises(ValueError, match="forbidden_zero_bit"):
        avc_config_features(_flip(raw, 4, 7))
    # NAL type corrupted (SPS 7 -> 6)
    with pytest.raises(ValueError, match="expected NAL type 7"):
        avc_config_features(_flip(raw, 4, 0))
    # nal_ref_idc forced to 0
    b = bytearray(raw); b[4] &= 0x1F
    with pytest.raises(ValueError, match="reference NALs"):
        avc_config_features(bytes(b))
    # missing start code
    with pytest.raises(ValueError, match="start code"):
        avc_config_features(raw[1:])
    # single NAL only
    second = raw.find(b"\x00\x00\x00\x01", 4)
    with pytest.raises(ValueError, match="second NAL"):
        avc_config_features(raw[:second])


def test_pps_sps_reference_mismatch_rejected():
    """Splice doc 5's SPS (sps_id=5) with doc 6's PPS (sps_id=6): the
    cross-check every decoder applies must fire."""
    sc = b"\x00\x00\x00\x01"
    a, b = encode_avc_config(5), encode_avc_config(6)
    sps_a = a[: a.find(sc, 4)]
    pps_b = b[b.find(sc, 4):]
    with pytest.raises(ValueError, match="PPS references SPS"):
        avc_config_features(sps_a + pps_b)


def test_truncation_always_rejected():
    raw = encode_avc_config(9)
    for cut in (2, 4, 5, 8, len(raw) // 2, len(raw) - 1):
        with pytest.raises(ValueError):
            avc_config_features(raw[:cut])


def test_corruption_never_silent():
    """Flip one bit at every byte position: either ValueError or a parse
    whose byte accounting still covers the buffer (a value-field flip —
    geometry/QP move, structure stays coherent)."""
    raw = encode_avc_config(3)
    clean = avc_config_features(raw)
    for pos in range(len(raw)):
        for bit in (0, 4, 7):
            try:
                got = avc_config_features(_flip(raw, pos, bit))
            except ValueError:
                continue
            assert got[11] == len(raw) and got[8] + got[9] > 0
    assert clean[11] == len(raw)
