"""ID3v2.4 tier (r13, operators/multimodal.py): syncsafe frame sizes,
UTF-8 enforcement, footer mirror verification, and the §3.1 padding/
footer exclusivity — both directions. Value-law parity is the oracle's
job (sweep-gated)."""

from __future__ import annotations

import pytest

from flink_dts_connector_spark.operators.multimodal import (
    _syncsafe4,
    encode_mp3_tagged_v24,
    id3v24_features,
    id3v24_fixture_fields,
)

DOCS = list(range(120)) + [499, 999, 4999, 12345, 49999]


def test_roundtrip_and_exclusivity_law():
    feet = pads = 0
    for d in DOCS:
        t, a, tr, pad, foot = id3v24_fixture_fields(d)
        assert not (pad and foot)  # §3.1 baked into the law
        f = id3v24_features(encode_mp3_tagged_v24(d))
        assert (f[0], f[1], f[2]) == (t, a, tr)
        assert f[5] == int(foot) and f[6] == pad
        feet += f[5]
        pads += f[6] > 0
    assert feet > 40 and pads > 30  # both shapes live in the population


def _tamper(raw: bytes, off: int, val: int) -> bytes:
    b = bytearray(raw)
    b[off] = val
    return bytes(b)


def test_loud_rejections():
    d_foot = 3   # odd: footer, no padding
    d_pad = 2    # even: padding, no footer
    raw_f = encode_mp3_tagged_v24(d_foot)
    raw_p = encode_mp3_tagged_v24(d_pad)
    # v2.3 version byte must be rejected by this tier
    with pytest.raises(ValueError, match="only ID3v2.4"):
        id3v24_features(_tamper(raw_f, 3, 3))
    # unsynchronisation / extended header flags
    with pytest.raises(ValueError, match="unsynchronisation"):
        id3v24_features(_tamper(raw_f, 5, raw_f[5] | 0x80))
    with pytest.raises(ValueError, match="extended header"):
        id3v24_features(_tamper(raw_f, 5, raw_f[5] | 0x40))
    # non-syncsafe FRAME size: first frame's size starts at offset 14
    with pytest.raises(ValueError, match="non-syncsafe frame size"):
        id3v24_features(_tamper(raw_f, 14, 0x80))
    # non-UTF-8 encoding byte (frame body starts after the 10-byte frame
    # header at offset 20)
    with pytest.raises(ValueError, match="UTF-8"):
        id3v24_features(_tamper(raw_f, 20, 0))
    # padding inside a footered tag (overwrite the last frame's id byte
    # with 0 -> parser sees padding, but footer flag is set)
    title, artist, track, _, _ = id3v24_fixture_fields(d_foot)
    last_frame_off = 10 + (11 + len(title)) + (11 + len(artist))
    with pytest.raises(ValueError, match="mutually exclusive"):
        id3v24_features(_tamper(raw_f, last_frame_off, 0))
    # footer mirror break
    t, a, tr, pad, _ = id3v24_fixture_fields(d_foot)
    tag_end = 10 + (11 + len(t)) + (11 + len(a)) + (11 + len(tr))
    assert raw_f[tag_end : tag_end + 3] == b"3DI"
    with pytest.raises(ValueError, match="footer"):
        id3v24_features(_tamper(raw_f, tag_end + 1, ord("X")))
    # garbage inside padding
    t2, a2, tr2, pad2, _ = id3v24_fixture_fields(d_pad)
    assert pad2 > 0
    pad_off = 10 + (11 + len(t2)) + (11 + len(a2)) + (11 + len(tr2))
    with pytest.raises(ValueError, match="padding"):
        id3v24_features(
            raw_p[:pad_off + 1] + b"\x07" + raw_p[pad_off + 2:]
        )
    # truncation
    with pytest.raises(ValueError):
        id3v24_features(raw_p[: len(raw_p) - 5])


def test_syncsafe_helper():
    assert _syncsafe4(0) == b"\x00\x00\x00\x00"
    assert _syncsafe4(127) == b"\x00\x00\x00\x7f"
    assert _syncsafe4(128) == b"\x00\x00\x01\x00"
    assert _syncsafe4((1 << 28) - 1) == b"\x7f\x7f\x7f\x7f"
