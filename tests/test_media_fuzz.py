"""Property-based container-codec checks (hypothesis), driver-side via the
module-level parse functions — no Spark session needed:

- round-trip: parse(encode(doc_id)) equals the fixture closed form for
  arbitrary doc ids;
- robustness: corruption and truncation either raise ValueError (loud
  rejection) or yield an internally consistent parse — never a crash of
  another type, never a parse whose byte accounting disagrees with the
  buffer it read."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_dts_connector_spark.operators.multimodal import (
    MP3_BITRATE_KBPS,
    MP3_SAMPLE_RATES,
    MP4_FIXTURE_OVERHEAD,
    encode_mp3,
    encode_mp4,
    encode_mp4_chunked,
    mp3_fixture_params,
    mp3_frame_size,
    mp3_stream_features,
    mp4_container_features,
    mp4_demux_features,
    mp4_fixture_params,
    mp4_sample_fill,
    mp4_sample_size,
)

_ids = st.integers(min_value=0, max_value=2**31 - 1)


@given(_ids)
@settings(max_examples=150, deadline=None)
def test_mp3_roundtrip_closed_form(i):
    p = mp3_fixture_params(i)
    sizes = [
        mp3_frame_size(p["bitrate_idx"], p["sr_idx"], (i + k) % 2)
        for k in range(p["n_frames"])
    ]
    got = mp3_stream_features(encode_mp3(i))
    sr = MP3_SAMPLE_RATES[p["sr_idx"]]
    assert got == (
        p["n_frames"],
        sr,
        MP3_BITRATE_KBPS[p["bitrate_idx"]],
        p["n_frames"] * 1152,
        p["n_frames"] * 1152 * 1000 // sr,
        sum((i + k) % 2 for k in range(p["n_frames"])),
        sum(((i * 7 + k * 13) % 251) * (sizes[k] - 4) for k in range(p["n_frames"])),
        10 + p["id3_body"] + sum(sizes),
        10 + p["id3_body"],
    )


@given(_ids)
@settings(max_examples=150, deadline=None)
def test_mp4_roundtrip_closed_form(i):
    p = mp4_fixture_params(i)
    n, ts, delta = p["n_samples"], p["timescale"], p["delta"]
    sizes = [mp4_sample_size(i, k) for k in range(n)]
    got = mp4_container_features(encode_mp4(i))
    assert got == (
        17,
        5,
        1000,
        ts,
        n * delta,
        n * delta * 1000 // ts,
        n,
        sum(sizes),
        sum(mp4_sample_fill(i, k) * sizes[k] for k in range(n)),
        p["handler"].decode(),
        MP4_FIXTURE_OVERHEAD + 4 * n + sum(sizes),
    )


@given(_ids, st.data())
@settings(max_examples=150, deadline=None)
def test_mp3_corruption_never_silent(i, data):
    """Flip one byte anywhere: the walk either rejects loudly (ValueError)
    or still accounts for every byte it read (n_bytes == len(buf)). A
    payload-byte flip legitimately parses — only the checksum moves."""
    raw = bytearray(encode_mp3(i))
    pos = data.draw(st.integers(0, len(raw) - 1))
    bit = data.draw(st.integers(0, 7))
    raw[pos] ^= 1 << bit
    try:
        got = mp3_stream_features(bytes(raw))
    except ValueError:
        return
    assert got[7] == len(raw)
    assert got[0] >= 1 and got[1] in MP3_SAMPLE_RATES


@given(_ids, st.data())
@settings(max_examples=150, deadline=None)
def test_mp3_truncation_never_silent(i, data):
    """Cut the stream anywhere: either rejected, or the cut landed exactly
    on a frame boundary and the shorter stream parses with fewer frames."""
    raw = encode_mp3(i)
    cut = data.draw(st.integers(0, len(raw) - 1))
    try:
        got = mp3_stream_features(raw[:cut])
    except ValueError:
        return
    full = mp3_stream_features(raw)
    assert got[7] == cut and got[0] < full[0]


@given(_ids, st.data())
@settings(max_examples=150, deadline=None)
def test_mp4_truncation_always_rejected(i, data):
    """ISO-BMFF is length-prefixed with a required-box census: ANY strict
    truncation must raise (a cut at a top-level boundary loses mdat)."""
    raw = encode_mp4(i)
    cut = data.draw(st.integers(0, len(raw) - 1))
    with pytest.raises(ValueError):
        mp4_container_features(raw[:cut])


@given(_ids, st.data())
@settings(max_examples=150, deadline=None)
def test_mp4_corruption_never_silent(i, data):
    raw = bytearray(encode_mp4(i))
    pos = data.draw(st.integers(0, len(raw) - 1))
    bit = data.draw(st.integers(0, 7))
    raw[pos] ^= 1 << bit
    try:
        got = mp4_container_features(bytes(raw))
    except ValueError:
        return
    assert got[10] == len(raw)
    assert got[0] == 17 and got[6] >= 1


@given(_ids, st.data())
@settings(max_examples=150, deadline=None)
def test_mp4_demux_truncation_always_rejected(i, data):
    """Same length-prefix + required-box-census argument as the fixture
    walk, over the general demux parser and the chunked fixture
    (ADVICE r10: the demux path shipped without fuzz coverage)."""
    raw = encode_mp4_chunked(i)
    cut = data.draw(st.integers(0, len(raw) - 1))
    with pytest.raises(ValueError):
        mp4_demux_features(raw[:cut])


@given(_ids, st.data())
@settings(max_examples=150, deadline=None)
def test_mp4_demux_corruption_never_silent(i, data):
    """Flip one byte anywhere in the chunked fixture: the general demux
    either rejects loudly (ValueError, never struct.error) or the flip
    landed in the mdat payload and only the checksum moves — box census,
    chunk map, and byte accounting must all still agree with the clean
    parse."""
    clean = mp4_demux_features(encode_mp4_chunked(i))
    raw = bytearray(encode_mp4_chunked(i))
    pos = data.draw(st.integers(0, len(raw) - 1))
    bit = data.draw(st.integers(0, 7))
    raw[pos] ^= 1 << bit
    try:
        got = mp4_demux_features(bytes(raw))
    except ValueError:
        return
    assert got[9] == len(raw)
    assert got[:8] == clean[:8]
