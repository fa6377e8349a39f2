"""Real WAV codec (operators/multimodal.py): byte-level format checks the
SQL oracle can't see — RIFF chunk layout, int16 LE packing, and rejection
of non-WAV / unsupported variants."""

from __future__ import annotations

import struct

import pytest

from flink_dts_connector_spark.operators.multimodal import (
    WAV_SAMPLE_RATE,
    attach_wav_media,
    decode_wav_features,
    encode_wav,
    wav_fixture_samples,
)


def test_encode_wav_is_valid_riff():
    """Field-by-field check against the canonical 44-byte WAV header:
    RIFF size, WAVE tag, fmt chunk (PCM, mono, 16-bit, byte rate, block
    align), data chunk length, and little-endian int16 sample packing."""
    samples = [0, 100, -100, 32767, -32768]
    raw = encode_wav(samples, sample_rate=8000)
    assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
    assert struct.unpack_from("<I", raw, 4)[0] == len(raw) - 8
    assert raw[12:16] == b"fmt "
    fmt_size, fmt, ch, rate = struct.unpack_from("<IHHI", raw, 16)
    byte_rate, block_align, bits = struct.unpack_from("<IHH", raw, 28)
    assert (fmt_size, fmt, ch, rate) == (16, 1, 1, 8000)
    assert (byte_rate, block_align, bits) == (16000, 2, 16)
    assert raw[36:40] == b"data"
    assert struct.unpack_from("<I", raw, 40)[0] == 2 * len(samples)
    got = struct.unpack_from(f"<{len(samples)}h", raw, 44)
    assert list(got) == samples


def test_decode_matches_sample_formula(spark):
    ids = spark.range(25).withColumnRenamed("id", "doc_id")
    rows = {
        r["doc_id"]: r
        for r in decode_wav_features(attach_wav_media(ids)).collect()
    }
    assert len(rows) == 25
    for i in range(25):
        s = wav_fixture_samples(i)
        r = rows[i]
        assert r["n_samples"] == len(s)
        assert r["sample_rate"] == WAV_SAMPLE_RATE
        assert r["duration_ms"] == len(s) * 1000 // WAV_SAMPLE_RATE
        assert r["sum_abs"] == sum(abs(x) for x in s)
        assert r["energy"] == sum(x * x for x in s)
        assert r["peak"] == max(abs(x) for x in s)
        assert r["zero_crossings"] == sum(
            1 for a, b in zip(s, s[1:]) if a * b < 0
        )


def test_decode_rejects_malformed(spark):
    import pandas as pd

    from flink_dts_connector_spark.operators.multimodal import decode_wav_features

    good = encode_wav([1, -2, 3])
    stereo = bytearray(good)
    struct.pack_into("<H", stereo, 22, 2)  # channels = 2
    torn = good[:-1]  # odd data length vs declared
    cases = {
        "not riff": b"OggS" + good[4:],
        "stereo": bytes(stereo),
        "torn": torn,
    }
    for name, raw in cases.items():
        df = spark.createDataFrame([(1, bytearray(raw))], "doc_id long, media binary")
        with pytest.raises(Exception):
            decode_wav_features(df).collect()
