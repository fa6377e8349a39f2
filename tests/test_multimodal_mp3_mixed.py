"""MP3 mixed-channel spectrum tier (r13, operators/multimodal.py):
mono docs must reproduce the mono spectrum tier bit-for-bit, stereo docs
exercise the (granule, channel) walk with per-channel scfsi, and the
channel dimension is pinned by sum_abs_ch1 plus flip batteries. Also
guards the generalization itself: the shared laws/walk gained c-terms
that MUST vanish at c = 0."""

from __future__ import annotations

import pytest

from flink_dts_connector_spark.operators.multimodal import (
    encode_mp3_spectrum,
    encode_mp3_spectrum_mixed,
    mp3_sf_law,
    mp3_sideinfo_params,
    mp3_spectrum_features,
    mp3_spectrum_law,
    mp3_spectrum_mixed_features,
)

DOCS = list(range(160)) + [499, 999, 4999, 12345, 49999]


def test_mono_docs_bit_identical_to_mono_tier():
    """Even docs (channels = 1): the mixed encoder's payload and every
    shared feature must equal the mono spectrum tier's — the c-term
    generalization is invisible at c = 0."""
    for d in [x for x in DOCS if x % 2 == 0]:
        raw = encode_mp3_spectrum_mixed(d)
        assert raw == encode_mp3_spectrum(d), d
        f = mp3_spectrum_mixed_features(raw)
        spec = mp3_spectrum_features(raw)
        assert f[1] == 1 and f[10] == 0, d
        assert (f[0],) + f[2:10] == spec[:9], d
        assert f[11] == spec[9], d


def test_stereo_docs_roundtrip_and_channel_mass():
    """Odd docs (channels = 2): 4 granule-channel structs decode with
    exact part2+part3 accounting, and channel 1 carries live mass in the
    population (sum_abs_ch1 > 0 whenever total mass exists)."""
    live = 0
    for d in [x for x in DOCS if x % 2 == 1]:
        f = mp3_spectrum_mixed_features(encode_mp3_spectrum_mixed(d))
        assert f[0] == mp3_sideinfo_params(d)["n_frames"], d
        assert f[1] == 2, d
        assert 0 <= f[10] <= f[5], d
        live += f[10] > 0
    assert live > 60


def test_stereo_caps_fit_every_frame():
    """The stereo-tightened caps (7 pairs / 5 quads) really bound the
    coded size: the encoder's frame-fit assert must hold across the sf1
    doc_id range (it raises AssertionError on overflow)."""
    for d in [1, 3, 5, 7, 9, 99, 999, 9999, 49999]:
        law = mp3_spectrum_law(d, 0, 0, c=1, channels=2)
        assert law["bvs"] <= 7 and law["n1"] <= 5
        encode_mp3_spectrum_mixed(d)  # must not raise


def test_channel_laws_differ():
    """The c-terms must actually separate the channels — identical
    channel laws would let a channel-swap bug pass silently."""
    differs = 0
    for d in [x for x in DOCS[:60] if x % 2 == 1]:
        for k in range(2):
            for g in range(2):
                l0 = mp3_spectrum_law(d, k, g, 0, 2)
                l1 = mp3_spectrum_law(d, k, g, 1, 2)
                differs += l0 != l1
    assert differs > 50


def test_scfsi_is_per_channel():
    """mp3_sf_law's scfsi law carries the 7·c term, so the two channels'
    reuse masks differ in the population — the walk must resolve against
    the OWNING channel's field (a summed/global scfsi misparses)."""
    differs = 0
    for d in [x for x in range(200) if x % 2 == 1]:
        for k in range(mp3_sideinfo_params(d)["n_frames"]):
            a = mp3_sf_law(d, k, 0, 0)
            b = mp3_sf_law(d, k, 0, 1)
            if a["wsf"] == 0 and b["wsf"] == 0 and a["scfsi"] != b["scfsi"]:
                differs += 1
    assert differs > 30


def _tamper(raw: bytes, off: int, xor: int) -> bytes:
    b = bytearray(raw)
    b[off] ^= xor
    return bytes(b)


def test_loud_rejections():
    d = 11  # stereo doc
    raw = encode_mp3_spectrum_mixed(d)
    # joint-stereo mode bits (01): flip mode from 00 to 01
    with pytest.raises(ValueError, match="joint-stereo"):
        mp3_spectrum_mixed_features(_tamper(raw, 3, 0x40))
    # reservoir bit
    with pytest.raises(ValueError, match="reservoir"):
        mp3_spectrum_mixed_features(_tamper(raw, 4, 0x80))
    # truncation
    with pytest.raises(ValueError):
        mp3_spectrum_mixed_features(raw[: len(raw) - 9])
    # mid-stream channel-mode switch: flip frame 1's mode to mono
    p = mp3_sideinfo_params(d)
    size0 = 144 * (96, 112, 128, 160, 192)[d % 5] * 1000 // (44100, 48000, 32000)[d % 3] + d % 2
    with pytest.raises(ValueError, match="mode switch|torn|sync|mono"):
        mp3_spectrum_mixed_features(_tamper(raw, size0 + 3, 0xC0))


def test_stereo_payload_flip_battery():
    """Flipping bits in a stereo frame's main data must change the
    features (checksum or channel mass) or raise — the walk really
    covers both channels' coded regions."""
    from flink_dts_connector_spark.operators.multimodal import (
        _mp3_spec_granule_bits,
        _scfsi_group,
        mp3_sf_bands,
    )

    d = 13
    raw = encode_mp3_spectrum_mixed(d)
    want = mp3_spectrum_mixed_features(raw)
    # frame 0's CODED main-data length from the law (the rest is filler
    # the decoder legitimately ignores)
    coded_bits = 0
    for g in range(2):
        for c in range(2):
            law = mp3_spectrum_law(d, 0, g, c, 2)
            law = dict(law, slen1=law["slen1"], slen2=law["slen2"])
            bands = mp3_sf_bands(law)
            if g == 1 and law["scfsi"]:
                bands = [
                    b for b in bands
                    if not (law["scfsi"] >> (3 - _scfsi_group(b[1]))) & 1
                ]
            coded_bits += sum(b[3] for b in bands)
            coded_bits += sum(
                nb for _, nb in _mp3_spec_granule_bits(d, 0, g, c, 2)
            )
    hi = 36 + (coded_bits + 7) // 8
    changed = total = 0
    for off in range(36, hi):
        for xor in (0x01, 0x80):
            total += 1
            try:
                got = mp3_spectrum_mixed_features(_tamper(raw, off, xor))
            except ValueError:
                changed += 1
                continue
            if got != want:
                changed += 1
    assert changed > total * 0.5, f"{changed}/{total} stereo flips caught"
