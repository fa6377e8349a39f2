"""Frame-level MP3 container codec (operators/multimodal.py): byte-level
format checks the SQL oracle can't see — ID3v2 syncsafe size, header bit
packing against ISO/IEC 11172-3 tables, the frame-length law, and loud
rejection of torn/VBR/free-format/CRC'd/wrong-version streams. The audio
payload is disclosed filler: these tests pin the CONTAINER walk only."""

from __future__ import annotations

import pytest

from flink_dts_connector_spark.operators.multimodal import (
    MP3_BITRATE_KBPS,
    MP3_SAMPLE_RATES,
    MP3_SAMPLES_PER_FRAME,
    attach_mp3_media,
    decode_mp3_features,
    encode_mp3,
    mp3_fixture_params,
    mp3_frame_size,
)


def _walk(raw: bytes):
    """Independent mini-walker used to cross-check the encoder."""
    assert raw[:3] == b"ID3"
    sz = (raw[6] << 21) | (raw[7] << 14) | (raw[8] << 7) | raw[9]
    pos = 10 + sz
    frames = []
    while pos < len(raw):
        b1, b2 = raw[pos + 1], raw[pos + 2]
        assert raw[pos] == 0xFF and (b1 & 0xE0) == 0xE0
        bidx, sidx, pad = b2 >> 4, (b2 >> 2) & 0x3, (b2 >> 1) & 0x1
        size = 144 * MP3_BITRATE_KBPS[bidx] * 1000 // MP3_SAMPLE_RATES[sidx] + pad
        frames.append((bidx, sidx, pad, size))
        pos += size
    assert pos == len(raw)
    return sz, frames


def test_encode_header_bits_and_length_law():
    """Every fixture frame header decodes back to the fixture law, and the
    stream length is exactly ID3 + Σ frame sizes (no slack, no overlap)."""
    for i in (0, 1, 2, 3, 7, 44, 101, 999):
        raw = encode_mp3(i)
        p = mp3_fixture_params(i)
        id3_body, frames = _walk(raw)
        assert id3_body == p["id3_body"]
        assert len(frames) == p["n_frames"]
        for k, (bidx, sidx, pad, size) in enumerate(frames):
            assert bidx == p["bitrate_idx"] and sidx == p["sr_idx"]
            assert pad == (i + k) % 2
            assert size == mp3_frame_size(bidx, sidx, pad)


def test_padding_changes_frame_length_by_one_byte():
    assert mp3_frame_size(9, 0, 1) == mp3_frame_size(9, 0, 0) + 1
    # the canonical check: 128 kbps @ 44100 -> floor(144*128000/44100) = 417
    assert mp3_frame_size(9, 0, 0) == 417


def test_decode_matches_fixture_closed_form(spark):
    ids = spark.range(30).withColumnRenamed("id", "doc_id")
    rows = {
        r["doc_id"]: r for r in decode_mp3_features(attach_mp3_media(ids)).collect()
    }
    assert len(rows) == 30
    for i in range(30):
        p = mp3_fixture_params(i)
        sr = MP3_SAMPLE_RATES[p["sr_idx"]]
        r = rows[i]
        assert r["n_frames"] == p["n_frames"]
        assert r["sample_rate"] == sr
        assert r["bitrate_kbps"] == MP3_BITRATE_KBPS[p["bitrate_idx"]]
        assert r["n_samples"] == p["n_frames"] * MP3_SAMPLES_PER_FRAME
        assert r["duration_ms"] == r["n_samples"] * 1000 // sr
        assert r["padded_frames"] == sum((i + k) % 2 for k in range(p["n_frames"]))
        assert r["id3_bytes"] == 10 + p["id3_body"]
        sizes = [
            mp3_frame_size(p["bitrate_idx"], p["sr_idx"], (i + k) % 2)
            for k in range(p["n_frames"])
        ]
        assert r["n_bytes"] == r["id3_bytes"] + sum(sizes)
        assert r["payload_sum"] == sum(
            ((i * 7 + k * 13) % 251) * (sizes[k] - 4) for k in range(p["n_frames"])
        )


def _decode_one(spark, raw: bytes):
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "media": [raw]}))
    return decode_mp3_features(df).collect()


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b[:-1], "torn frame body"),
        (lambda b: b[: 10 + (7 % 17)] + b"\x00" + b[10 + (7 % 17) + 1 :], "lost frame sync"),
        # version bits 10 = MPEG-2: clear bit 3 of byte1 of the first header
        (
            lambda b, o=10 + (7 % 17): b[: o + 1]
            + bytes([b[o + 1] & ~0x08])
            + b[o + 2 :],
            "unsupported MPEG version",
        ),
        # layer bits 11 = Layer I
        (
            lambda b, o=10 + (7 % 17): b[: o + 1]
            + bytes([(b[o + 1] & ~0x06) | 0x06])
            + b[o + 2 :],
            "unsupported layer",
        ),
        # protection bit 0 = CRC follows
        (
            lambda b, o=10 + (7 % 17): b[: o + 1]
            + bytes([b[o + 1] & ~0x01])
            + b[o + 2 :],
            "CRC-protected",
        ),
        # bitrate index 15
        (
            lambda b, o=10 + (7 % 17): b[: o + 2]
            + bytes([b[o + 2] | 0xF0])
            + b[o + 3 :],
            "invalid bitrate index",
        ),
        # bitrate index 0 = free format
        (
            lambda b, o=10 + (7 % 17): b[: o + 2]
            + bytes([b[o + 2] & 0x0F])
            + b[o + 3 :],
            "free-format",
        ),
        # sample-rate index 3 = reserved
        (
            lambda b, o=10 + (7 % 17): b[: o + 2]
            + bytes([b[o + 2] | 0x0C])
            + b[o + 3 :],
            "reserved sample-rate",
        ),
        # ID3 size claims past EOF
        (lambda b: b[:6] + b"\x7f\x7f\x7f\x7f" + b[10:], "torn ID3v2 tag"),
    ],
)
def test_malformed_streams_fail_loudly(spark, mutate, msg):
    raw = encode_mp3(7)
    with pytest.raises(Exception, match=msg):
        _decode_one(spark, mutate(raw))


def test_vbr_stream_rejected(spark):
    """Concatenate two different-bitrate docs: the CBR walk must refuse."""
    a = encode_mp3(7)
    b = encode_mp3(8)  # different bitrate index (5 + id % 9)
    id3 = 10 + (8 % 17)
    with pytest.raises(Exception, match="VBR stream"):
        _decode_one(spark, a + b[id3:])


def test_id3less_stream_accepted(spark):
    """A bare frame stream (no ID3 tag) parses with id3_bytes = 0."""
    raw = encode_mp3(7)
    bare = raw[10 + (7 % 17) :]
    (row,) = _decode_one(spark, bare)
    assert row["id3_bytes"] == 0
    assert row["n_frames"] == mp3_fixture_params(7)["n_frames"]


# --- ID3v2.3 tag frames (encode_mp3_tagged / id3_tag_fields) ---------------


def test_id3_tag_roundtrip():
    from flink_dts_connector_spark.operators.multimodal import (
        encode_mp3_tagged,
        id3_fixture_fields,
        id3_tag_fields,
    )

    for i in (0, 1, 6, 29, 30, 4999):
        title, artist, track, pad = id3_fixture_fields(i)
        t, a, tr, n, tag_bytes = id3_tag_fields(encode_mp3_tagged(i))
        assert (t, a, tr, n) == (title, artist, track, 3)
        raw = encode_mp3_tagged(i)
        # tag_bytes is where the first MPEG frame starts
        assert raw[tag_bytes] == 0xFF and (raw[tag_bytes + 1] & 0xE0) == 0xE0


@pytest.mark.parametrize(
    "mutate, msg",
    [
        # frame size overruns the tag
        (lambda b: b[:14] + (2**20).to_bytes(4, "big") + b[18:], "overruns the tag"),
        # text frame with UTF-16 encoding byte (unsupported in this parser)
        (lambda b: b[:20] + b"\x01" + b[21:], "unsupported text encoding"),
        # garbage inside padding: doc 2 has pad=2 — zero the first padding
        # byte (enters the padding branch) and corrupt the second
        (None, "garbage inside ID3v2 padding"),
        # v2.4 tag version
        (lambda b: b[:3] + b"\x04" + b[4:], "only ID3v2.3"),
    ],
)
def test_id3_malformed_rejected(mutate, msg):
    from flink_dts_connector_spark.operators.multimodal import (
        encode_mp3_tagged,
        id3_tag_fields,
    )

    raw = encode_mp3_tagged(2)  # doc 2: padding = 2 bytes
    if mutate is None:
        _, _, _, _, tag_bytes = id3_tag_fields(raw)
        bad = raw[: tag_bytes - 1] + b"\x7f" + raw[tag_bytes:]
    else:
        bad = mutate(raw)
    with pytest.raises(ValueError, match=msg):
        id3_tag_fields(bad)


def test_id3_missing_required_frame():
    from flink_dts_connector_spark.operators.multimodal import (
        _id3_text_frame,
        id3_tag_fields,
    )

    body = _id3_text_frame(b"TIT2", "x")  # no TPE1/TRCK
    m = len(body)
    raw = b"ID3\x03\x00\x00" + bytes(
        ((m >> 21) & 0x7F, (m >> 14) & 0x7F, (m >> 7) & 0x7F, m & 0x7F)
    ) + body
    with pytest.raises(ValueError, match="missing TPE1"):
        id3_tag_fields(raw)


# ---------------------------------------------------------------------------
# Layer III side-info tier (r11): genuine §2.4.1.7 bit-packing round-trips,
# spec validations reject, corruption is never a non-ValueError crash.
# ---------------------------------------------------------------------------


def _sideinfo_closed_form(doc_id):
    from flink_dts_connector_spark.operators.multimodal import (
        mp3_frame_size,
        mp3_granule_law,
        mp3_sideinfo_params,
    )

    p = mp3_sideinfo_params(doc_id)
    nf = p["n_frames"]
    grs = [mp3_granule_law(doc_id, k, g) for k in range(nf) for g in range(2)]
    return (
        nf,
        max((doc_id * 3 + k * 19) % 512 for k in range(nf)),
        sum((doc_id + k * 5) % 16 for k in range(nf)),
        sum(gr["part23"] for gr in grs),
        sum(gr["big_values"] for gr in grs),
        sum(gr["global_gain"] for gr in grs),
        sum(1 for gr in grs if gr["wsf"]),
        sum(1 for gr in grs if gr["wsf"] and gr["block_type"] == 2),
        sum(gr["region0"] for gr in grs if not gr["wsf"]),
        sum(
            mp3_frame_size(p["bitrate_idx"], p["sr_idx"], (doc_id + k) % 2)
            for k in range(nf)
        ),
        1,  # channels (mono fixture)
    )


def test_sideinfo_roundtrip_closed_form():
    from flink_dts_connector_spark.operators.multimodal import (
        encode_mp3_sideinfo,
        mp3_sideinfo_features,
    )

    for d in (0, 1, 2, 3, 7, 42, 512, 1234, 65535, 999_999):
        assert mp3_sideinfo_features(encode_mp3_sideinfo(d)) == _sideinfo_closed_form(d)


def test_sideinfo_big_values_over_288_rejected():
    from flink_dts_connector_spark.operators.multimodal import (
        _MsbBitWriter,
        mp3_parse_sideinfo,
    )

    w = _MsbBitWriter()
    w.put(0, 9); w.put(0, 5); w.put(0, 4)
    for _g in range(2):
        w.put(0, 12)
        w.put(289, 9)  # spec max is 288
        w.put(0, 8); w.put(0, 4); w.put(0, 1)
        for _j in range(3):
            w.put(0, 5)
        w.put(0, 4); w.put(0, 3)
        w.put(0, 1); w.put(0, 1); w.put(0, 1)
    with pytest.raises(ValueError, match="big_values"):
        mp3_parse_sideinfo(w.flush())


def test_sideinfo_block_type_zero_under_switch_rejected():
    from flink_dts_connector_spark.operators.multimodal import (
        _MsbBitWriter,
        mp3_parse_sideinfo,
    )

    w = _MsbBitWriter()
    w.put(0, 9); w.put(0, 5); w.put(0, 4)
    for _g in range(2):
        w.put(0, 12); w.put(0, 9); w.put(0, 8); w.put(0, 4)
        w.put(1, 1)  # window switching on...
        w.put(0, 2)  # ...with forbidden block_type 0
        w.put(0, 1)
        for _j in range(2):
            w.put(0, 5)
        for _j in range(3):
            w.put(0, 3)
        w.put(0, 1); w.put(0, 1); w.put(0, 1)
    with pytest.raises(ValueError, match="block_type 0"):
        mp3_parse_sideinfo(w.flush())


def test_sideinfo_torn_block_rejected():
    from flink_dts_connector_spark.operators.multimodal import mp3_parse_sideinfo

    with pytest.raises(ValueError, match="torn side-info"):
        mp3_parse_sideinfo(b"\x00" * 16)


def test_sideinfo_stereo_roundtrip_and_layout():
    """Stereo (r11): 32-byte side info — 3 private bits, two scfsi fields,
    4 granule-channel structs per frame — round-trips against the same
    closed-form law with the c-terms live; the mono law is the c=0 slice
    (already pinned by test_sideinfo_roundtrip_closed_form)."""
    from flink_dts_connector_spark.operators.multimodal import (
        encode_mp3_sideinfo,
        mp3_frame_size,
        mp3_granule_law,
        mp3_sideinfo_features,
        mp3_sideinfo_params,
    )

    for d in (1, 3, 5, 42, 999):
        p = mp3_sideinfo_params(d)
        nf = p["n_frames"]
        grs = [
            mp3_granule_law(d, k, g, c)
            for k in range(nf) for g in range(2) for c in range(2)
        ]
        got = mp3_sideinfo_features(encode_mp3_sideinfo(d, channels=2))
        assert got == (
            nf,
            max((d * 3 + k * 19) % 512 for k in range(nf)),
            sum((d + k * 5 + 7 * c) % 16 for k in range(nf) for c in range(2)),
            sum(gr["part23"] for gr in grs),
            sum(gr["big_values"] for gr in grs),
            sum(gr["global_gain"] for gr in grs),
            sum(1 for gr in grs if gr["wsf"]),
            sum(1 for gr in grs if gr["wsf"] and gr["block_type"] == 2),
            sum(gr["region0"] for gr in grs if not gr["wsf"]),
            sum(
                mp3_frame_size(p["bitrate_idx"], p["sr_idx"], (d + k) % 2)
                for k in range(nf)
            ),
            2,
        )


def test_sideinfo_mode_flip_never_silent_crash():
    """Flipping the mode bits of a mono stream makes the parser read a
    32-byte layout over 17 bytes of side info + filler: it must either
    reject (ValueError) or produce a structurally consistent parse —
    never a crash of another type."""
    from flink_dts_connector_spark.operators.multimodal import (
        encode_mp3_sideinfo,
        mp3_sideinfo_features,
    )

    raw = bytearray(encode_mp3_sideinfo(5))
    raw[3] = 0x04  # mode bits 00 = stereo
    try:
        got = mp3_sideinfo_features(bytes(raw))
    except ValueError:
        return
    assert got[9] == len(raw) and got[10] == 2


def test_sideinfo_mode_change_mid_stream_rejected():
    from flink_dts_connector_spark.operators.multimodal import (
        encode_mp3_sideinfo,
        mp3_frame_size,
        mp3_sideinfo_features,
        mp3_sideinfo_params,
    )

    d = 4  # even doc: mono law, >=2 frames
    raw = bytearray(encode_mp3_sideinfo(d))
    p = mp3_sideinfo_params(d)
    f0 = mp3_frame_size(p["bitrate_idx"], p["sr_idx"], d % 2)
    raw[f0 + 3] = 0x04  # second frame flips to stereo
    with pytest.raises(ValueError, match="changed mid-stream"):
        mp3_sideinfo_features(bytes(raw))


def test_sideinfo_truncation_rejected():
    from flink_dts_connector_spark.operators.multimodal import (
        encode_mp3_sideinfo,
        mp3_sideinfo_features,
    )

    raw = encode_mp3_sideinfo(9)
    for cut in (1, 3, 4, 10, 20, len(raw) - 1):
        with pytest.raises(ValueError):
            mp3_sideinfo_features(raw[:cut])


def test_sideinfo_corruption_never_silent():
    """Flip one bit at every byte position of a small stream: either a
    loud ValueError, or the flip landed in a value field (gains, lengths,
    filler) and the parse stays structurally consistent — same frame count
    and full byte accounting."""
    from flink_dts_connector_spark.operators.multimodal import (
        encode_mp3_sideinfo,
        mp3_sideinfo_features,
    )

    raw = encode_mp3_sideinfo(3)
    clean = mp3_sideinfo_features(raw)
    for pos in range(len(raw)):
        for bit in (0, 3, 7):
            bad = bytearray(raw)
            bad[pos] ^= 1 << bit
            try:
                got = mp3_sideinfo_features(bytes(bad))
            except ValueError:
                continue
            assert got[0] == clean[0] and got[9] == len(raw)


# ---------------------------------------------------------------------------
# r12: scale-factor tier (§2.4.2.7)
# ---------------------------------------------------------------------------


def test_scalefactor_roundtrip_closed_form():
    """encode → parse equals the fixture law for a spread of ids covering
    every block-type / scfsi / slen combination the laws generate."""
    from flink_dts_connector_spark.operators.multimodal import (
        _scfsi_group,
        encode_mp3_scalefactors,
        mp3_scalefactor_features,
        mp3_sf_bands,
        mp3_sf_law,
        mp3_sf_value,
        mp3_sideinfo_params,
    )

    for doc in list(range(24)) + [97, 255, 1000003, 2**31 - 5]:
        got = mp3_scalefactor_features(encode_mp3_scalefactors(doc))
        p = mp3_sideinfo_params(doc)
        s1 = s2 = p2 = ntx = stx = g1e = short = mix = 0
        for k in range(p["n_frames"]):
            laws = [mp3_sf_law(doc, k, g) for g in range(2)]
            g0 = {}
            for g, law in enumerate(laws):
                s1 += law["slen1"]
                s2 += law["slen2"]
                if law["wsf"] and law["block_type"] == 2:
                    short += 1
                    if law["mixed"]:
                        mix += 1
                for kind, i, w, slen in mp3_sf_bands(law):
                    reuse = (
                        g == 1 and kind == "long"
                        and bool((law["scfsi"] >> (3 - _scfsi_group(i))) & 1)
                    )
                    v = mp3_sf_value(doc, k, g, i, w, slen)
                    if reuse:
                        g1e += g0[i]
                        continue
                    p2 += slen
                    if slen:
                        ntx += 1
                        stx += v
                    if g == 0 and kind == "long":
                        g0[i] = v
                    if g == 1:
                        g1e += v
        assert got == (p["n_frames"], s1, s2, p2, ntx, stx, g1e, short, mix, got[9])


def test_scalefactor_slen_table_is_the_published_one():
    from flink_dts_connector_spark.operators.multimodal import MP3_SLEN1, MP3_SLEN2

    # ISO/IEC 11172-3 table for scalefac_compress — spot-pin the corners
    assert (MP3_SLEN1[0], MP3_SLEN2[0]) == (0, 0)
    assert (MP3_SLEN1[4], MP3_SLEN2[4]) == (3, 0)
    assert (MP3_SLEN1[15], MP3_SLEN2[15]) == (4, 3)
    assert len(MP3_SLEN1) == len(MP3_SLEN2) == 16


def test_scalefactor_rejections():
    from flink_dts_connector_spark.operators.multimodal import (
        encode_mp3_scalefactors,
        mp3_scalefactor_features,
    )

    raw = bytearray(encode_mp3_scalefactors(7))
    # main_data_begin != 0: set the first side-info bit (reservoir use)
    bad = bytearray(raw)
    bad[4] |= 0x80
    with pytest.raises(ValueError, match="reservoir"):
        mp3_scalefactor_features(bytes(bad))
    # stereo header rejected by this mono tier
    bad = bytearray(raw)
    bad[3] = 0x04
    with pytest.raises(ValueError, match="mono"):
        mp3_scalefactor_features(bytes(bad))
    with pytest.raises(ValueError, match="torn|sync|frames"):
        mp3_scalefactor_features(bytes(raw[: len(raw) // 2 + 1]))


def test_scalefactor_part2_overflow_rejected():
    """Lowering a granule's part2_3_length below its part2_length must
    raise: the parser's consistency check is live, not decorative.
    doc 1, frame k=0 is long-long (wsf = (1+0)%3 != 0), so part23 for
    granule 0 sits at side-info bits 18..29 (after mdb 9 + private 5 +
    scfsi 4); zeroing them forces part23 = 0 < part2_length > 0."""
    from flink_dts_connector_spark.operators.multimodal import (
        encode_mp3_scalefactors,
        mp3_scalefactor_features,
        mp3_sf_law,
    )

    law = mp3_sf_law(1, 0, 0)
    assert law["wsf"] == 0 and (law["slen1"] or law["slen2"])
    raw = bytearray(encode_mp3_scalefactors(1))
    # side info starts at byte 4; bits 18..29 → bytes 6..7 within si
    si = 4
    raw[si + 2] &= 0xC0  # clear bits 18..23
    raw[si + 3] &= 0x03  # clear bits 24..29
    with pytest.raises(ValueError, match="part2_length exceeds"):
        mp3_scalefactor_features(bytes(raw))


def test_scalefactor_scfsi_reuse_is_load_bearing():
    """Find a doc/frame with scfsi != 0 and verify granule 1's effective
    sum differs from its transmitted sum (reused bands inherit g0)."""
    from flink_dts_connector_spark.operators.multimodal import (
        encode_mp3_scalefactors,
        mp3_scalefactor_features,
        mp3_sf_law,
        mp3_sideinfo_params,
    )

    hit = None
    for doc in range(60):
        p = mp3_sideinfo_params(doc)
        for k in range(p["n_frames"]):
            law = mp3_sf_law(doc, k, 1)
            if law["scfsi"] and (law["slen1"] or law["slen2"]):
                hit = doc
                break
        if hit is not None:
            break
    assert hit is not None
    feats = mp3_scalefactor_features(encode_mp3_scalefactors(hit))
    # with reuse active, at least one long band was skipped: part2_bits is
    # strictly below the no-reuse bit count of the same streams
    from flink_dts_connector_spark.operators.multimodal import mp3_sf_bands

    full_bits = 0
    for k in range(mp3_sideinfo_params(hit)["n_frames"]):
        for g in range(2):
            full_bits += sum(b[3] for b in mp3_sf_bands(mp3_sf_law(hit, k, g)))
    assert feats[3] < full_bits
