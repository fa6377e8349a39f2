"""Box-level MP4 (ISO-BMFF) container codec (operators/multimodal.py):
byte-level grammar checks the SQL oracle can't see — box framing, exact
containment, the 64-bit largesize escape, sample-table cross-checks, and
loud rejection of torn/inconsistent files. Sample payloads are disclosed
filler: these tests pin the CONTAINER walk only."""

from __future__ import annotations

import struct

import pytest

from flink_dts_connector_spark.operators.multimodal import (
    MP4_FIXTURE_OVERHEAD,
    _mp4_box,
    _mp4_walk,
    attach_mp4_media,
    decode_mp4_features,
    encode_mp4,
    mp4_fixture_params,
    mp4_sample_fill,
    mp4_sample_size,
)


def test_fixture_overhead_constant():
    """n_bytes = OVERHEAD + 4*n_samples + sample_bytes for every doc — the
    constant the SQL oracle hardcodes (481)."""
    for i in range(40):
        p = mp4_fixture_params(i)
        n = p["n_samples"]
        sizes = [mp4_sample_size(i, k) for k in range(n)]
        assert len(encode_mp4(i)) == MP4_FIXTURE_OVERHEAD + 4 * n + sum(sizes)


def test_box_tree_shape():
    """Independent walk: 17 boxes, the canonical tree depths, and the
    standard full-box sizes (mvhd v0 108, tkhd v0 92, mdhd v0 32)."""
    raw = encode_mp4(11)
    boxes: list = []
    _mp4_walk(raw, 0, len(raw), 0, boxes)
    tags = [t for t, _, _, _ in boxes]
    assert len(boxes) == 17
    assert tags[:2] == [b"ftyp", b"moov"] and tags[-1] == b"mdat"
    depth = {t: d for t, _, _, d in boxes}
    assert depth[b"moov"] == 0 and depth[b"trak"] == 1 and depth[b"stbl"] == 4
    assert max(d for _, _, _, d in boxes) == 5
    sizes = {t: (b1 - b0 + 8) for t, b0, b1, _ in boxes}
    assert sizes[b"mvhd"] == 108 and sizes[b"tkhd"] == 92 and sizes[b"mdhd"] == 32


def test_stco_offset_hits_mdat_payload():
    raw = encode_mp4(23)
    boxes: list = []
    _mp4_walk(raw, 0, len(raw), 0, boxes)
    stco = next(b for b in boxes if b[0] == b"stco")
    mdat = next(b for b in boxes if b[0] == b"mdat")
    (_, off) = struct.unpack_from(">II", raw, stco[1] + 4)
    assert off == mdat[1]


def test_largesize_escape_walks():
    """A size==1 box carries its true size in a 64-bit field after the tag;
    the fixture encoder never emits one, so pin the decoder directly."""
    body = b"payload!"
    big = (
        (1).to_bytes(4, "big")
        + b"free"
        + (16 + len(body)).to_bytes(8, "big")
        + body
    )
    boxes: list = []
    _mp4_walk(big, 0, len(big), 0, boxes)
    assert boxes == [(b"free", 16, 16 + len(body), 0)]
    with pytest.raises(ValueError, match="torn largesize"):
        _mp4_walk(big[:12], 0, 12, 0, [])


def test_decode_matches_fixture_closed_form(spark):
    ids = spark.range(30).withColumnRenamed("id", "doc_id")
    rows = {
        r["doc_id"]: r for r in decode_mp4_features(attach_mp4_media(ids)).collect()
    }
    assert len(rows) == 30
    for i in range(30):
        p = mp4_fixture_params(i)
        n, ts, delta = p["n_samples"], p["timescale"], p["delta"]
        sizes = [mp4_sample_size(i, k) for k in range(n)]
        r = rows[i]
        assert r["n_boxes"] == 17 and r["max_depth"] == 5
        assert r["movie_timescale"] == 1000 and r["media_timescale"] == ts
        assert r["media_duration"] == n * delta
        assert r["duration_ms"] == n * delta * 1000 // ts
        assert r["n_samples"] == n and r["sample_bytes"] == sum(sizes)
        assert r["payload_sum"] == sum(
            mp4_sample_fill(i, k) * sizes[k] for k in range(n)
        )
        assert r["handler"] == p["handler"].decode()
        assert r["n_bytes"] == MP4_FIXTURE_OVERHEAD + 4 * n + sum(sizes)


def _decode_one(spark, raw: bytes):
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "media": [raw]}))
    return decode_mp4_features(df).collect()


def test_malformed_files_fail_loudly(spark):
    raw = encode_mp4(9)
    # truncated file: last box overruns
    with pytest.raises(Exception, match="bad box size"):
        _decode_one(spark, raw[:-3])
    # stsz/mdat mismatch: shrink mdat's size field by 1 (the stray trailing
    # byte breaks the top-level walk before the Σ stsz cross-check can)
    boxes: list = []
    _mp4_walk(raw, 0, len(raw), 0, boxes)
    mdat = next(b for b in boxes if b[0] == b"mdat")
    hdr_pos = mdat[1] - 8
    bad = bytearray(raw)
    bad[hdr_pos : hdr_pos + 4] = (mdat[2] - mdat[1] + 7).to_bytes(4, "big")
    with pytest.raises(Exception, match="bad box size|mdat length|torn box header"):
        _decode_one(spark, bytes(bad))
    # wrong major brand
    bad2 = bytearray(raw)
    bad2[8:12] = b"qt  "
    with pytest.raises(Exception, match="unsupported major brand"):
        _decode_one(spark, bytes(bad2))
    # corrupt one stsz entry: payload cross-check must trip
    stsz = next(b for b in boxes if b[0] == b"stsz")
    bad3 = bytearray(raw)
    entry0 = stsz[1] + 12
    n0 = struct.unpack_from(">I", raw, entry0)[0]
    bad3[entry0 : entry0 + 4] = (n0 + 1).to_bytes(4, "big")
    with pytest.raises(Exception, match="mdat length != sum"):
        _decode_one(spark, bytes(bad3))


def test_duplicate_top_level_box_rejected(spark):
    """Two mdat boxes (the second empty) must be refused by the census."""
    raw = encode_mp4(3)
    with pytest.raises(Exception, match="exactly one"):
        _decode_one(spark, raw + _mp4_box(b"mdat", b""))


# --- general sample-table demux (encode_mp4_chunked / mp4_demux_features) ---


def test_chunked_overhead_constant():
    from flink_dts_connector_spark.operators.multimodal import (
        MP4_CHUNKED_OVERHEAD,
        encode_mp4_chunked,
        mp4_chunked_fixture_params,
        mp4_sample_size,
    )

    for i in range(40):
        p = mp4_chunked_fixture_params(i)
        n, spc = p["n_samples"], p["spc"]
        n_chunks = (n + spc - 1) // spc
        rem = n - spc * (n_chunks - 1)
        sizes = sum(mp4_sample_size(i, k) for k in range(n))
        extra = 12 if rem != spc else 0
        assert len(encode_mp4_chunked(i)) == (
            MP4_CHUNKED_OVERHEAD + 4 * n + 4 * n_chunks + extra + sizes
        )


def test_demux_accepts_single_chunk_fixture():
    from flink_dts_connector_spark.operators.multimodal import (
        encode_mp4,
        mp4_demux_features,
        mp4_fixture_params,
    )

    got = mp4_demux_features(encode_mp4(9))
    p = mp4_fixture_params(9)
    assert got[1] == 1 and got[2] == 1 and got[3] == p["n_samples"]


def test_demux_tiling_violations_trip():
    import struct

    from flink_dts_connector_spark.operators.multimodal import (
        _mp4_walk,
        encode_mp4_chunked,
        mp4_demux_features,
    )

    raw = encode_mp4_chunked(4)  # 10 samples, spc=2, 5 chunks
    boxes: list = []
    _mp4_walk(raw, 0, len(raw), 0, boxes)

    # nudge the SECOND stco offset by one byte: tiling check must trip
    stco = next(b for b in boxes if b[0] == b"stco")
    off1_pos = stco[1] + 8 + 4  # after verflags+count, second entry
    bad = bytearray(raw)
    v = struct.unpack_from(">I", raw, off1_pos)[0]
    bad[off1_pos : off1_pos + 4] = (v + 1).to_bytes(4, "big")
    with pytest.raises(ValueError, match="does not tile mdat"):
        mp4_demux_features(bytes(bad))

    # shrink a middle stsz entry: the chunk after it starts early -> trip
    stsz = next(b for b in boxes if b[0] == b"stsz")
    e3 = stsz[1] + 12 + 4 * 3
    bad2 = bytearray(raw)
    s3 = struct.unpack_from(">I", raw, e3)[0]
    bad2[e3 : e3 + 4] = (s3 - 1).to_bytes(4, "big")
    with pytest.raises(ValueError, match="does not tile mdat|cover the mdat"):
        mp4_demux_features(bytes(bad2))

    # stsc run map that under-covers the chunks: drop the count to 1 run of
    # spc covering all 5 chunks -> sample total mismatch
    stsc = next(b for b in boxes if b[0] == b"stsc")
    bad3 = bytearray(raw)
    # rewrite entry 1's samples_per_chunk to 1 (5 chunks * 1 = 5 != 10)
    spc_pos = stsc[1] + 8 + 4
    bad3[spc_pos : spc_pos + 4] = (1).to_bytes(4, "big")
    with pytest.raises(ValueError, match="sample total != stsz count"):
        mp4_demux_features(bytes(bad3))


def test_demux_stts_consistency_trips():
    import struct

    from flink_dts_connector_spark.operators.multimodal import (
        _mp4_walk,
        encode_mp4_chunked,
        mp4_demux_features,
    )

    raw = encode_mp4_chunked(7)
    boxes: list = []
    _mp4_walk(raw, 0, len(raw), 0, boxes)
    stts = next(b for b in boxes if b[0] == b"stts")
    # bump run 2's delta: mdhd duration no longer equals the stts total
    d2_pos = stts[1] + 8 + 8 + 4
    bad = bytearray(raw)
    v = struct.unpack_from(">I", raw, d2_pos)[0]
    bad[d2_pos : d2_pos + 4] = (v + 1).to_bytes(4, "big")
    with pytest.raises(ValueError, match="mdhd duration != stts total"):
        mp4_demux_features(bytes(bad))
