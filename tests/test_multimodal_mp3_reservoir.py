"""MP3 Layer III bit-reservoir tier (r13, operators/multimodal.py):
the closed-form main_data_begin recurrence, cross-frame stream layout,
decode equivalence with the reservoir-free spectrum tier (bit-identical
main data ⇒ identical aggregates), stuffing-byte invariance (ancillary
bytes are never decoded), and loud rejection of underrun / overlap /
first-frame back-pointer violations. Bit-level checks the SQL oracle
can't see; value-law parity is the oracle's job (sweep-gated)."""

from __future__ import annotations

import pytest

from flink_dts_connector_spark.operators.multimodal import (
    MP3_RESERVOIR_STEP,
    encode_mp3_reservoir,
    encode_mp3_spectrum,
    mp3_reservoir_features,
    mp3_reservoir_layout,
    mp3_reservoir_mdb,
    mp3_sideinfo_params,
    mp3_spectrum_features,
)

DOCS = list(range(120)) + [499, 999, 4999, 12345, 49999]


def test_mdb_recurrence_properties():
    """First frame always 0 (nothing transmitted yet); every value in the
    9-bit range; steps bounded by the provable frame-fit slack; the
    population exercises live reservoirs."""
    live = 0
    for d in DOCS:
        nf = mp3_sideinfo_params(d)["n_frames"]
        prev = 0
        for k in range(nf):
            r = mp3_reservoir_mdb(d, k)
            if k == 0:
                assert r == 0
            assert 0 <= r <= 511
            assert abs(r - prev) <= MP3_RESERVOIR_STEP
            prev = r
            live += r > 0
    assert live > len(DOCS)  # reservoirs are the common case, not an edge


def test_layout_tiles_the_stream():
    """Per-frame layout invariants: stuffing never negative, main data
    starts exactly main_data_begin bytes before the frame's own body, and
    main + stuffing bytes tile the transmitted slab total exactly."""
    for d in DOCS[:40]:
        rows = mp3_reservoir_layout(d)
        total_slab = sum(r["slab"] for r in rows)
        total_stream = sum(r["b"] + r["stuff"] for r in rows)
        assert total_stream == total_slab
        pos = 0
        for r in rows:
            assert r["stuff"] >= 0
            assert r["main_start"] == r["s"] - r["mdb"]
            assert r["main_start"] == pos  # regions are contiguous in
            pos += r["b"] + r["stuff"]     # stream order (stuffing between)
            assert r["b"] + r["stuff"] <= r["mdb"] + r["slab"]


def test_decode_equals_spectrum_tier():
    """The reservoir stream carries bit-identical main data, so every
    shared aggregate (pairs, quads, escapes, sums, checksum, rzero,
    region2) must equal the reservoir-free spectrum tier's — the
    strongest possible check that reservoir assembly relocates every bit
    correctly. The mdb columns must replay the closed-form recurrence."""
    for d in DOCS:
        spec = mp3_spectrum_features(encode_mp3_spectrum(d))
        res = mp3_reservoir_features(encode_mp3_reservoir(d))
        assert res[:9] == spec[:9]
        assert res[12] == spec[9]  # same stream length (CBR frame sizes)
        nf = mp3_sideinfo_params(d)["n_frames"]
        mdbs = [mp3_reservoir_mdb(d, k) for k in range(nf)]
        assert res[9] == max(mdbs)
        assert res[10] == sum(mdbs)
        assert res[11] == sum(1 for m in mdbs if m > 0)


def test_stuffing_bytes_are_never_decoded():
    """Flipping every ancillary/stuffing byte in the logical stream must
    leave the decoded features untouched — a real reservoir decoder skips
    the gap between one frame's main-data end and the next back-pointer
    target."""
    checked = 0
    for d in (3, 7, 10, 11, 23):
        raw = bytearray(encode_mp3_reservoir(d))
        want = mp3_reservoir_features(bytes(raw))
        rows = mp3_reservoir_layout(d)
        # stream offset -> raw offset: slab byte j of frame k lives at
        # frame_start_k + 21 + (j - s_k)
        frame_start = []
        pos = 0
        for r in rows:
            frame_start.append(pos)
            pos += r["size"]
        def raw_off(stream_j: int) -> int:
            for k, r in enumerate(rows):
                if r["s"] <= stream_j < r["s"] + r["slab"]:
                    return frame_start[k] + 21 + (stream_j - r["s"])
            raise AssertionError(stream_j)
        for r in rows:
            stuff_lo = r["main_start"] + r["b"]
            for j in range(stuff_lo, stuff_lo + r["stuff"]):
                raw[raw_off(j)] ^= 0xFF
                checked += 1
        assert mp3_reservoir_features(bytes(raw)) == want
    assert checked > 100  # the corpus really has stuffing to flip


def _set_mdb(raw: bytes, frame_pos: int, mdb: int) -> bytes:
    """Overwrite the 9-bit main_data_begin of the side info at frame_pos."""
    b = bytearray(raw)
    si0, si1 = b[frame_pos + 4], b[frame_pos + 5]
    b[frame_pos + 4] = (mdb >> 1) & 0xFF
    b[frame_pos + 5] = (si1 & 0x7F) | ((mdb & 1) << 7)
    assert (b[frame_pos + 4], b[frame_pos + 5]) != (si0, si1) or True
    return bytes(b)


def test_loud_rejections():
    d = 10  # bidx 7 (96 kbps), 48 kHz -> smallest slabs; nf = 4
    raw = encode_mp3_reservoir(d)
    rows = mp3_reservoir_layout(d)
    sizes = [r["size"] for r in rows]
    # truncation
    with pytest.raises(ValueError):
        mp3_reservoir_features(raw[: len(raw) - 9])
    # first-frame back-pointer: nothing transmitted yet -> underrun
    with pytest.raises(ValueError, match="underrun"):
        mp3_reservoir_features(_set_mdb(raw, 0, 1))
    # frame 1 back-pointer past the transmitted stream (511 > slab_0)
    assert rows[1]["s"] < 511
    with pytest.raises(ValueError, match="underrun"):
        mp3_reservoir_features(_set_mdb(raw, sizes[0], 511))
    # frame 2: 511 bytes IS transmitted, but collides with frame 0/1 main
    # data -> overlap
    assert rows[2]["s"] >= 511
    with pytest.raises(ValueError, match="overlap"):
        mp3_reservoir_features(_set_mdb(raw, sizes[0] + sizes[1], 511))
    # stereo mode bits / lost sync (shared header walk)
    b = bytearray(raw); b[3] ^= 0xC0
    with pytest.raises(ValueError, match="mono"):
        mp3_reservoir_features(bytes(b))
    b = bytearray(raw); b[0] ^= 0x01
    with pytest.raises(ValueError, match="sync"):
        mp3_reservoir_features(bytes(b))


def test_coded_region_tamper_is_caught():
    """Flipping bits inside main-data (non-stuffing) regions must change
    the features or raise — the checksum really covers the relocated
    payload."""
    d = 11
    raw = encode_mp3_reservoir(d)
    want = mp3_reservoir_features(raw)
    rows = mp3_reservoir_layout(d)
    frame_start = []
    pos = 0
    for r in rows:
        frame_start.append(pos)
        pos += r["size"]
    def raw_off(stream_j: int) -> int:
        for k, r in enumerate(rows):
            if r["s"] <= stream_j < r["s"] + r["slab"]:
                return frame_start[k] + 21 + (stream_j - r["s"])
        raise AssertionError(stream_j)
    changed = total = 0
    for r in rows:
        for j in range(r["main_start"], r["main_start"] + r["b"]):
            for xor in (0x01, 0x80):
                total += 1
                b = bytearray(raw)
                b[raw_off(j)] ^= xor
                try:
                    got = mp3_reservoir_features(bytes(b))
                except ValueError:
                    changed += 1
                    continue
                if got != want:
                    changed += 1
    assert changed > total * 0.6, f"{changed}/{total} reservoir flips caught"


def test_fused_encode_matches_layout_specification():
    """r13 optimization guard: `encode_mp3_reservoir` derives the layout
    inline (each frame built once, the mdb recurrence stepped
    incrementally). This test re-encodes from `mp3_reservoir_layout` — the
    two-pass specification the old encoder implemented literally — and
    pins byte equality, so the fused path can never drift from the
    layout law."""
    from flink_dts_connector_spark.operators.multimodal import (
        _mp3_spectrum_frame,
    )

    for d in DOCS:
        layout = mp3_reservoir_layout(d)
        stream = bytearray()
        frames = []
        for row in layout:
            k = row["k"]
            header, si, main, _ = _mp3_spectrum_frame(d, k, mdb=row["mdb"])
            frames.append((header, si, row["slab"]))
            v = (d * 7 + k * 13) % 251
            stream += main + bytes([v]) * row["stuff"]
        ref = bytearray()
        s = 0
        for header, si, slab in frames:
            ref += header + si + stream[s : s + slab]
            s += slab
        assert bytes(ref) == encode_mp3_reservoir(d)
