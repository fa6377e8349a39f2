"""Fragmented-MP4 tier (r13, operators/multimodal.py): flag-conditional
tfhd/trun grammar, the trun > tfhd > trex resolution precedence, and the
fMP4 conformance rejections (sequence breaks, tfdt drift, data-offset
misses, size-sum mismatches). Bit-level checks the SQL oracle can't see;
value-law parity is the oracle's job (sweep-gated)."""

from __future__ import annotations

import struct

import pytest

from flink_dts_connector_spark.operators import multimodal as M

DOCS = list(range(120)) + [499, 999, 4999, 12345, 49999]


def test_population_exercises_every_resolution_path():
    """All three size sources (trun per-sample, tfhd default, trex
    default) and trun durations must appear — a population living on one
    path wouldn't test the precedence."""
    tot = dict(ts=0, fs=0, xs=0, td=0)
    for d in DOCS:
        f = M.mp4_fragmented_features(M.encode_mp4_fragmented(d))
        assert f[0] == M.mp4_frag_params(d)["n_frags"]
        tot["ts"] += f[4]
        tot["fs"] += f[5]
        tot["xs"] += f[6]
        tot["td"] += f[7]
    for key, n in tot.items():
        assert n > 30, f"path {key} under-exercised: {n}"


def test_features_replay_the_law():
    for d in DOCS:
        raw = M.encode_mp4_fragmented(d)
        f = M.mp4_fragmented_features(raw)
        p = M.mp4_frag_params(d)
        samples = dur = nbytes = psum = ck = 0
        for fr in range(p["n_frags"]):
            law = M.mp4_frag_law(d, fr)
            fb = fd = 0
            for j in range(law["n_samples"]):
                size, sdur = M.mp4_frag_effective(d, fr, j)
                fb += size
                fd += sdur
                psum += M.mp4_frag_fill(d, fr, j) * size
            samples += law["n_samples"]
            dur += fd
            nbytes += fb
            ck += (1 + fr) * (3 * fd + 5 * fb + 7 * law["n_samples"])
        assert f[1] == samples and f[2] == dur and f[3] == nbytes
        assert f[8] == psum and f[10] == ck and f[11] == len(raw)


def _find_frag_box(raw: bytes, frag_idx: int, tag: bytes) -> int:
    """Byte offset of the body of `tag` inside fragment `frag_idx`."""
    # skip ftyp + moov
    pos = int.from_bytes(raw[0:4], "big")
    pos += int.from_bytes(raw[pos : pos + 4], "big")
    for i in range(frag_idx):
        pos += int.from_bytes(raw[pos : pos + 4], "big")  # moof
        pos += int.from_bytes(raw[pos : pos + 4], "big")  # mdat
    end = pos + int.from_bytes(raw[pos : pos + 4], "big")
    boxes: list = []
    M._mp4_walk(raw, pos + 8, end, 1, boxes)
    for t, s, e, _ in boxes:
        if t == tag:
            return s
    raise AssertionError(f"{tag!r} not found")


def test_conformance_rejections():
    d = 10  # 4 fragments
    raw = M.encode_mp4_fragmented(d)
    # sequence break: bump fragment 1's mfhd number
    b = bytearray(raw)
    s = _find_frag_box(raw, 1, b"mfhd")
    b[s + 4 : s + 8] = struct.pack(">I", 9)
    with pytest.raises(ValueError, match="sequence break"):
        M.mp4_fragmented_features(bytes(b))
    # tfdt drift: bump fragment 1's baseMediaDecodeTime
    b = bytearray(raw)
    s = _find_frag_box(raw, 1, b"tfdt")
    old = struct.unpack_from(">I", raw, s + 4)[0]
    b[s + 4 : s + 8] = struct.pack(">I", old + 1)
    with pytest.raises(ValueError, match="tfdt drift"):
        M.mp4_fragmented_features(bytes(b))
    # unknown track in tfhd
    b = bytearray(raw)
    s = _find_frag_box(raw, 0, b"tfhd")
    b[s + 4 : s + 8] = struct.pack(">I", 99)
    with pytest.raises(ValueError, match="unknown track"):
        M.mp4_fragmented_features(bytes(b))
    # data offset miss: bump trun's data_offset
    b = bytearray(raw)
    s = _find_frag_box(raw, 0, b"trun")
    off = struct.unpack_from(">i", raw, s + 8)[0]
    b[s + 8 : s + 12] = struct.pack(">i", off + 1)
    with pytest.raises(ValueError, match="data offset"):
        M.mp4_fragmented_features(bytes(b))
    # truncation
    with pytest.raises(ValueError):
        M.mp4_fragmented_features(raw[: len(raw) - 3])


def test_size_sum_mismatch_is_caught():
    """Corrupting a trun per-sample size must break the mdat tiling."""
    d = next(
        x for x in range(40) if M.mp4_frag_law(x, 0)["trun_sizes"]
    )
    raw = M.encode_mp4_fragmented(d)
    b = bytearray(raw)
    s = _find_frag_box(raw, 0, b"trun")
    law = M.mp4_frag_law(d, 0)
    # first sample entry starts after count+data_offset; duration field
    # precedes size when present
    entry = s + 12 + (4 if law["trun_durs"] else 0)
    old = struct.unpack_from(">I", raw, entry)[0]
    b[entry : entry + 4] = struct.pack(">I", old + 1)
    with pytest.raises(ValueError, match="sizes disagree|data offset|torn"):
        M.mp4_fragmented_features(bytes(b))


def test_payload_sum_covers_every_byte():
    """Flipping any mdat payload byte changes payload_sum."""
    d = 7
    raw = M.encode_mp4_fragmented(d)
    want = M.mp4_fragmented_features(raw)
    # locate fragment 0's mdat payload
    pos = int.from_bytes(raw[0:4], "big")
    pos += int.from_bytes(raw[pos : pos + 4], "big")
    moof_len = int.from_bytes(raw[pos : pos + 4], "big")
    d0 = pos + moof_len + 8
    d1 = pos + moof_len + int.from_bytes(raw[pos + moof_len : pos + moof_len + 4], "big")
    changed = 0
    for off in range(d0, d1):
        b = bytearray(raw)
        b[off] = (b[off] + 1) % 256
        got = M.mp4_fragmented_features(bytes(b))
        changed += got[8] != want[8]
    assert changed == d1 - d0
