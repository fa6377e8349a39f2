"""MP3 Layer III Huffman-spectrum tier (r13, operators/multimodal.py):
codebook soundness, bitstream round-trip against the fixture law, exact
part2+part3 accounting, and loud rejection of the violations a real
decoder rejects — unused tables, invalid prefixes, count1 overrun,
part2_3_length desync, the bit reservoir. Bit-level checks the SQL oracle
can't see; value-law parity is the oracle's job (sweep-gated)."""

from __future__ import annotations

import pytest

from flink_dts_connector_spark.operators.multimodal import (
    MP3_HUFF_LINBITS,
    MP3_HUFF_XLEN,
    MP3_PAIR_CODE_MAXLEN,
    MP3_QUAD_CODE_MAXLEN,
    MP3_SPEC_SFB_BOUNDS,
    _MsbBitReader,
    _MsbBitWriter,
    encode_mp3_spectrum,
    mp3_count1_codebook,
    mp3_huff_codebook,
    mp3_spec_regions,
    mp3_spec_sign,
    mp3_spectrum_features,
    mp3_spectrum_law,
    mp3_sideinfo_params,
)


def _prefix_free(codes: dict) -> None:
    """codes: symbol -> (code, len). No codeword may prefix another."""
    items = sorted(((ln, c) for c, ln in codes.values()))
    as_bits = [format(c, f"0{ln}b") for ln, c in items]
    for i, a in enumerate(as_bits):
        for b in as_bits[i + 1 :]:
            assert not b.startswith(a), f"{a} prefixes {b}"


def test_codebooks_are_prefix_free_and_complete():
    """Every usable pair table: xlen² symbols, Kraft ≤ 1, prefix-free,
    length-limited, and the decode map inverts the encode map."""
    for t in range(1, 32):
        if t in (4, 14):
            with pytest.raises(ValueError):
                mp3_huff_codebook(t)
            continue
        enc, dec, n, linbits = mp3_huff_codebook(t)
        assert n == MP3_HUFF_XLEN[t] and len(enc) == n * n
        assert linbits == MP3_HUFF_LINBITS.get(t, 0)
        assert all(ln <= MP3_PAIR_CODE_MAXLEN for _, ln in enc.values())
        assert sum(2 ** -ln for _, ln in enc.values()) <= 1.0 + 1e-12
        assert {(ln, c): s for s, (c, ln) in enc.items()} == dec
        if n <= 6:  # full prefix check on the small tables (O(n⁴))
            _prefix_free(enc)
    enc_a, dec_a = mp3_count1_codebook()
    assert len(enc_a) == 16
    assert all(ln <= MP3_QUAD_CODE_MAXLEN for _, ln in enc_a.values())
    _prefix_free(enc_a)


def test_codebook_roundtrip_through_bitstream():
    """Encode every symbol of a large ESC table through the MSB writer and
    prefix-walk it back — the exact decode path the feature stage uses."""
    from flink_dts_connector_spark.operators.multimodal import _mp3_huff_read

    enc, dec, n, _ = mp3_huff_codebook(24)
    w = _MsbBitWriter()
    syms = [(x, y) for x in range(n) for y in range(n)]
    for s in syms:
        c, ln = enc[s]
        w.put(c, ln)
    r = _MsbBitReader(w.flush())
    for s in syms:
        assert _mp3_huff_read(r, dec, MP3_PAIR_CODE_MAXLEN) == s


def test_fixture_fit_and_part23_exactness_all_docids():
    """The provable frame-fit bound holds in practice: every doc_id in the
    widest fixture population encodes without overflow and parses back
    with exact part2+part3 == part2_3_length (the decoder raises
    otherwise). Sampled across the sf1 doc_id range."""
    for d in list(range(200)) + [499, 999, 4999, 12345, 49999]:
        feats = mp3_spectrum_features(encode_mp3_spectrum(d))
        assert feats[0] == mp3_sideinfo_params(d)["n_frames"]
        law_pairs = sum(
            mp3_spectrum_law(d, k, g)["bvs"]
            for k in range(feats[0])
            for g in range(2)
        )
        # decoder counts CODED pairs (table-0 regions are zero-bit)
        assert feats[1] <= law_pairs
        assert feats[7] >= 0  # rzero never negative


def test_region_boundaries_law():
    """Long granules map region counts through the band table with the
    clamp; window-switched granules pin region0 at sample 36."""
    law = {"wsf": 1, "region0": 9, "region1": 7}
    assert mp3_spec_regions(law) == (36, 576)
    law = {"wsf": 0, "region0": 2, "region1": 1}
    assert mp3_spec_regions(law) == (MP3_SPEC_SFB_BOUNDS[3], MP3_SPEC_SFB_BOUNDS[5])
    law = {"wsf": 0, "region0": 15, "region1": 7}  # 15+7+2 = 24 > 22 -> clamp
    assert mp3_spec_regions(law) == (MP3_SPEC_SFB_BOUNDS[16], 576)


def _tamper(raw: bytes, byte_off: int, xor: int) -> bytes:
    b = bytearray(raw)
    b[byte_off] ^= xor
    return bytes(b)


def test_loud_rejections():
    raw = encode_mp3_spectrum(7)
    # torn stream
    with pytest.raises(ValueError):
        mp3_spectrum_features(raw[: len(raw) - 9])
    # reservoir: set main_data_begin's top bit (first side-info byte)
    with pytest.raises(ValueError, match="reservoir"):
        mp3_spectrum_features(_tamper(raw, 4, 0x80))
    # stereo mode bits
    with pytest.raises(ValueError, match="mono"):
        mp3_spectrum_features(_tamper(raw, 3, 0xC0))
    # lost sync
    with pytest.raises(ValueError, match="sync"):
        mp3_spectrum_features(_tamper(raw, 0, 0x01))


def test_unused_table_and_desync_rejections():
    """Bit-level tampering inside the side info: selecting table 4, or
    inflating part2_3_length, must raise — never misparse silently."""
    # Find a doc/frame whose granule-0 is LONG (table_select at a known
    # offset) and rebuild its side info with table 4 selected.
    d = 1  # (1+0) % 3 != 0 -> frame 0 granule 0 is long
    raw = bytearray(encode_mp3_spectrum(d))
    # side info layout: 9+5+4 = 18 bits, then per granule: 12+9+8+4+1 = 34
    # bits before table_select[0] (long granule) -> bit 52 of the side
    # info; force the 5-bit field to 4 (00100)
    si = raw[4 : 4 + 17]
    r = _MsbBitReader(bytes(si))
    r.bits(18 + 34)
    bitpos = r.pos
    w_bits = []
    rr = _MsbBitReader(bytes(si))
    for i in range(17 * 8):
        w_bits.append(rr.bits(1))
    for i, v in enumerate((0, 0, 1, 0, 0)):
        w_bits[bitpos + i] = v
    w = _MsbBitWriter()
    for b in w_bits:
        w.put(b, 1)
    raw[4 : 4 + 17] = w.flush()
    with pytest.raises(ValueError, match="unused Huffman table|prefix|part2|overrun|exceeds"):
        mp3_spectrum_features(bytes(raw))
    # part23 inflation: add 64 to granule 0's 12-bit field (bits 18..29)
    raw2 = bytearray(encode_mp3_spectrum(d))
    si = raw2[4 : 4 + 17]
    rr = _MsbBitReader(bytes(si))
    bits = [rr.bits(1) for _ in range(17 * 8)]
    p23 = 0
    for i in range(12):
        p23 = (p23 << 1) | bits[18 + i]
    p23 += 64
    for i in range(12):
        bits[18 + i] = (p23 >> (11 - i)) & 1
    w = _MsbBitWriter()
    for b in bits:
        w.put(b, 1)
    raw2[4 : 4 + 17] = w.flush()
    with pytest.raises(ValueError):
        mp3_spectrum_features(bytes(raw2))


def test_sign_and_checksum_sensitivity():
    """Flipping one sign bit in the coded spectrum flips the checksum (or
    desyncs loudly) — the column really covers the payload bits."""
    from flink_dts_connector_spark.operators.multimodal import (
        _mp3_spec_granule_bits,
        _scfsi_group,
        mp3_sf_bands,
    )

    d = 3
    raw = encode_mp3_spectrum(d)
    want = mp3_spectrum_features(raw)
    # locate frame 0's coded-spectrum bytes exactly from the fixture law:
    # [part2 of g0 .. end of part3 of g1], skipping the scale-factor bits
    # this tier's features legitimately don't echo
    laws = [mp3_spectrum_law(d, 0, g) for g in range(2)]
    p2 = []
    for g, law in enumerate(laws):
        bands = mp3_sf_bands(law)
        if g == 1 and law["scfsi"]:
            bands = [
                b for b in bands
                if not (law["scfsi"] >> (3 - _scfsi_group(b[1]))) & 1
            ]
        p2.append(sum(b[3] for b in bands))
    p3 = [sum(nb for _, nb in _mp3_spec_granule_bits(d, 0, g)) for g in range(2)]
    total_bits = sum(p2) + sum(p3)
    lo = 4 + 17 + p2[0] // 8  # first byte containing part3 bits
    hi = 4 + 17 + (total_bits + 7) // 8
    changed = total = 0
    for off in range(lo, hi):
        for xor in (0x01, 0x10, 0x80):
            total += 1
            try:
                got = mp3_spectrum_features(_tamper(raw, off, xor))
            except ValueError:
                changed += 1
                continue
            if got != want:
                changed += 1
    assert changed > total * 0.6, f"{changed}/{total} spectrum flips caught"


def test_spec_sign_law_matches_decoder():
    assert mp3_spec_sign(0, 0, 0, 0) == 0
    assert mp3_spec_sign(1, 0, 0, 0) == 1
    assert mp3_spec_sign(1, 1, 0, 0) == 0  # d + 5k
