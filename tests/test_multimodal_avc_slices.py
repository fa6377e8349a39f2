"""AVC slice-header tier (r13, operators/multimodal.py): §7.3.3 grammar
conditional on parsed SPS/PPS state, the ref-list-modification and MMCO
loops, conformance rejections (IDR/frame_num, QpY range, SP/SI and
weighted-B boundaries, PPS cross-check), and checksum sensitivity.
Bit-level checks the SQL oracle can't see; value-law parity is the
oracle's job (sweep-gated)."""

from __future__ import annotations

import unittest.mock as mock

import pytest

from flink_dts_connector_spark.operators import multimodal as M

DOCS = list(range(120)) + [499, 999, 4999, 12345, 49999]


def test_population_exercises_every_grammar_branch():
    """The fixture law must hit B slices, MMCO loops, list modifications,
    overrides, direct-spatial flags, live poc_lsb and cabac_init — a
    population that skips a branch isn't testing its parse."""
    tot = dict(b=0, mm=0, lm=0, ov=0, ds=0, poc=0, ci=0, idr=0)
    for d in DOCS:
        f = M.avc_slice_features(M.encode_avc_stream(d))
        assert f[0] == M.avc_n_slices(d)
        tot["idr"] += f[1]
        tot["b"] += f[4]
        tot["poc"] += f[6] > 0
        tot["ov"] += f[8]
        tot["lm"] += f[10]
        tot["mm"] += f[12]
        tot["ci"] += f[14] > 0
        tot["ds"] += f[18]
    for key, n in tot.items():
        assert n > 10, f"branch {key} under-exercised: {n}"


def test_features_replay_the_law():
    """Every aggregate equals a direct replay of `avc_slice_law` — the
    encoder and decoder agree bit-for-bit across the conditional
    grammar."""
    for d in DOCS:
        f = M.avc_slice_features(M.encode_avc_stream(d))
        exp = [0] * 19
        for s in range(M.avc_n_slices(d)):
            law = M.avc_slice_law(d, s)
            k = law["kind"]
            exp[0] += law["idr"]
            exp[1] += k == 2
            exp[2] += k == 0
            exp[3] += k == 1
            exp[4] += law["frame_num"]
            exp[5] += law["poc_lsb"]
            exp[6] += law["idr_pic_id"]
            exp[7] += law["ref_override"] if k in (0, 1) else 0
            exp[8] += (
                law["l0_active"] if k in (0, 1) and law["ref_override"] else 0
            )
            exp[9] += law["listmod"]
            exp[10] += law["listmod_diff"] if law["listmod"] else 0
            exp[11] += law["mmco"]
            exp[12] += law["mmco_diff"] if law["mmco"] else 0
            exp[13] += law["cabac_init"]
            exp[14] += law["qp_delta"]
            didc = law["deblock_idc"]
            exp[15] += law["alpha"] if didc != 1 else 0
            exp[16] += law["beta"] if didc != 1 else 0
            exp[17] += law["direct_spatial"] if k == 1 else 0
            exp[18] += (1 + s) * (
                3 * law["frame_num"] + 5 * law["poc_lsb"]
                + 7 * law["qp_delta"] + 11 * law["slice_type"]
                + 13 * law["first_mb"]
            )
        assert list(f[1:20]) == exp, d
        assert f[20] == len(M.encode_avc_stream(d))


def _craft(d: int, laws: list[dict]) -> bytes:
    """Config NALs + slice NALs encoded from explicit (tampered) laws."""
    out = bytearray(M.encode_avc_config(d))
    sc = b"\x00\x00\x00\x01"
    for s, law in enumerate(laws):
        with mock.patch.object(M, "avc_slice_law", return_value=law):
            out += sc + M.encode_avc_slice(d, s)
    return bytes(out)


def test_conformance_rejections():
    d = 6  # even: poc_type 0, cabac 0, bipred 0
    base0 = M.avc_slice_law(d, 0)
    base1 = M.avc_slice_law(d, 1)
    # IDR with non-zero frame_num (§7.4.3)
    with pytest.raises(ValueError, match="frame_num must be 0"):
        M.avc_slice_features(_craft(d, [dict(base0, frame_num=3)]))
    # IDR as a non-reference NAL
    with pytest.raises(ValueError, match="reference NAL"):
        M.avc_slice_features(_craft(d, [dict(base0, ref_idc=0)]))
    # SP slice (disclosed boundary)
    with pytest.raises(ValueError, match="SP/SI"):
        M.avc_slice_features(
            _craft(d, [base0, dict(base1, slice_type=3, kind=3)])
        )
    # slice_type out of range
    with pytest.raises(ValueError, match="invalid slice_type"):
        M.avc_slice_features(
            _craft(d, [base0, dict(base1, slice_type=11, kind=1)])
        )
    # QpY overflow: 26 + pic_init_qp_off + 40 > 51
    with pytest.raises(ValueError, match="outside"):
        M.avc_slice_features(_craft(d, [dict(base0, qp_delta=40)]))
    # deblocking idc out of range
    with pytest.raises(ValueError, match="disable_deblocking"):
        M.avc_slice_features(_craft(d, [dict(base0, deblock_idc=5)]))
    # deblocking offset out of range
    with pytest.raises(ValueError, match="deblocking offset"):
        M.avc_slice_features(
            _craft(d, [dict(base0, deblock_idc=0, alpha=7)])
        )
    # weighted-B boundary: d=7 has bipred 1 (7 % 3)
    d7 = 7
    lb = dict(M.avc_slice_law(d7, 1), slice_type=1, kind=1)
    with pytest.raises(ValueError, match="pred_weight_table"):
        M.avc_slice_features(_craft(d7, [M.avc_slice_law(d7, 0), lb]))
    # cabac_init_idc out of range: d=7 has cabac 1; slice 1 kind P
    lp = dict(M.avc_slice_law(d7, 1), slice_type=0, kind=0, cabac_init=3)
    with pytest.raises(ValueError, match="cabac_init"):
        M.avc_slice_features(_craft(d7, [M.avc_slice_law(d7, 0), lp]))


def test_pps_cross_check_and_nal_type():
    d = 9
    p2 = dict(M.avc_fixture_params(d))
    p2["pps_id"] = (p2["pps_id"] + 1) % 4
    cfg = M.encode_avc_config(d)
    with mock.patch.object(M, "avc_fixture_params", return_value=p2):
        bad_slice = M.encode_avc_slice(d, 0)
    sc = b"\x00\x00\x00\x01"
    with pytest.raises(ValueError, match="references PPS"):
        M.avc_slice_features(cfg + sc + bad_slice)
    # a non-slice NAL after the config (SEI, type 6)
    with pytest.raises(ValueError, match="unexpected NAL type"):
        M.avc_slice_features(cfg + sc + bytes((0x06, 0xFF)))
    # truncation inside a slice header (cutting only opaque filler is
    # legitimately tolerated — the parse stops at the header's end — so
    # cut into the first slice's header bits)
    raw = M.encode_avc_stream(d)
    with pytest.raises(ValueError):
        M.avc_slice_features(raw[: len(cfg) + 5])


def test_checksum_sensitivity():
    """Flipping bits in the slice NAL region must change the features or
    raise — the checksum really covers the conditional grammar fields."""
    d = 11
    raw = M.encode_avc_stream(d)
    want = M.avc_slice_features(raw)
    cfg_len = len(M.encode_avc_config(d))
    changed = total = 0
    for off in range(cfg_len, len(raw)):
        for xor in (0x01, 0x80):
            total += 1
            b = bytearray(raw)
            b[off] ^= xor
            try:
                got = M.avc_slice_features(bytes(b))
            except ValueError:
                changed += 1
                continue
            if got != want:
                changed += 1
    assert changed > total * 0.5, f"{changed}/{total} slice flips caught"


def test_weighted_tier_population_and_replay():
    """The weighted tier (full pool + pred_weight_table under
    weighted_bipred_idc 1): tables really appear, and every weight
    aggregate equals a direct law replay over the EFFECTIVE l0/l1
    active counts."""
    n_wt = n_lw = n_cw = 0
    for d in DOCS:
        f = M.avc_slice_features(M.encode_avc_weighted_stream(d), weighted=True)
        assert len(f) == 30
        p = M.avc_fixture_params(d)
        exp = [0] * 9
        for s in range(M.avc_n_slices(d)):
            law = M.avc_slice_law(d, s, weighted=True)
            if law["kind"] != 1 or p["bipred"] != 1:
                continue
            ld, cd = M.avc_weight_denoms(d, s)
            exp[0] += 1
            exp[1] += ld + cd
            exp[8] += (1 + s) * (17 * ld + 19 * cd)
            eff = (
                law["l0_active"] if law["ref_override"] else p["l0"],
                law["l1_active"] if law["ref_override"] else p["l1"],
            )
            for x in range(2):
                for i in range(eff[x] + 1):
                    wl = M.avc_weight_law(d, s, x, i)
                    if wl["lw_flag"]:
                        exp[2] += 1
                        exp[3] += wl["lw"]
                        exp[4] += wl["lo"]
                        exp[8] += (
                            (1 + s) * (1 + i) * (2 + x)
                            * (3 * wl["lw"] + 5 * wl["lo"])
                        )
                    if wl["cw_flag"]:
                        for j in range(2):
                            exp[5] += 1
                            exp[6] += wl["cw"][j]
                            exp[7] += wl["co"][j]
                            exp[8] += (
                                (1 + s) * (1 + i) * (2 + x)
                                * (7 * wl["cw"][j] + 11 * wl["co"][j])
                            )
        assert list(f[21:]) == exp, d
        n_wt += exp[0]
        n_lw += exp[2]
        n_cw += exp[5]
    assert n_wt > 20 and n_lw > 50 and n_cw > 100


def test_weighted_tier_conformance_rejections():
    # a doc with bipred 1 whose weighted stream has a B slice
    d = next(
        d for d in range(60)
        if M.avc_fixture_params(d)["bipred"] == 1
        and any(
            M.avc_slice_law(d, s, weighted=True)["kind"] == 1
            for s in range(M.avc_n_slices(d))
        )
    )
    # denom out of range
    with mock.patch.object(M, "avc_weight_denoms", return_value=(9, 0)):
        bad = M.encode_avc_weighted_stream(d)
    with pytest.raises(ValueError, match="denom"):
        M.avc_slice_features(bad, weighted=True)
    # luma weight outside [-128, 127]
    good_wl = M.avc_weight_law(d, 1, 0, 0)
    tampered = dict(good_wl, lw_flag=1, lw=200)
    with mock.patch.object(M, "avc_weight_law", return_value=tampered):
        bad2 = M.encode_avc_weighted_stream(d)
    with pytest.raises(ValueError, match=r"\[-128, 127\]"):
        M.avc_slice_features(bad2, weighted=True)
    # the base tier still loud-rejects weighted-B streams
    with pytest.raises(ValueError, match="pred_weight_table"):
        M.avc_slice_features(M.encode_avc_weighted_stream(d))
