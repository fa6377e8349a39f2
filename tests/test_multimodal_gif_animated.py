"""Animated GIF89a tier (r13, operators/multimodal.py): NETSCAPE loop
extension, GCE grammar, per-frame local color tables (active-palette
routing), transparency exclusion, sub-rectangle geometry bounds, and
loud rejections. Bit-level checks the SQL oracle can't see; value-law
parity is the oracle's job (sweep-gated)."""

from __future__ import annotations

import struct

import pytest

from flink_dts_connector_spark.operators import multimodal as M

DOCS = list(range(160)) + [499, 999, 4999, 12345, 49999]


def test_population_and_replay():
    tot = dict(local=0, transp=0, d2=0, loops=set())
    for d in DOCS:
        raw = M.encode_gif_animated(d)
        f = M.gif_animated_features(raw)
        p = M.gif_anim_params(d)
        assert f[0] == p["n_frames"] and f[1] == p["loop"]
        assert f[12] == len(raw)
        tot["local"] += f[3]
        tot["transp"] += f[7]
        tot["d2"] += f[4]
        tot["loops"].add(f[1])
    assert tot["local"] > 100 and tot["d2"] > 100
    assert tot["transp"] > 5  # transparency really fires in the population
    assert tot["loops"] == {0, 1, 2, 3}


def test_local_palette_actually_routes():
    """A frame with a local table must produce different channel sums
    than the same indexes through the global table — otherwise the
    active-palette logic is untestable."""
    diffs = 0
    for d in DOCS[:60]:
        for k in range(M.gif_anim_params(d)["n_frames"]):
            law = M.gif_anim_frame_law(d, k)
            if not law["local"]:
                continue
            gsum = lsum = 0
            for y in range(law["h"]):
                for x in range(law["w"]):
                    i = M.gif_anim_index(d, k, x, y)
                    gsum += sum(M._gif_palette(i))
                    lsum += sum(M._gif_local_palette(k, i))
            diffs += gsum != lsum
    assert diffs > 40


def test_frames_fit_logical_screen():
    sw, sh = M.GIF_ANIM_SCREEN
    for d in DOCS:
        for k in range(M.gif_anim_params(d)["n_frames"]):
            law = M.gif_anim_frame_law(d, k)
            assert law["left"] + law["w"] <= sw
            assert law["top"] + law["h"] <= sh


def test_loud_rejections():
    d = 9
    raw = M.encode_gif_animated(d)
    # GIF87a signature is not an animation
    b = bytearray(raw)
    b[4] = ord("7")
    with pytest.raises(ValueError, match="GIF89a"):
        M.gif_animated_features(bytes(b))
    # missing trailer
    with pytest.raises(ValueError):
        M.gif_animated_features(raw[:-1])
    # corrupt the NETSCAPE identifier
    b = bytearray(raw)
    app_off = 13 + 3 * 256
    assert raw[app_off : app_off + 2] == b"\x21\xff"
    b[app_off + 3] ^= 0xFF
    with pytest.raises(ValueError, match="application extension"):
        M.gif_animated_features(bytes(b))
    # GCE block size tamper
    b = bytearray(raw)
    gce_off = app_off + 19
    assert raw[gce_off : gce_off + 2] == b"\x21\xf9"
    b[gce_off + 2] = 5
    with pytest.raises(ValueError, match="GCE block size"):
        M.gif_animated_features(bytes(b))
    # frame pushed outside the logical screen: bump frame 0's left offset
    b = bytearray(raw)
    img_off = gce_off + 8
    assert raw[img_off] == 0x2C
    b[img_off + 1 : img_off + 3] = struct.pack("<H", 200)
    with pytest.raises(ValueError, match="exceeds the logical screen"):
        M.gif_animated_features(bytes(b))
    # interlace flag on frame 0 (even frame -> no local table bit conflict)
    law0 = M.gif_anim_frame_law(d, 0)
    assert not law0["local"]
    b = bytearray(raw)
    b[img_off + 9] |= 0x40
    with pytest.raises(ValueError, match="interlace"):
        M.gif_animated_features(bytes(b))


def test_lzw_payload_tamper_is_caught():
    """Flipping bits inside a frame's LZW stream must change the sums or
    raise — the pixel path really decodes the entropy stream."""
    d = 11
    raw = M.encode_gif_animated(d)
    want = M.gif_animated_features(raw)
    # locate frame 0's sub-block region: after header+gct+app+gce+desc
    pos = 13 + 3 * 256 + 19 + 8 + 10
    law0 = M.gif_anim_frame_law(d, 0)
    if law0["local"]:
        pos += 3 * 256
    pos += 1  # min code size
    changed = total = 0
    # first sub-block
    ln = raw[pos]
    for off in range(pos + 1, pos + 1 + min(ln, 40)):
        for xor in (0x01, 0x80):
            total += 1
            b = bytearray(raw)
            b[off] ^= xor
            try:
                got = M.gif_animated_features(bytes(b))
            except ValueError:
                changed += 1
                continue
            if got != want:
                changed += 1
    assert changed > total * 0.6, f"{changed}/{total} LZW flips caught"
