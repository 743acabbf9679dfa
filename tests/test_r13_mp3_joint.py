"""Round 13 (VERDICT r12 "same class" item): MP3 joint-stereo FLOAT
reconstruction — both modes are formula-defined in ISO 11172-3 (no
value table, so the ESC-table exact-recall risk does not apply):

* MS (§2.4.3.4.9.2): L = (M+S)/√2, R = (M−S)/√2 on requantized
  spectra;
* intensity (§2.4.3.4.9.3): ratio = tan(is_pos·π/12),
  L = val·ratio/(1+ratio), R = val/(1+ratio); is_pos 6 → (val, 0)
  exactly; is_pos 7 (illegal/reserved) → the common fallback,
  flagged moderate-confidence in the module note.

The default integer-layer decode still fail-closes on mode 1 (M/S
integers are not L/R); the census routes mode-1 through the joint
path and counts it decoded.
"""

from __future__ import annotations

import math

import pytest

from duckdb_server_spark.operators.mp3_l3 import (
    SFB_LONG,
    _band_of,
    decode_l3_joint_float,
    decode_l3_spectral,
    write_l3_stereo_fixture,
)


def _quads(cs: bytes):
    return [((c >> 3) & 1, (c >> 2) & 1, (c >> 1) & 1, c & 1,
             (c >> 6) & 1) for c in cs]


def _signed_lines(cs: bytes):
    out = []
    for c in cs:
        for b in (3, 2, 1, 0):
            out.append(((c >> b) & 1) * (-1 if (c >> 6) & 1 else 1))
    return out


def test_ms_matrix_exact():
    cs = b"Hal!"
    blob = write_l3_stereo_fixture(
        [[_quads(cs), _quads(cs[::-1])],
         [_quads(cs[::-1]), _quads(cs)]],
        mode=1, mode_extension=2, global_gain=212,
    )
    fr = decode_l3_joint_float(blob)[0]
    assert fr["mode"] == 1 and fr["mode_extension"] == 2
    g = fr["granule_channels"][0]
    mult = 2.0 ** 0.5
    m = _signed_lines(cs)
    s = _signed_lines(cs[::-1])
    for i in range(16):
        assert g["left"][i] == (m[i] * mult + s[i] * mult) / math.sqrt(2.0)
        assert g["right"][i] == (m[i] * mult - s[i] * mult) / math.sqrt(2.0)
    # granule 1 swaps the channels' quads
    g1 = fr["granule_channels"][1]
    for i in range(16):
        assert g1["left"][i] == (s[i] * mult + m[i] * mult) / math.sqrt(2.0)


def test_intensity_ratios_exact():
    cs = b"Hal!"
    sf1 = [cs[b % 4] % 7 for b in range(11)] + [0] * 10
    blob = write_l3_stereo_fixture(
        [[_quads(cs), []], [_quads(cs), []]],
        mode=1, mode_extension=1, global_gain=210,
        scalefac_compress=4, scalefacs=[[0] * 21, sf1],
    )
    fr = decode_l3_joint_float(blob)[0]
    g = fr["granule_channels"][0]
    assert g["intensity_bound"] == 0  # right channel silent
    edges = SFB_LONG[44100]
    m = _signed_lines(cs)
    for i in range(16):
        is_pos = sf1[_band_of(i, edges)]
        val = float(m[i])
        if is_pos == 6:
            assert g["left"][i] == val and g["right"][i] == 0.0
        else:
            ratio = math.tan(is_pos * (math.pi / 12.0))
            assert g["left"][i] == val * (ratio / (1.0 + ratio))
            assert g["right"][i] == val * (1.0 / (1.0 + ratio))


def test_is_pos_six_limit_and_seven_fallback():
    cs = b"\x4f\x00\x00\x00"  # one negative line at position 0
    # is_pos 6 in band 0 → (val, 0) exactly
    sf6 = [6] + [0] * 20
    blob = write_l3_stereo_fixture(
        [[_quads(cs), []], [_quads(cs), []]],
        mode=1, mode_extension=1,
        scalefac_compress=4, scalefacs=[[0] * 21, sf6],
    )
    g = decode_l3_joint_float(blob)[0]["granule_channels"][0]
    assert g["left"][0] == -1.0 and g["right"][0] == 0.0
    # is_pos 7 (illegal) without MS → plain L/R fallback
    sf7 = [7] + [0] * 20
    blob7 = write_l3_stereo_fixture(
        [[_quads(cs), []], [_quads(cs), []]],
        mode=1, mode_extension=1,
        scalefac_compress=4, scalefacs=[[0] * 21, sf7],
    )
    g7 = decode_l3_joint_float(blob7)[0]["granule_channels"][0]
    assert g7["left"][0] == -1.0 and g7["right"][0] == 0.0


def test_intensity_bound_follows_right_channel():
    cs = b"\xff\x00\x00\x00"
    # right channel has nonzero lines 0..3 → bound at the next band
    blob = write_l3_stereo_fixture(
        [[_quads(cs), _quads(b"\x0f\x00\x00\x00")],
         [_quads(cs), _quads(b"\x0f\x00\x00\x00")]],
        mode=1, mode_extension=1,
        scalefac_compress=4, scalefacs=[[0] * 21, [3] * 11 + [0] * 10],
    )
    g = decode_l3_joint_float(blob)[0]["granule_channels"][0]
    # rzero = 4 → first band edge ≥ 4 is 4 (band 1 start)
    assert g["intensity_bound"] == 4
    # below the bound: plain L/R (no MS bit) — 0xff's sign bit is set
    # (negative M); the right channel's scalefactor (3) is a REAL
    # scalefactor below the bound (is_pos only above), so S
    # requantizes to 2^(-1.5)
    assert g["left"][0] == -1.0
    assert g["right"][0] == 2.0 ** -1.5


def test_plain_stereo_passthrough_and_mono_guard():
    cs = b"Hal!"
    blob = write_l3_stereo_fixture(
        [[_quads(cs), _quads(cs[::-1])],
         [_quads(cs), _quads(cs[::-1])]],
        mode=0,
    )
    fr = decode_l3_joint_float(blob)[0]
    g = fr["granule_channels"][0]
    m = _signed_lines(cs)
    s = _signed_lines(cs[::-1])
    for i in range(16):
        assert g["left"][i] == float(m[i])
        assert g["right"][i] == float(s[i])

    from duckdb_server_spark.operators.mp3_l3 import write_l3_fixture

    mono = write_l3_fixture([_quads(cs), _quads(cs[::-1])])
    with pytest.raises(ValueError, match="2-channel"):
        decode_l3_joint_float(mono)


def test_default_integer_layer_still_fail_closed():
    cs = b"Hal!"
    blob = write_l3_stereo_fixture(
        [[_quads(cs), _quads(cs)], [_quads(cs), _quads(cs)]],
        mode=1, mode_extension=2,
    )
    with pytest.raises(NotImplementedError, match="M/S-coded"):
        decode_l3_spectral(blob)
    # the opt-in raw layer decodes and annotates the mode
    frames = decode_l3_spectral(blob, joint_stereo=True)
    assert frames[0]["mode"] == 1
    assert frames[0]["mode_extension"] == 2
    assert len(frames[0]["granules"]) == 4
