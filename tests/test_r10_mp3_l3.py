"""MPEG-1 Layer III granule decode (round 10, VERDICT r9 item 3):
count1-region subset with an independent fixture writer, exact integer
spectral round-trips, the float IMDCT path's silence-zero invariant,
byte-pinned wire stability, and fail-closed guards for every
out-of-subset stream shape (corrupt frames never produce garbage)."""

from __future__ import annotations

import hashlib
import random

import pytest

from duckdb_server_spark.operators.mp3_l3 import (
    SLEN,
    decode_l3_spectral,
    decode_l3_subbands,
    decode_mp3_pcm,
    write_l3_fixture,
)


def _expected_lines(quads):
    out = []
    for v, w, x, y, s in quads:
        sgn = -1 if s else 1
        out += [sgn * v, sgn * w, sgn * x, sgn * y]
    return out


def test_side_info_is_17_bytes_and_parses():
    blob = write_l3_fixture([[(1, 0, 0, 1, 0)], []])
    fr = decode_l3_spectral(blob)[0]
    assert fr["main_data_begin"] == 0
    g1, g2 = fr["granules"]
    assert g1["part2_3_length"] == 4 + 2  # one quad + two sign bits
    assert g2["part2_3_length"] == 0
    assert g1["count1table_select"] == 1 and g1["big_values"] == 0


def test_spectral_round_trip_exact():
    rng = random.Random(1011)
    for _ in range(25):
        gq = [
            [
                tuple(rng.randrange(2) for _ in range(5))
                for _ in range(rng.randrange(6))
            ]
            for _ in range(2)
        ]
        blob = write_l3_fixture(gq)
        fr = decode_l3_spectral(blob)[0]
        for g, quads in zip(fr["granules"], gq):
            want = _expected_lines(quads)
            assert g["is"][: len(want)] == want
            assert all(v == 0 for v in g["is"][len(want) :])


def test_multi_frame_stream():
    blob = write_l3_fixture([[(1, 1, 1, 1, 0)], []]) + write_l3_fixture(
        [[], [(0, 1, 0, 1, 1)]]
    )
    frames = decode_l3_spectral(blob)
    assert len(frames) == 2
    assert sum(frames[0]["granules"][0]["is"]) == 4
    assert sum(frames[1]["granules"][1]["is"]) == -2


def test_silence_decodes_to_exact_zero_subbands():
    sb = decode_l3_subbands(write_l3_fixture([[], []]))
    assert all(all(v == 0.0 for v in s) for s in sb["subbands"])
    assert len(sb["subbands"]) == 32
    assert len(sb["subbands"][0]) == 36  # 2 granules x 18 samples


def test_tone_has_energy_and_overlap_add_continuity():
    blob = write_l3_fixture([[(1, 0, 0, 0, 0)], [(1, 0, 0, 0, 0)]])
    sb = decode_l3_subbands(blob)
    energy = sum(sum(v * v for v in s) for s in sb["subbands"])
    assert energy > 0
    # spectral line 0 lives in subband 0: other subbands stay silent
    assert all(
        all(v == 0.0 for v in sb["subbands"][k]) for k in range(1, 32)
    )


def test_pcm_fails_closed_naming_the_plug_point():
    with pytest.raises(NotImplementedError, match="B.3"):
        decode_mp3_pcm(write_l3_fixture([[], []]))


def test_slen_table_shape():
    assert len(SLEN) == 16 and SLEN[0] == (0, 0) and SLEN[15] == (4, 3)


# --- fail-closed guards --------------------------------------------------------


def test_big_values_decodes_since_round_11():
    # round 11 removed the big_values fail-close: with table_select 0
    # (the all-zero table) a flipped big_values bit decodes to zeros
    blob = bytearray(write_l3_fixture([[], []]))
    # side info starts at byte 4; big_values for granule 1 sits at bits
    # 18+12+... — flip a bit inside the granule-1 big_values field
    # (bits 30..38 of the side info): set its LSB (bit 38 → byte 8 bit 6)
    blob[4 + 4] |= 0x02
    fr = decode_l3_spectral(bytes(blob))[0]
    assert fr["granules"][0]["big_values"] == 1
    assert all(v == 0 for v in fr["granules"][0]["is"])


def test_untranscribed_table_fails_closed():
    from duckdb_server_spark.operators.mp3_l3 import _HUFF

    blob = write_l3_fixture(
        [[], []],
        granule_pairs=[[(1, 0, 0, 0)], []],
        table_select=(1, 1, 1),
    )
    b = bytearray(blob)
    # granule-1 table_select[0] is the 5 bits at side-info offset
    # 18 + 12+9+8+4+1 = 52: rewrite table 1 -> 16 (linbits family)
    si = bytearray(b[4:21])
    for k in range(5):
        bit = 52 + k
        si[bit // 8] &= ~(1 << (7 - bit % 8))
    val = 16
    for k in range(5):
        if (val >> (4 - k)) & 1:
            bit = 52 + k
            si[bit // 8] |= 1 << (7 - bit % 8)
    b[4:21] = si
    with pytest.raises(NotImplementedError, match="not\\s+transcribed"):
        decode_l3_spectral(bytes(b))
    assert 16 not in _HUFF


def test_invalid_table_4_fails_closed():
    blob = write_l3_fixture(
        [[], []],
        granule_pairs=[[(1, 0, 0, 0)], []],
        table_select=(1, 1, 1),
    )
    b = bytearray(blob)
    si = bytearray(b[4:21])
    for k in range(5):
        bit = 52 + k
        si[bit // 8] &= ~(1 << (7 - bit % 8))
    val = 4
    for k in range(5):
        if (val >> (4 - k)) & 1:
            bit = 52 + k
            si[bit // 8] |= 1 << (7 - bit % 8)
    b[4:21] = si
    with pytest.raises(ValueError, match="not a valid B.7"):
        decode_l3_spectral(bytes(b))


def test_reservoir_underrun_fails_closed():
    # round 11: the bit reservoir DECODES (write_l3_reservoir_stream);
    # a main_data_begin pointing past the buffered pool — a truncated
    # or mid-stream start — fails closed instead of mis-decoding
    blob = bytearray(write_l3_fixture([[], []]))
    blob[4] |= 0x80  # main_data_begin MSB on the FIRST frame
    with pytest.raises(ValueError, match="reservoir underrun"):
        decode_l3_spectral(bytes(blob))


def test_window_switching_fails_closed():
    blob = bytearray(write_l3_fixture([[], []]))
    # granule-1 window_switching flag: side-info bit 18+12+9+8+4 = 51
    blob[4 + 51 // 8] |= 1 << (7 - 51 % 8)
    with pytest.raises(NotImplementedError, match="short/mixed"):
        decode_l3_spectral(bytes(blob))


def test_mono_frame_with_stereo_mode_bit_fails_on_side_info():
    # round 11: stereo DECODES (write_l3_stereo_fixture) — but a frame
    # whose header claims stereo while carrying a 17-byte mono side
    # info must fail on the malformed layout, not mis-decode
    blob = bytearray(write_l3_fixture([[(1, 1, 1, 1, 0)] * 3, []]))
    blob[3] = 0x00  # mode = stereo over a mono-layout body
    with pytest.raises((ValueError, NotImplementedError)):
        decode_l3_spectral(bytes(blob))


def test_truncated_frame_fails_closed():
    blob = write_l3_fixture([[(1, 1, 1, 1, 0)], []])
    with pytest.raises(ValueError):
        decode_l3_spectral(blob[:20])


def test_overrun_part23_fails_closed():
    blob = bytearray(write_l3_fixture([[(1, 0, 0, 0, 0)], []]))
    # shrink granule-1 part2_3_length (12 bits at side-info bit 18) to 3:
    # mid-quadruple exhaustion must raise, not mis-decode
    # bits 18..29 → clear, then set to 3
    si = bytearray(blob[4:21])
    for bit in range(18, 30):
        si[bit // 8] &= ~(1 << (7 - bit % 8))
    val = 3
    for k in range(12):
        if (val >> (11 - k)) & 1:
            bit = 18 + k
            si[bit // 8] |= 1 << (7 - bit % 8)
    blob[4:21] = si
    with pytest.raises(ValueError, match="overran"):
        decode_l3_spectral(bytes(blob))


PINNED_FIXTURE_SHA256 = (
    "b74bff2c686a13a4574ffc229f37cf69ea05f37139bbdee0dc89e4ce9fd601fe"
)


def test_fixture_bytes_pinned():
    # wire-format stability pin (the VP8 playbook): deterministic input
    # -> committed hash; a table/convention correction re-pins this
    # alongside the module's confidence note.
    blob = write_l3_fixture(
        [[(1, 0, 1, 1, 0), (0, 0, 0, 0, 0)], [(1, 1, 1, 1, 1)]]
    )
    assert hashlib.sha256(blob).hexdigest() == PINNED_FIXTURE_SHA256


def test_scalefactors_decode_and_bit_accounting():
    # scalefac_compress 5 -> slen (1, 1): 21 one-bit scalefactors per
    # granule, counted inside part2_3_length ahead of the Huffman data
    sf = [i % 2 for i in range(21)]
    blob = write_l3_fixture(
        [[(1, 0, 0, 0, 0)], [(0, 1, 1, 0, 1)]],
        scalefac_compress=5,
        scalefacs=sf,
    )
    fr = decode_l3_spectral(blob)[0]
    g1, g2 = fr["granules"]
    assert g1["scalefacs"] == sf and g2["scalefacs"] == sf
    assert g1["part2_3_length"] == 21 + 4 + 1  # sf + quad + one sign
    assert g2["part2_3_length"] == 21 + 4 + 2
    assert g1["is"][:4] == [1, 0, 0, 0]
    assert g2["is"][:4] == [0, -1, -1, 0]


def test_scalefactors_wider_slen_pair():
    # scalefac_compress 15 -> slen (4, 3)
    sf = [(3 * i) % 8 for i in range(21)]
    blob = write_l3_fixture([[], []], scalefac_compress=15, scalefacs=sf)
    fr = decode_l3_spectral(blob)[0]
    assert fr["granules"][0]["scalefacs"] == sf
    assert fr["granules"][0]["part2_3_length"] == 11 * 4 + 10 * 3


def test_scalefactor_field_overflow_rejected():
    with pytest.raises(ValueError, match="exceeds"):
        write_l3_fixture([[], []], scalefac_compress=5,
                         scalefacs=[2] + [0] * 20)
