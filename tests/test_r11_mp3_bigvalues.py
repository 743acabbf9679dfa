"""MP3 Layer III big-values decode (round 11, VERDICT r10 item 1):
Huffman decode of the transcribed ISO 11172-3 Table B.7 tables
(1/2/3/5/6 + count1 table A), §2.4.2.7 region splits on the Table B.8
band edges, exact integer round-trips through the independent fixture
writer, structural table self-checks, and fail-closed guards for the
untranscribed table families."""

from __future__ import annotations

import hashlib
import random

import pytest

from duckdb_server_spark.operators.mp3_l3 import (
    _COUNT1_A,
    _HUFF,
    _HUFF_DIM,
    _check_prefix_complete,
    decode_l3_spectral,
    decode_l3_subbands,
    write_l3_fixture,
)


def _expected(pairs, quads):
    out = []
    for x, y, sx, sy in pairs:
        out += [(-x if sx else x), (-y if sy else y)]
    for v, w, x, y, s in quads:
        sgn = -1 if s else 1
        out += [sgn * v, sgn * w, sgn * x, sgn * y]
    return out


# --- structural table validation ----------------------------------------------


def test_tables_prefix_free_and_complete():
    # re-run the import-time check explicitly so a future edit that
    # bypasses module import still gets caught here
    for tab in _HUFF.values():
        _check_prefix_complete(list(tab.values()))
    _check_prefix_complete(list(_COUNT1_A.values()))


def test_validator_rejects_incomplete_table():
    with pytest.raises(AssertionError, match="Kraft"):
        _check_prefix_complete([(1, 1), (3, 1)])


def test_validator_rejects_prefix_violation():
    # Kraft == 1 but 0 is a prefix of 00/01 spellings
    with pytest.raises(AssertionError):
        _check_prefix_complete([(1, 0), (2, 1), (2, 0), (2, 3)])


def test_table_dimensions():
    # rounds 11 + 12: the small tables plus the 6x6/8x8 mid-amplitude set
    assert _HUFF_DIM == {1: 1, 2: 2, 3: 2, 5: 3, 6: 3,
                         7: 5, 8: 5, 9: 5, 10: 7, 11: 7, 12: 7}
    assert set(_COUNT1_A) == set(range(16))


# round 12: tables 7-12 landed (test_r12_mp3_tables.py) — checksum
# re-pinned over the enlarged registry
TABLES_SHA256 = (
    "6247a985510705b955023ba67aaefbd5f9463ef1eeeb689119a72436a4f5e64b"
)


def test_table_checksum_artifact():
    # the vp8_tables.py audit playbook: the committed checksum makes any
    # future transcription correction a visible one-line diff
    blob = repr(sorted(_HUFF.items())) + repr(sorted(_COUNT1_A.items()))
    digest = hashlib.sha256(blob.encode()).hexdigest()
    assert digest == TABLES_SHA256


# --- exact integer round-trips --------------------------------------------------


@pytest.mark.parametrize("tab", sorted(_HUFF))
def test_round_trip_every_table(tab):
    rng = random.Random(100 + tab)
    dim = _HUFF_DIM[tab]
    for _ in range(30):
        pairs = []
        for _ in range(rng.randrange(0, 12)):
            x, y = rng.randrange(dim + 1), rng.randrange(dim + 1)
            pairs.append((x, y, rng.randrange(2) if x else 0,
                          rng.randrange(2) if y else 0))
        quads = []
        for _ in range(rng.randrange(0, 4)):
            v, w, x, y = (rng.randrange(2) for _ in range(4))
            quads.append((v, w, x, y,
                          rng.randrange(2) if (v or w or x or y) else 0))
        c1t = rng.randrange(2)
        blob = write_l3_fixture(
            [quads, []], granule_pairs=[pairs, []],
            table_select=(tab, tab, tab), region_counts=(2, 3),
            count1table=c1t,
        )
        fr = decode_l3_spectral(blob)[0]
        g = fr["granules"][0]
        want = _expected(pairs, quads)
        assert g["is"][: len(want)] == want
        assert all(v == 0 for v in g["is"][len(want):])
        assert g["big_values"] == len(pairs)
        assert g["count1table_select"] == c1t


def test_region_split_uses_different_tables():
    # region_counts (0,0) at 44.1k: region0 = lines 0-3 (pairs 0-1,
    # table 1), region1 = lines 4-7 (pairs 2-3, table 5), region2 =
    # the rest (table 2)
    pairs = [(1, 0, 0, 0), (1, 1, 1, 0), (3, 2, 0, 1), (2, 3, 1, 1),
             (2, 0, 1, 0), (0, 2, 0, 0)]
    blob = write_l3_fixture(
        [[], []], granule_pairs=[pairs, []],
        table_select=(1, 5, 2), region_counts=(0, 0),
    )
    fr = decode_l3_spectral(blob)[0]
    g = fr["granules"][0]
    assert g["is"][:12] == _expected(pairs, [])
    assert g["table_select"] == [1, 5, 2]


def test_table0_region_decodes_zero_pairs_without_bits():
    # table 0 carries no data: the region's pairs are implicit zeros
    pairs = [(0, 0, 0, 0)] * 2 + [(1, 1, 0, 1)]
    blob = write_l3_fixture(
        [[], []], granule_pairs=[pairs, []],
        table_select=(0, 1, 1), region_counts=(0, 0),
    )
    fr = decode_l3_spectral(blob)[0]
    assert fr["granules"][0]["is"][:6] == [0, 0, 0, 0, 1, -1]
    # 2 pairs x 0 bits + one table-1 (1,1) codeword (3 bits) + 2 signs
    assert fr["granules"][0]["part2_3_length"] == 5


def test_count1_table_a_bit_accounting():
    # (1,0,0,1) pattern 0b1001 codes in 5 bits + 2 sign bits
    blob = write_l3_fixture([[(1, 0, 0, 1, 0)], []], count1table=0)
    fr = decode_l3_spectral(blob)[0]
    g = fr["granules"][0]
    assert g["part2_3_length"] == 5 + 2
    assert g["is"][:4] == [1, 0, 0, 1]
    assert g["count1table_select"] == 0


def test_both_granules_mixed_shapes():
    blob = write_l3_fixture(
        [[(1, 1, 0, 0, 1)], [(0, 0, 1, 0, 0)]],
        granule_pairs=[[(1, 0, 1, 0)], [(0, 1, 0, 1), (1, 1, 0, 0)]],
        table_select=(1, 1, 1),
    )
    fr = decode_l3_spectral(blob)[0]
    g1, g2 = fr["granules"]
    assert g1["is"][:6] == [-1, 0, -1, -1, 0, 0]
    assert g2["is"][:8] == [0, -1, 1, 1, 0, 0, 1, 0]


def test_subbands_energy_with_big_values():
    blob = write_l3_fixture(
        [[], []], granule_pairs=[[(3, 2, 0, 1)], [(1, 1, 1, 0)]],
        table_select=(5, 1, 1),
    )
    sb = decode_l3_subbands(blob)
    assert sum(sum(v * v for v in s) for s in sb["subbands"]) > 0


def test_mid_codeword_exhaustion_fails_closed():
    blob = bytearray(write_l3_fixture(
        [[], []], granule_pairs=[[(3, 3, 0, 0)], []],
        table_select=(5, 5, 5),
    ))
    # shrink granule-1 part2_3_length (12 bits at side-info bit 18) to 3
    si = bytearray(blob[4:21])
    for bit in range(18, 30):
        si[bit // 8] &= ~(1 << (7 - bit % 8))
    for k in range(12):
        if (3 >> (11 - k)) & 1:
            bit = 18 + k
            si[bit // 8] |= 1 << (7 - bit % 8)
    blob[4:21] = si
    with pytest.raises(ValueError):
        decode_l3_spectral(bytes(blob))


def test_writer_rejects_out_of_dim_pair():
    with pytest.raises(ValueError, match="dimension"):
        write_l3_fixture(
            [[], []], granule_pairs=[[(2, 0, 0, 0)], []],
            table_select=(1, 1, 1),
        )


def test_writer_rejects_untranscribed_table():
    with pytest.raises(ValueError, match="not transcribed"):
        write_l3_fixture(
            [[], []], granule_pairs=[[(1, 0, 0, 0)], []],
            table_select=(13, 13, 13),
        )


PINNED_BIGVALUES_SHA256 = (
    "65739f5fabc186ed066a73ec1bcb2a021ba418c2bb936f9c82f11a451ccd3302"
)


def test_bigvalues_fixture_bytes_pinned():
    blob = write_l3_fixture(
        [[(1, 0, 1, 1, 0)], [(1, 1, 1, 1, 1)]],
        granule_pairs=[[(1, 0, 1, 0), (0, 1, 0, 1)], [(3, 2, 0, 1)]],
        table_select=(5, 1, 1), region_counts=(0, 0),
        count1table=0,
    )
    assert hashlib.sha256(blob).hexdigest() == PINNED_BIGVALUES_SHA256


@pytest.mark.parametrize("sr_idx,rate", [(1, 48000), (2, 32000)])
def test_other_sample_rates_use_their_band_edges(sr_idx, rate):
    # region_counts (0,0): region 0 ends at edges[1] = 4 lines at every
    # rate, but region 1 ends at edges[2]=8 and region 2 begins there —
    # give regions different tables so a wrong edge table mis-decodes
    from duckdb_server_spark.operators.mp3_l3 import SFB_LONG

    pairs = [(1, 0, 0, 0), (0, 1, 0, 1), (3, 3, 1, 1), (2, 1, 0, 0),
             (0, 2, 0, 1), (1, 2, 1, 0)]
    blob = write_l3_fixture(
        [[], []], granule_pairs=[pairs, []],
        table_select=(1, 5, 3), region_counts=(0, 0), sr_idx=sr_idx,
    )
    fr = decode_l3_spectral(blob)[0]
    assert fr["sample_rate"] == rate
    assert fr["granules"][0]["is"][:12] == _expected(pairs, [])
    assert SFB_LONG[rate][2] == 8


def test_requantize_band_edges_per_rate():
    # line 88 sits in band 13 at 48 kHz (edges 88-106) but band 12 at
    # 44.1 kHz (74-90) and 32 kHz (84-102): a rate-blind band map gives
    # the wrong scalefactor gain
    from duckdb_server_spark.operators.mp3_l3 import _band_of, SFB_LONG

    assert _band_of(88, SFB_LONG[48000]) == 13
    assert _band_of(88, SFB_LONG[44100]) == 12
    assert _band_of(88, SFB_LONG[32000]) == 12
    assert _band_of(575, SFB_LONG[44100]) == 21
    assert _band_of(0, SFB_LONG[48000]) == 0


# --- bit reservoir (round 11: main_data_begin > 0 decodes) ---------------------


def test_reservoir_two_frames_round_trip():
    from duckdb_server_spark.operators.mp3_l3 import (
        write_l3_reservoir_stream,
    )

    specs = [
        {"granule_quads": [[(1, 0, 0, 1, 0)], [(1, 1, 0, 0, 1)]]},
        {"granule_quads": [[(0, 1, 1, 0, 1)], []],
         "granule_pairs": [[(1, 1, 0, 1)], []],
         "table_select": (1, 1, 1)},
    ]
    frames = decode_l3_spectral(write_l3_reservoir_stream(specs))
    f1, f2 = frames
    assert f1["main_data_begin"] == 0 and f2["main_data_begin"] > 0
    assert f1["granules"][0]["is"][:4] == [1, 0, 0, 1]
    assert f2["granules"][0]["is"][:6] == [1, -1, 0, -1, -1, 0]


def test_reservoir_fuzz_multi_frame():
    from duckdb_server_spark.operators.mp3_l3 import (
        write_l3_reservoir_stream,
    )

    rng = random.Random(1177)
    for _ in range(15):
        n = rng.randrange(2, 5)
        specs = []
        for _ in range(n):
            quads = [
                tuple(rng.randrange(2) for _ in range(5))
                for _ in range(rng.randrange(6))
            ]
            quads = [(v, w, x, y, s if (v or w or x or y) else 0)
                     for v, w, x, y, s in quads]
            specs.append({"granule_quads": [quads[:3], quads[3:]]})
        frames = decode_l3_spectral(write_l3_reservoir_stream(specs))
        assert len(frames) == n
        assert any(fr["main_data_begin"] > 0 for fr in frames[1:])
        for fr, spec in zip(frames, specs):
            for g, quads in zip(fr["granules"], spec["granule_quads"]):
                want = _expected([], quads)
                assert g["is"][: len(want)] == want


def test_reservoir_pool_caps_at_511():
    from duckdb_server_spark.operators.mp3_l3 import (
        write_l3_reservoir_stream,
    )

    # 8 near-empty frames: the logical stream stays tiny while physical
    # slots accumulate — main_data_begin would exceed 511 around frame
    # 7 (83-byte slots); the writer must reject rather than emit an
    # unrepresentable offset
    specs = [{"granule_quads": [[(1, 1, 1, 1, 0)], []]} for _ in range(8)]
    with pytest.raises(ValueError, match="9-bit"):
        write_l3_reservoir_stream(specs)


def test_self_contained_writer_unchanged():
    # the reservoir packer reuses the single-frame writer; the pinned
    # fixture hash (test_bigvalues_fixture_bytes_pinned) plus this
    # mdb=0 equivalence pin that the self-contained path is byte-stable
    from duckdb_server_spark.operators.mp3_l3 import (
        write_l3_reservoir_stream,
    )

    single = write_l3_fixture([[(1, 0, 1, 1, 0)], []])
    via_stream = write_l3_reservoir_stream(
        [{"granule_quads": [[(1, 0, 1, 1, 0)], []]}]
    )
    assert via_stream == single


def test_scfsi_shares_granule1_scalefactors():
    # scfsi groups (bands 0-5 / 6-10 / 11-15 / 16-20): with groups 0
    # and 2 shared, granule 2 writes only the OTHER bands' bits and the
    # decoder must copy granule 1's values into the shared bands
    sf = [(i * 3) % 2 for i in range(21)]
    blob = write_l3_fixture(
        [[(1, 0, 0, 0, 0)], [(0, 1, 0, 0, 1)]],
        scalefac_compress=5,  # slen (1, 1): every band carries one bit
        scalefacs=sf,
        scfsi=(1, 0, 1, 0),
    )
    fr = decode_l3_spectral(blob)[0]
    g1, g2 = fr["granules"]
    assert g1["scalefacs"] == sf and g2["scalefacs"] == sf
    # granule 2's part2_3 skips the 6 + 5 shared one-bit scalefactors
    assert g1["part2_3_length"] == 21 + 4 + 1
    assert g2["part2_3_length"] == (21 - 11) + 4 + 1  # one sign bit
    assert g2["is"][:4] == [0, -1, 0, 0]


def test_scfsi_zero_is_byte_identical_to_default():
    a = write_l3_fixture([[(1, 1, 1, 1, 0)], []], scalefac_compress=5,
                         scalefacs=[1] * 21)
    b = write_l3_fixture([[(1, 1, 1, 1, 0)], []], scalefac_compress=5,
                         scalefacs=[1] * 21, scfsi=(0, 0, 0, 0))
    assert a == b


# --- two-channel frames (round 11: stereo/dual decode at the integer layer) ----


def test_stereo_round_trip():
    from duckdb_server_spark.operators.mp3_l3 import (
        write_l3_stereo_fixture,
    )

    grans = [
        [[(1, 0, 0, 1, 0)], [(0, 1, 1, 0, 1)]],
        [[(1, 1, 1, 1, 1)], []],
    ]
    fr = decode_l3_spectral(write_l3_stereo_fixture(grans))[0]
    assert fr["channels"] == 2 and len(fr["granules"]) == 4
    by = {(g["granule"], g["channel"]): g for g in fr["granules"]}
    assert by[(0, 0)]["is"][:4] == [1, 0, 0, 1]
    assert by[(0, 1)]["is"][:4] == [0, -1, -1, 0]
    assert by[(1, 0)]["is"][:4] == [-1, -1, -1, -1]
    assert all(v == 0 for v in by[(1, 1)]["is"])


def test_stereo_fuzz_and_dual_mode():
    from duckdb_server_spark.operators.mp3_l3 import (
        write_l3_stereo_fixture,
    )

    rng = random.Random(2199)
    for _ in range(12):
        grans = []
        for _ in range(2):
            chans = []
            for _ in range(2):
                quads = [
                    tuple(rng.randrange(2) for _ in range(5))
                    for _ in range(rng.randrange(5))
                ]
                quads = [(v, w, x, y, s if (v or w or x or y) else 0)
                         for v, w, x, y, s in quads]
                chans.append(quads)
            grans.append(chans)
        mode = rng.choice((0, 2))
        fr = decode_l3_spectral(
            write_l3_stereo_fixture(grans, mode=mode)
        )[0]
        for cg in fr["granules"]:
            want = _expected([], grans[cg["granule"]][cg["channel"]])
            assert cg["is"][: len(want)] == want


def test_joint_stereo_fails_closed():
    from duckdb_server_spark.operators.mp3_l3 import (
        write_l3_stereo_fixture,
    )

    blob = bytearray(write_l3_stereo_fixture([[[], []], [[], []]]))
    blob[3] = 0x40  # mode 1 = joint stereo
    with pytest.raises(NotImplementedError, match="joint"):
        decode_l3_spectral(bytes(blob))


def test_subbands_rejects_stereo():
    from duckdb_server_spark.operators.mp3_l3 import (
        write_l3_stereo_fixture,
    )

    with pytest.raises(NotImplementedError, match="mono"):
        decode_l3_subbands(
            write_l3_stereo_fixture([[[], []], [[], []]])
        )
