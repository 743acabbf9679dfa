"""Round 13: Vorbis STEREO with square-polar channel coupling
(§4.3.5) — the coupling inverse is a pure formula (no value table), so
the fail-closed line retires the same way the mono float layer (b34e)
did. Pins: the four coupling quadrants against the spec casework, the
interleaved type-2 residue layout (classword groups interleave with
their partition data — the writer bug the first differential caught),
setup round-trip of coupling steps, stereo PCM end-to-end, and the
remaining fail-closed subsets (>2 channels).
"""

from __future__ import annotations

import pytest

from duckdb_server_spark.operators.vorbis import (
    Codebook,
    Floor1,
    Residue2,
    decode_ogg_vorbis_pcm,
    decode_vorbis_audio_stereo,
    encode_ogg_vorbis,
    encode_vorbis_audio_stereo,
    encode_vorbis_setup,
    inverse_square_polar,
    parse_vorbis_setup,
)


def _fixture():
    book_a = Codebook(1, 64, [6] * 64)
    book_b = Codebook(
        4, 16, [4] * 16, lookup_type=2, minimum=-3.0, delta=1.0,
        multiplicands=[(e + j) % 8 for e in range(16) for j in range(4)],
    )
    book_c = Codebook(4, 16, [4] * 16)
    books = [book_a, book_b, book_c]
    floor = Floor1([0], [3], [0], multiplier=1, rangebits=6,
                   x_list=[0, 64, 8, 16, 32])
    residue = Residue2(0, 256, 32, 2, 2, cascades=[0, 1],
                       books=[[-1] * 8, [1] + [-1] * 7])
    return books, floor, residue


def _packets(cs: bytes, books, floor, residue):
    pkts = []
    for q in range(3):
        def _posts(sh):
            return [(cs[0] * 5 + 17 * q + sh) % 160 + 16,
                    (cs[1] * 7 + 29 * q + sh) % 160 + 16,
                    (cs[2] + q) % 63 + 1,
                    (cs[3] + 2 * q) % 63 + 1,
                    (cs[4] + 3 * q) % 63 + 1]
        entries = [(cs[t % 6] + t + 13 * q) % 16 for t in range(64)]
        pkts.append(encode_vorbis_audio_stereo(
            [_posts(0), _posts(31)], entries, [15, 15],
            floor, residue, books))
    return pkts


def test_square_polar_quadrants():
    # the §4.3.5 casework, all four quadrants + zero edges
    assert inverse_square_polar(3, 1) == (3, 2)
    assert inverse_square_polar(3, -1) == (2, 3)
    assert inverse_square_polar(-3, 1) == (-3, -2)
    assert inverse_square_polar(-3, -1) == (-2, -3)
    assert inverse_square_polar(0, 0) == (0, 0)
    assert inverse_square_polar(0, 2) == (0, 2)
    assert inverse_square_polar(2, 0) == (2, 2)


def test_setup_coupling_roundtrip():
    books, floor, residue = _fixture()
    setup = parse_vorbis_setup(
        encode_vorbis_setup(books, floor, residue, channels=2,
                            coupling_steps=[(0, 1)]),
        channels=2,
    )
    assert setup["coupling_steps"] == [(0, 1)]
    assert setup["channels"] == 2
    # mono setup still parses with no steps
    mono = parse_vorbis_setup(encode_vorbis_setup(books, floor,
                                                  Residue2(
                                                      0, 128, 32, 2, 2,
                                                      cascades=[0, 1],
                                                      books=[[-1] * 8,
                                                             [1] + [-1] * 7],
                                                  )))
    assert mono["coupling_steps"] == []


def test_interleaved_residue_layout_and_decoupling():
    books, floor, residue = _fixture()
    setup = parse_vorbis_setup(
        encode_vorbis_setup(books, floor, residue, channels=2,
                            coupling_steps=[(0, 1)]),
        channels=2,
    )
    cs = b"hello "
    pkt = _packets(cs, books, floor, residue)[0]
    out = decode_vorbis_audio_stereo(pkt, setup)
    entries = [(cs[t % 6] + t) % 16 for t in range(64)]

    def inter_val(j):
        return float(((entries[j // 4] + (j % 4)) % 8) - 3)

    assert out["residue"][0] == [inter_val(2 * i) for i in range(128)]
    assert out["residue"][1] == [inter_val(2 * i + 1) for i in range(128)]
    for i in range(128):
        m, a = inverse_square_polar(out["residue"][0][i],
                                    out["residue"][1][i])
        assert out["decoupled"][0][i] == m
        assert out["decoupled"][1][i] == a


def test_stereo_pcm_end_to_end():
    books, floor, residue = _fixture()
    payload = encode_ogg_vorbis(
        _packets(b"hello ", books, floor, residue), books, floor,
        residue, channels=2, coupling_steps=[(0, 1)])
    out = decode_ogg_vorbis_pcm(payload)
    assert out["channels"] == 2
    assert out["n_samples"] == 256
    assert len(out["pcm16"][0]) == 256 and len(out["pcm16"][1]) == 256
    assert any(v != 0 for v in out["pcm16"][0])
    assert any(v != 0 for v in out["pcm16"][1])
    # the channels differ (decoupled + shifted floors)
    assert out["pcm16"][0] != out["pcm16"][1]


def test_more_than_two_channels_decodes_since_round_14():
    # round 14 retired the >2-channel guard: a headers-only 6-channel
    # stream decodes to zero samples through the generic per-mode path
    # (tests/test_r14_vorbis_stereo_switching.py carries the payload
    # coverage)
    import struct

    from duckdb_server_spark.operators.ogg import write_stream
    from duckdb_server_spark.operators.vorbis import _common_header

    books, floor, residue = _fixture()
    ident = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([6])
             + struct.pack("<I", 8000) + struct.pack("<iii", 0, 0, 0)
             + bytes([(8 << 4) | 8]) + bytes([1]))
    comment = _common_header(3) + bytes(8) + b"\x01"
    setup = encode_vorbis_setup(books, floor, residue)
    payload = write_stream(0x79, [ident, comment, setup], [0, 0, 0])
    out = decode_ogg_vorbis_pcm(payload)
    assert out["n_samples"] == 0 and out["channels"] == 6


# --- residue types 0/1, mono (round 13 follow-on) ---------------------------

def _mono_books_floor():
    books, floor, _ = _fixture()
    return books, floor


@pytest.mark.parametrize("rtype", [0, 1])
def test_residue_type_01_mono_roundtrip(rtype):
    from duckdb_server_spark.operators.vorbis import (
        Residue0,
        Residue1,
        decode_vorbis_audio,
        encode_vorbis_audio,
    )

    books, floor = _mono_books_floor()
    cls = Residue0 if rtype == 0 else Residue1
    residue = cls(0, 128, 32, 2, 2, cascades=[0, 1],
                  books=[[-1] * 8, [1] + [-1] * 7])
    setup = parse_vorbis_setup(
        encode_vorbis_setup(books, floor, residue))
    assert setup["residue"].TYPE == rtype
    cs = b"hello "
    posts = [(cs[0] * 5) % 160 + 16, (cs[1] * 7) % 160 + 16,
             cs[2] % 63 + 1, cs[3] % 63 + 1, cs[4] % 63 + 1]
    entries = [(cs[t % 6] + t) % 16 for t in range(32)]
    pkt = encode_vorbis_audio(posts, entries, [15], floor, residue,
                              books)
    vec = decode_vorbis_audio(pkt, setup)["residue"]
    exp = [0.0] * 128
    ri = iter(entries)
    for part in range(4):
        off = part * 32
        for w in range(8):
            e = next(ri)
            for j in range(4):
                val = ((e + j) % 8) - 3
                if rtype == 1:
                    exp[off + w * 4 + j] += val
                else:  # type 0: stride psz/dim = 8
                    exp[off + w + j * 8] += val
    assert vec == exp


def test_unknown_residue_type_fails_closed():
    # the parser dispatches through the type registry — exactly 0/1/2
    # decode; anything else raises naming the type
    from duckdb_server_spark.operators.vorbis import _RESIDUE_TYPES

    assert set(_RESIDUE_TYPES) == {0, 1, 2}


def test_stereo_residue_01_fails_closed():
    from duckdb_server_spark.operators.vorbis import (
        Residue0,
        decode_vorbis_audio_stereo,
    )

    books, floor, _ = _fixture()
    residue0 = Residue0(0, 256, 32, 2, 2, cascades=[0, 1],
                        books=[[-1] * 8, [1] + [-1] * 7])
    setup = parse_vorbis_setup(
        encode_vorbis_setup(books, floor, residue0, channels=2,
                            coupling_steps=[(0, 1)]),
        channels=2,
    )
    with pytest.raises(NotImplementedError, match="stereo residue"):
        decode_vorbis_audio_stereo(b"\x00", setup)
