"""Round 13 (VERDICT r12 item 2): Vorbis FULL PCM — the float layer.

The §10.1 floor1 inverse-dB table lands via its closed form
10^((i-255)·7/256) (provenance note at vorbis.py::FLOOR1_INVERSE_DB:
matches the spec's published leading entries to ≤7e-7, sub-PCM16-LSB,
and — unlike MP3's discrete Huffman tables — a continuous amplitude
curve cannot garble decode). The §4.3.1 window and the inverse-MDCT are
formula-defined in the spec, so no exact-recall risk applies anywhere
in this layer. Pins: table provenance values, Princen-Bradley window
identity, IMDCT definition replay, overlap-add framing, PCM16 half-up
quantization, fail-closed stereo / window-switching subsets, and a live
DuckDB differential replaying the whole chain bit-exactly in SQL.
"""

from __future__ import annotations

import math

import pytest

from duckdb_server_spark.operators.vorbis import (
    FLOOR1_INVERSE_DB,
    Codebook,
    Floor1,
    Residue2,
    decode_ogg_vorbis_pcm,
    decode_vorbis_pcm,
    encode_ogg_vorbis,
    encode_vorbis_audio,
    encode_vorbis_setup,
    imdct,
    parse_vorbis_setup,
    pcm16_quantize,
    vorbis_window,
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
    residue = Residue2(0, 128, 32, 2, 2, cascades=[0, 1],
                       books=[[-1] * 8, [1] + [-1] * 7])
    return books, floor, residue


def _packets(cs: bytes, books, floor, residue) -> list[bytes]:
    pkts = []
    for q in range(3):
        posts = [
            (cs[0] * 5 + 17 * q) % 160 + 16,
            (cs[1] * 7 + 29 * q) % 160 + 16,
            (cs[2] + q) % 63 + 1,
            (cs[3] + 2 * q) % 63 + 1,
            (cs[4] + 3 * q) % 63 + 1,
        ]
        entries = [(cs[t % 6] + t + 13 * q) % 16 for t in range(32)]
        pkts.append(encode_vorbis_audio(posts, entries, [15], floor,
                                        residue, books))
    return pkts


# --- §10.1 closed-form table provenance -------------------------------------


def test_inverse_db_matches_published_entries():
    # The spec's printed float32 leading entries, reproduced to ≤7e-7
    # relative by 10^((i-255)*7/256) — the one pinned provenance claim.
    published = [1.0649863e-07, 1.1341951e-07, 1.2079015e-07,
                 1.2863978e-07]
    for i, p in enumerate(published):
        assert abs(FLOOR1_INVERSE_DB[i] - p) / p < 7e-7
    # entry 255 is exactly 1.0 (the spec's printed 0.99999999 rounds
    # to 1.0f); successive ratios are the constant 0.546875 dB step
    assert FLOOR1_INVERSE_DB[255] == 1.0
    r = FLOOR1_INVERSE_DB[1] / FLOOR1_INVERSE_DB[0]
    assert abs(r - 10.0 ** (7.0 / 256.0)) < 1e-12


def test_inverse_db_monotone_positive():
    assert all(v > 0 for v in FLOOR1_INVERSE_DB)
    assert all(a < b for a, b in zip(FLOOR1_INVERSE_DB,
                                     FLOOR1_INVERSE_DB[1:]))


# --- §4.3.1 window ----------------------------------------------------------


def test_window_princen_bradley():
    n = 256
    w = vorbis_window(n)
    for i in range(n // 2):
        assert abs(w[i] ** 2 + w[i + n // 2] ** 2 - 1.0) < 1e-12
    # symmetric around the center, zero-ish at the edges, peak ~1
    assert w[0] == pytest.approx(w[n - 1])
    assert w[0] < 1e-4 and max(w) > 0.9999


# --- inverse MDCT definition ------------------------------------------------


def test_imdct_single_bin_is_cosine():
    n = 64
    spec = [0.0] * (n // 2)
    spec[3] = 1.0
    y = imdct(spec, n)
    for j in range(n):
        expect = math.cos((math.pi / (2.0 * n))
                          * (2 * j + 1 + n // 2) * 7)
        assert y[j] == pytest.approx(expect, abs=1e-12)


def test_imdct_linear():
    n = 32
    a = [float((k * 7) % 5 - 2) for k in range(n // 2)]
    b = [float((k * 3) % 4 - 1) for k in range(n // 2)]
    ya, yb = imdct(a, n), imdct(b, n)
    yab = imdct([x + y for x, y in zip(a, b)], n)
    for j in range(n):
        assert yab[j] == pytest.approx(ya[j] + yb[j], abs=1e-9)


# --- PCM16 quantization -----------------------------------------------------


def test_pcm16_half_up_and_clamp():
    assert pcm16_quantize(0.0) == 0
    assert pcm16_quantize(1.0) == 32767
    assert pcm16_quantize(-1.0) == -32767
    assert pcm16_quantize(2.0) == 32767
    assert pcm16_quantize(-2.0) == -32768
    # half-up at the boundary: 0.5/32767 → floor(0.5+0.5)=1
    assert pcm16_quantize(0.5 / 32767.0) == 1
    assert pcm16_quantize(-0.5 / 32767.0) == 0  # floor(-0.5+0.5)=0


# --- full-stream decode -----------------------------------------------------


def test_ogg_vorbis_pcm_end_to_end():
    books, floor, residue = _fixture()
    cs = b"hello "
    payload = encode_ogg_vorbis(_packets(cs, books, floor, residue),
                                books, floor, residue)
    out = decode_ogg_vorbis_pcm(payload)
    # 3 packets → first primes the lap buffer → 2×128 output samples
    assert out["n_samples"] == 256
    assert len(out["pcm16"]) == 256
    assert any(v != 0 for v in out["pcm16"])
    assert all(-32768 <= v <= 32767 for v in out["pcm16"])


def test_overlap_add_is_lapped_sum():
    books, floor, residue = _fixture()
    setup = parse_vorbis_setup(encode_vorbis_setup(books, floor,
                                                   residue))
    pkts = _packets(b"abcdef", books, floor, residue)
    blocks = [decode_vorbis_pcm(p, setup, 256) for p in pkts]
    payload = encode_ogg_vorbis(pkts, books, floor, residue)
    out = decode_ogg_vorbis_pcm(payload)
    for i in range(128):
        assert out["pcm"][i] == blocks[0][128 + i] + blocks[1][i]
        assert out["pcm"][128 + i] == blocks[1][128 + i] + blocks[2][i]


def test_silent_frame_decodes_to_zero_block():
    books, floor, residue = _fixture()
    setup = parse_vorbis_setup(encode_vorbis_setup(books, floor,
                                                   residue))
    from duckdb_server_spark.operators.vorbis import _BitWriterLSB

    bw = _BitWriterLSB()
    bw.write(0, 1)  # audio packet
    bw.write(0, 1)  # floor nonzero flag = 0 → silent
    blk = decode_vorbis_pcm(bw.render(), setup, 256)
    assert blk == [0.0] * 256


# --- fail-closed subsets ----------------------------------------------------


def test_stereo_no_longer_fails_closed():
    # round 13 (later in the round than this file): 2-channel streams
    # decode through the square-polar coupling layer — a headers-only
    # stereo stream now yields zero samples instead of raising.
    # tests/test_r13_vorbis_stereo.py covers the full stereo chain;
    # >2-channel mappings remain the fail-closed subset.
    from duckdb_server_spark.operators.ogg import (
        encode_vorbis_id,
        write_stream,
    )
    from duckdb_server_spark.operators.vorbis import _common_header

    books, floor, residue = _fixture()
    ident = encode_vorbis_id(2, 8000)
    comment = _common_header(3) + bytes(8) + b"\x01"
    setup = encode_vorbis_setup(books, floor, residue)
    payload = write_stream(0x77, [ident, comment, setup], [0, 0, 0])
    out = decode_ogg_vorbis_pcm(payload)
    assert out["channels"] == 2 and out["n_samples"] == 0


def test_window_switching_routes_mono_and_stereo():
    import struct

    from duckdb_server_spark.operators.ogg import write_stream
    from duckdb_server_spark.operators.vorbis import _common_header

    books, floor, residue = _fixture()
    # round 13 (later in the round): MONO switched streams decode via
    # decode_vorbis_pcm_switched (tests/test_r13_vorbis_switching.py);
    # a headers-only switched mono stream yields zero samples
    ident = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([1])
             + struct.pack("<I", 8000) + struct.pack("<iii", 0, 0, 0)
             + bytes([(9 << 4) | 8])  # blocksizes 2^8 / 2^9 differ
             + bytes([1]))
    comment = _common_header(3) + bytes(8) + b"\x01"
    setup = encode_vorbis_setup(books, floor, residue)
    payload = write_stream(0x78, [ident, comment, setup], [0, 0, 0])
    out = decode_ogg_vorbis_pcm(payload)
    assert out["n_samples"] == 0
    # round 14: STEREO switched streams decode through the generic
    # per-mode path (headers-only -> zero samples; payload coverage in
    # tests/test_r14_vorbis_stereo_switching.py)
    ident2 = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([2])
              + struct.pack("<I", 8000) + struct.pack("<iii", 0, 0, 0)
              + bytes([(9 << 4) | 8]) + bytes([1]))
    payload2 = write_stream(0x7A, [ident2, comment, setup], [0, 0, 0])
    out2 = decode_ogg_vorbis_pcm(payload2)
    assert out2["n_samples"] == 0 and out2["channels"] == 2


# --- live DuckDB differential: the whole chain, bit-exact -------------------


def test_pcm_bitexact_vs_duckdb_replay():
    duckdb = pytest.importorskip("duckdb")

    texts = ["hello world", "The quick brown fox", "zz", "",
             "aaaaaaa", "Spark SQL engine test!", "9942!",
             "éèê accents"]
    books, floor, residue = _fixture()
    py = []
    for txt in texts:
        cs = ((txt + "x" * 6)[:6]).encode("latin-1")
        payload = encode_ogg_vorbis(_packets(cs, books, floor, residue),
                                    books, floor, residue)
        py.append(decode_ogg_vorbis_pcm(payload)["pcm16"])

    import duckdb_server_spark.catalog.beyond  # noqa: F401  (registers)
    from duckdb_server_spark.catalog import ORACLE

    oracle = ORACLE["b34e_vorbis_pcm"]
    values = ", ".join(
        f"({i}, '{t}')" for i, t in enumerate(texts)
    )
    sql = oracle.replace(
        "FROM documents",
        f"FROM (VALUES {values}) AS documents(doc_id, text)",
        1,
    )
    rows = duckdb.sql(sql).fetchall()
    assert len(rows) == len(texts)
    for row in rows:
        did = row[0]
        p16 = py[did]
        # columns: doc_id, n_samples, s0, s17, s63, s128, s200, s255,
        #          peak, csum — every one must be bit-exact
        assert row[1] == 256
        assert row[2] == p16[0]
        assert row[3] == p16[17]
        assert row[4] == p16[63]
        assert row[5] == p16[128]
        assert row[6] == p16[200]
        assert row[7] == p16[255]
        assert row[8] == max(abs(v) for v in p16)
        assert row[9] == sum(abs(v) for v in p16)
