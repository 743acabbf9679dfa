"""Round 14 (VERDICT r13 item 4): the UNIFIED multimodal census —
the b35h "fail-closed frame → status row" contract extended across
every codec family (operators/multimodal.py::media_census). The scan
kernel must NEVER raise: decoded / fail-closed:<slug> /
error:malformed / not-media, with structural n_units and a cheap
decode-proof evidence column where the family emits one.
"""

from __future__ import annotations

import math
import struct

from duckdb_server_spark.operators.flac import encode_flac
from duckdb_server_spark.operators.mp3_l3 import write_l3_fixture
from duckdb_server_spark.operators.multimodal import media_census
from duckdb_server_spark.operators.ogg import encode_vorbis_id, write_stream
from duckdb_server_spark.operators.vorbis import (
    Codebook,
    Floor1,
    Residue2,
    _BitWriterLSB,
    _common_header,
    encode_ogg_vorbis,
    encode_vorbis_audio,
    encode_vorbis_audio_multi_switched,
)
from duckdb_server_spark.operators.vp8_fixture import encode_vp8_fixture_gray
from duckdb_server_spark.operators.wav import encode_wav
from duckdb_server_spark.operators.webm import encode_webm_mjpeg

CS = b"hello "


def _fixture(end=128):
    book_a = Codebook(1, 64, [6] * 64)
    book_b = Codebook(
        4, 16, [4] * 16, lookup_type=2, minimum=-3.0, delta=1.0,
        multiplicands=[(e + j) % 8 for e in range(16) for j in range(4)],
    )
    book_c = Codebook(4, 16, [4] * 16)
    books = [book_a, book_b, book_c]
    floor = Floor1([0], [3], [0], multiplier=1, rangebits=6,
                   x_list=[0, 64, 8, 16, 32])
    residue = Residue2(0, end, 32, 2, 2, cascades=[0, 1],
                       books=[[-1] * 8, [1] + [-1] * 7])
    return books, floor, residue


def _posts(q, sh=0):
    return [(CS[0] * 5 + 17 * q + sh) % 160 + 16,
            (CS[1] * 7 + 29 * q + sh) % 160 + 16,
            (CS[2] + q) % 63 + 1, (CS[3] + 2 * q) % 63 + 1,
            (CS[4] + 3 * q) % 63 + 1]


def test_vorbis_mono_decoded():
    books, floor, residue = _fixture(128)
    pkts = [encode_vorbis_audio(
        _posts(q), [(CS[t % 6] + t + 13 * q) % 16 for t in range(32)],
        [15], floor, residue, books) for q in range(3)]
    out = media_census(encode_ogg_vorbis(pkts, books, floor, residue))
    assert out == {"family": "ogg-vorbis", "status": "decoded",
                   "n_units": 256, "evidence": None}


def test_vorbis_switched_stereo_decoded():
    books, floor, residue = _fixture(256)
    pkts = []
    for q, (bf, pf, nf) in enumerate([(1, 1, 0), (0, 0, 0), (1, 0, 1)]):
        n = 256 if bf else 64
        n_part = min(256, 2 * (n // 2)) // 32
        entries = [(CS[t % 6] + t + 13 * q) % 16
                   for t in range(n_part * 8)]
        pkts.append(encode_vorbis_audio_multi_switched(
            [_posts(q, 0), _posts(q, 31)], entries,
            [15] * math.ceil(n_part / 4), floor, residue, books,
            mode_num=bf, n_modes=2, blockflag=bf,
            prev_flag=pf, next_flag=nf))
    payload = encode_ogg_vorbis(
        pkts, books, floor, residue, channels=2,
        coupling_steps=[(0, 1)], bs0_log2=6, bs1_log2=8,
        mode_blockflags=(0, 1))
    out = media_census(payload)
    assert out["status"] == "decoded" and out["n_units"] == 160


def test_vorbis_truncated_floor0_setup_is_malformed():
    # round 15: floor type 0 DECODES (tests/test_r15_vorbis_floor0);
    # this round-14 stub — a setup header that declares floor type 0
    # then ends — is now a DATA fault (truncated config), not a
    # named fail-closed subset
    books, _, _ = _fixture()
    bw = _BitWriterLSB()
    bw.write(0, 8)
    books[0].write_header(bw)
    bw.write(0, 6)
    bw.write(0, 16)
    bw.write(0, 6)
    bw.write(0, 16)  # floor type 0, config missing
    setup0 = _common_header(5) + bw.render()
    comment = _common_header(3) + bytes(8) + b"\x01"
    payload = write_stream(
        0x22, [encode_vorbis_id(1, 8000), comment, setup0], [0, 0, 0])
    out = media_census(payload)
    assert out["family"] == "ogg-vorbis"
    assert out["status"].startswith(("error:", "fail-closed:"))
    assert out["status"] != "fail-closed:vorbis-floor0"


def test_vorbis_floor_type_2_fails_closed_by_name():
    books, _, _ = _fixture()
    bw = _BitWriterLSB()
    bw.write(0, 8)
    books[0].write_header(bw)
    bw.write(0, 6)
    bw.write(0, 16)
    bw.write(0, 6)
    bw.write(2, 16)  # floor type 2: not in the spec's 0/1 set
    setup0 = _common_header(5) + bw.render()
    comment = _common_header(3) + bytes(8) + b"\x01"
    payload = write_stream(
        0x22, [encode_vorbis_id(1, 8000), comment, setup0], [0, 0, 0])
    out = media_census(payload)
    assert out == {"family": "ogg-vorbis",
                   "status": "fail-closed:vorbis-floor",
                   "n_units": 0, "evidence": None}


def test_flac_decoded_with_evidence():
    samples = [CS[t % 6] * (t // 8 + 1) - 480 for t in range(64)]
    out = media_census(encode_flac(samples, 8000))
    assert out == {"family": "flac", "status": "decoded",
                   "n_units": 64, "evidence": sum(samples)}


def test_flac_stereo_streaminfo_fail_closed():
    samples = [CS[t % 6] * (t // 8 + 1) - 480 for t in range(64)]
    b = bytearray(encode_flac(samples, 8000))
    b[20] = (b[20] & ~0x0E) | 0x02  # channels-1 := 1
    out = media_census(bytes(b))
    assert out["family"] == "flac"
    assert out["status"] == "fail-closed:flac-subset"


def test_wav_decoded():
    samples = [CS[t % 6] - 100 for t in range(32)]
    out = media_census(encode_wav(samples, 8000))
    assert out == {"family": "wav", "status": "decoded",
                   "n_units": 32, "evidence": sum(samples)}


def test_mp3_delegates_to_round13_census():
    def _quads(cc):
        return [((c >> 3) & 1, (c >> 2) & 1, (c >> 1) & 1, c & 1,
                 (c >> 6) & 1) for c in cc]

    out = media_census(write_l3_fixture([_quads(CS[:4]),
                                         _quads(CS[:4][::-1])]))
    assert out["family"] == "mp3"
    assert out["status"] == "decoded" and out["n_units"] == 1


def test_vp8_image_decoded_and_dims_fail_closed():
    v = 128 + (CS[0] % 2)
    blob = encode_vp8_fixture_gray(bytes([v]) * 256, 16, 16)
    out = media_census(blob)
    assert out == {"family": "image", "status": "decoded",
                   "n_units": 256, "evidence": 256 * v}
    b = bytearray(blob)
    w16 = struct.unpack("<H", b[26:28])[0]
    b[26:28] = struct.pack("<H", (w16 & ~0x3FFF) | 17)
    out2 = media_census(bytes(b))
    assert out2["status"] == "fail-closed:vp8-dims"


def test_webm_decoded():
    v = 128 + (CS[0] % 2)
    tile = encode_vp8_fixture_gray(bytes([v]) * 256, 16, 16)
    n = int.from_bytes(tile[16:20], "little")
    payload = encode_webm_mjpeg([tile[20:20 + n]] * 3, 16, 16,
                                fps=10, codec_id=b"V_VP8")
    out = media_census(payload)
    assert out == {"family": "webm", "status": "decoded",
                   "n_units": 3, "evidence": 256 * v}


def test_not_media_and_malformed_never_raise():
    assert media_census(b"just some text")["status"] == "not-media"
    assert media_census(b"")["status"] == "not-media"
    # truncated FLAC: family sniffed, then malformed -> error row
    out = media_census(b"fLaC\x00\x00")
    assert out["family"] == "flac"
    assert out["status"] == "error:malformed"
    # truncated Ogg-Vorbis header chain
    books, floor, residue = _fixture(128)
    pkts = [encode_vorbis_audio(
        _posts(0), [(CS[t % 6] + t) % 16 for t in range(32)],
        [15], floor, residue, books)]
    whole = encode_ogg_vorbis(pkts, books, floor, residue)
    out2 = media_census(whole[:60])
    assert out2["family"] == "ogg-vorbis"
    assert out2["status"] == "error:malformed"
