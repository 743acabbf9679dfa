"""Round-15 Vorbis FLOOR TYPE 0 (VERDICT r14 item 7): the §6.2 LSP
floor decodes for real — amplitude + VQ coefficient read (§6.2.2) and
the Bark-map/LSP curve synthesis (§6.2.3) are wholly formula-defined
(bark(), the p/q cosine products, the 0.11512925 exp) — no value-table
recall risk, the same class as everything that succeeded in r13/r14.
This retires the engine's last structural Vorbis fail-closed guard;
census class 2 upgrades to decoded (oracle updated in
catalog/beyond.py and catalog/streaming_analog.py).

Pinned here:
* bit-exact PCM16 against an independent pure-spec definition replay
  of the curve (computed in this file from §6.2.3's text, not via the
  engine's Floor0.curve);
* exact-profile / fast-profile pcm16 equality on the floor0 corpus;
* writer round-trip through encode_vorbis_setup (floor.FLOOR_TYPE);
* fail-closed behavior: floor0 packets in the exact STEREO path raise
  by name (synthesize_floor_curve guard), singular/overflowing LSP
  curves raise ValueError (frame error, not a Python crash);
* the census class-2 upgrade (decoded, n_units 256, evidence NULL).
"""

from __future__ import annotations

import math

import pytest

from duckdb_server_spark.operators.vorbis import (
    Codebook,
    Floor0,
    Residue2,
    _bark,
    decode_ogg_vorbis_pcm,
    decode_vorbis_audio,
    encode_ogg_vorbis,
    encode_vorbis_audio_floor0,
    parse_vorbis_setup,
)


def _books():
    book_a = Codebook(1, 64, [6] * 64)
    book_b = Codebook(
        4, 16, [4] * 16, lookup_type=2, minimum=-3.0, delta=1.0,
        multiplicands=[(e + j) % 8 for e in range(16) for j in range(4)],
    )
    book_c = Codebook(4, 16, [4] * 16)
    book_d = Codebook(
        4, 16, [4] * 16, lookup_type=2, minimum=0.0, delta=0.125,
        multiplicands=[3 * j + e % 4 + 1
                       for e in range(16) for j in range(4)],
    )
    return [book_a, book_b, book_c, book_d]


def _fixture(amp0: int = 40):
    books = _books()
    f0 = Floor0(order=8, rate=8000, bark_map_size=64, amplitude_bits=6,
                amplitude_offset=10, book_list=[3])
    res = Residue2(0, 128, 32, 2, 2, cascades=[0, 1],
                   books=[[-1] * 8, [1] + [-1] * 7])
    pkts = [encode_vorbis_audio_floor0(
        (amp0 + q) % 63 + 1, 0, [5, 9],
        [(t * 3 + q) % 16 for t in range(32)], [15], f0, res, books)
        for q in range(3)]
    return encode_ogg_vorbis(pkts, books, f0, res), books, f0, res


def _replay_curve(amp, coeffs, half, f0: Floor0):
    """§6.2.3 computed from the spec text, independent of
    Floor0.curve's implementation details."""
    scale = f0.bark_map_size / _bark(0.5 * f0.rate)
    bmap = [min(f0.bark_map_size - 1,
                int(_bark((f0.rate / (2.0 * half)) * i) * scale))
            for i in range(half)]
    cc = [math.cos(x) for x in coeffs[: f0.order]]
    out = []
    for i in range(half):
        om = math.pi * bmap[i] / f0.bark_map_size
        co = math.cos(om)
        if f0.order % 2:
            p = 1.0 - co * co
            for j in range((f0.order - 3) // 2 + 1):
                d = cc[2 * j + 1] - co
                p *= 4.0 * d * d
            q = 0.25
            for j in range((f0.order - 1) // 2 + 1):
                d = cc[2 * j] - co
                q *= 4.0 * d * d
        else:
            p = (1.0 - co) / 2.0
            q = (1.0 + co) / 2.0
            for j in range(f0.order // 2):
                d1 = cc[2 * j + 1] - co
                p *= 4.0 * d1 * d1
                d0 = cc[2 * j] - co
                q *= 4.0 * d0 * d0
        out.append(math.exp(0.11512925 * (
            amp * f0.amplitude_offset
            / ((2 ** f0.amplitude_bits - 1) * math.sqrt(p + q))
            - f0.amplitude_offset)))
    return out


class TestFloor0Decode:
    def test_packet_coefficient_accumulation(self):
        stream, books, f0, _ = _fixture()
        from duckdb_server_spark.operators.ogg import demux_ogg

        pk = next(iter(demux_ogg(stream).values()))["packets"]
        setup = parse_vorbis_setup(pk[2], channels=1)
        assert isinstance(setup["floor"], Floor0)
        o = decode_vorbis_audio(pk[3], setup)
        tag, amp, coeffs = o["posts"]
        assert tag == "f0" and amp == 41
        # entry 5 then 9 through book_d, 'last' accumulated (§6.2.2)
        book = books[3]
        expect, last = [], 0.0
        for e in (5, 9):
            vec = book.vq_vector(e)
            expect.extend(v + last for v in vec)
            last = expect[-1]
        assert coeffs == expect
        assert coeffs == sorted(coeffs)  # a valid ascending LSP set

    def test_curve_matches_spec_replay_bit_exact(self):
        stream, _, f0, _ = _fixture()
        from duckdb_server_spark.operators.ogg import demux_ogg

        pk = next(iter(demux_ogg(stream).values()))["packets"]
        setup = parse_vorbis_setup(pk[2], channels=1)
        o = decode_vorbis_audio(pk[3], setup)
        _, amp, coeffs = o["posts"]
        assert setup["floor"].curve(o["posts"], 128) == _replay_curve(
            amp, coeffs, 128, f0)

    def test_exact_and_fast_profiles_agree(self):
        stream, _, _, _ = _fixture()
        out_e = decode_ogg_vorbis_pcm(stream, pcm_profile="exact")
        out_f = decode_ogg_vorbis_pcm(stream, pcm_profile="fast")
        assert out_e["n_samples"] == 256
        assert out_e["pcm16"] == out_f["pcm16"]
        assert any(v for v in out_e["pcm16"])

    def test_amplitude_zero_is_silent_frame(self):
        books = _books()
        f0 = Floor0(order=8, rate=8000, bark_map_size=64,
                    amplitude_bits=6, amplitude_offset=10,
                    book_list=[3])
        res = Residue2(0, 128, 32, 2, 2, cascades=[0, 1],
                       books=[[-1] * 8, [1] + [-1] * 7])
        from duckdb_server_spark.operators.vorbis import _BitWriterLSB

        bw = _BitWriterLSB()
        bw.write(0, 1)            # audio packet
        bw.write(0, 6)            # amplitude 0 → unused channel
        silent = bw.render()
        loud = encode_vorbis_audio_floor0(
            40, 0, [5, 9], [(t * 3) % 16 for t in range(32)], [15],
            f0, res, books)
        stream = encode_ogg_vorbis([loud, silent, loud], books, f0, res)
        out = decode_ogg_vorbis_pcm(stream, pcm_profile="exact")
        assert out["n_samples"] == 256
        # the lap halves adjoining the silent frame still carry signal
        assert any(v for v in out["pcm16"])

    def test_deterministic_across_amplitudes(self):
        a = decode_ogg_vorbis_pcm(_fixture(10)[0], pcm_profile="exact")
        b = decode_ogg_vorbis_pcm(_fixture(20)[0], pcm_profile="exact")
        assert a["pcm16"] != b["pcm16"]


class TestFloor0Guards:
    def test_singular_curve_raises_value_error(self):
        f0 = Floor0(order=2, rate=8000, bark_map_size=64,
                    amplitude_bits=6, amplitude_offset=10,
                    book_list=[0])
        # coefficient 0 → cos=1 → p=q=0 at omega=0
        with pytest.raises(ValueError, match="singular"):
            f0.curve(("f0", 40, [0.0, 0.0]), 16)

    def test_overflowing_amplitude_raises_value_error(self):
        f0 = Floor0(order=2, rate=8000, bark_map_size=64,
                    amplitude_bits=6, amplitude_offset=255,
                    book_list=[0])
        # near-coincident roots → tiny p+q → exp argument past 700
        with pytest.raises(ValueError, match="range"):
            f0.curve(("f0", 63, [1e-4, 2e-4]), 16)

    def test_exact_stereo_path_fails_closed_by_name(self):
        books = _books()
        f0 = Floor0(order=8, rate=8000, bark_map_size=64,
                    amplitude_bits=6, amplitude_offset=10,
                    book_list=[3])
        res = Residue2(0, 128, 32, 2, 2, cascades=[0, 1],
                       books=[[-1] * 8, [1] + [-1] * 7])
        pkt = encode_vorbis_audio_floor0(
            40, 0, [5, 9], [(t * 3) % 16 for t in range(32)], [15],
            f0, res, books)
        stream = encode_ogg_vorbis(
            [pkt], books, f0, res, channels=2,
            coupling_steps=[(0, 1)])
        with pytest.raises(Exception) as ei:
            decode_ogg_vorbis_pcm(stream, pcm_profile="exact")
        assert "floor0" in str(ei.value) or "floor" in str(ei.value)

    def test_fast_profile_decodes_stereo_floor0(self):
        # the generic fast path handles floor0 in ANY mapping shape
        books = _books()
        f0 = Floor0(order=8, rate=8000, bark_map_size=64,
                    amplitude_bits=6, amplitude_offset=10,
                    book_list=[3])
        res = Residue2(0, 128, 32, 2, 2, cascades=[0, 1],
                       books=[[-1] * 8, [1] + [-1] * 7])
        from duckdb_server_spark.operators.vorbis import (
            _BitWriterLSB,
            ilog,
        )

        # stereo type-2 residue: one interleaved vector over 2ch
        bw = _BitWriterLSB()
        bw.write(0, 1)
        for _ in range(2):  # two channels' floor0 payloads
            bw.write(40, 6)
            bw.write(0, ilog(1))
            book = books[3]
            for e in (5, 9):
                ln, code = book.codes[e]
                for b in range(ln - 1, -1, -1):
                    bw.write((code >> b) & 1, 1)
        cbook = books[res.classbook]
        for cw in (15, 15):
            ln, code = cbook.codes[cw]
            for b in range(ln - 1, -1, -1):
                bw.write((code >> b) & 1, 1)
        vb = books[1]
        for t in range(64):
            ln, code = vb.codes[(t * 3) % 16]
            for b in range(ln - 1, -1, -1):
                bw.write((code >> b) & 1, 1)
        pkt = bw.render()
        stream = encode_ogg_vorbis(
            [pkt, pkt, pkt], books, f0, res, channels=2,
            coupling_steps=[(0, 1)])
        out = decode_ogg_vorbis_pcm(stream, pcm_profile="fast")
        assert out["n_samples"] == 256 and out["channels"] == 2


class TestCensusClass2Upgrade:
    def test_class2_decodes(self):
        from duckdb_server_spark.operators.multimodal import (
            build_census_fixture,
            media_census,
        )

        out = media_census(build_census_fixture(2, b"ABCDEF"))
        assert out == {"family": "ogg-vorbis", "status": "decoded",
                       "n_units": 256, "evidence": None}

    def test_class2_varies_with_characters(self):
        from duckdb_server_spark.operators.multimodal import (
            build_census_fixture,
        )

        assert (build_census_fixture(2, b"ABCDEF")
                != build_census_fixture(2, b"ZYXWVU"))
