"""Round 12: MP3 ESC/linbits big-values decode under the engine profile
(VERDICT r11 item 1 — the linbits families 16-31 plus tables 13/15).

The code tables are ENGINE-DEFINED (the recall attempt at the ISO
256-entry grids failed the exact-Kraft structural gate — see the
_ENGINE_HUFF provenance note in operators/mp3_l3.py), so these tests
pin (a) the structural soundness and determinism of the engine tables,
(b) the REAL §2.4.2.7 ESC machinery — escape at |value| == 15, linbits
extension, sign placement, shared-code-table families — via exact
writer→decoder round-trips, and (c) that the default strict profile
keeps foreign streams fail-closed: a wild MP3 selecting table 16 still
raises instead of decoding under non-ISO codes (never garbage samples).
"""

from __future__ import annotations

import pytest

from duckdb_server_spark.operators.mp3_l3 import (
    LINBITS,
    _build_engine_table,
    _check_prefix_complete,
    _engine_base_table,
    _ENGINE_HUFF,
    decode_l3_spectral,
    decode_l3_subbands,
    write_l3_fixture,
)


class TestEngineTables:
    def test_structural_gate(self):
        # prefix-free + Kraft == 1, 256 entries, codeword bound 19
        for t, tab in _ENGINE_HUFF.items():
            assert len(tab) == 256
            _check_prefix_complete(list(tab.values()))
            assert max(ln for ln, _ in tab.values()) <= 19

    def test_deterministic_rebuild(self):
        assert _build_engine_table("steep") == _ENGINE_HUFF[13]
        assert _build_engine_table("flat") == _ENGINE_HUFF[15]
        assert _build_engine_table("esc16") == _ENGINE_HUFF[16]
        assert _build_engine_table("esc24") == _ENGINE_HUFF[24]

    def test_shape_matches_weight_model(self):
        # short codes at the origin, the ESC row/col kept short
        for t in (13, 15, 16, 24):
            tab = _ENGINE_HUFF[t]
            assert tab[(0, 0)][0] == min(ln for ln, _ in tab.values())
            assert tab[(0, 0)][0] < tab[(7, 7)][0]
        # the ESC boost: escape entries shorter than their non-ESC
        # neighbourhood average (that is what the ×6/×8 weights buy)
        for t in (16, 24):
            tab = _ENGINE_HUFF[t]
            assert tab[(15, 0)][0] < tab[(12, 3)][0]

    def test_family_mapping(self):
        assert _engine_base_table(13) == 13
        assert _engine_base_table(15) == 15
        for fam in range(16, 24):
            assert _engine_base_table(fam) == 16
        for fam in range(24, 32):
            assert _engine_base_table(fam) == 24
        assert _engine_base_table(7) is None
        assert _engine_base_table(14) is None

    def test_linbits_counts(self):
        assert [LINBITS[t] for t in range(16, 24)] == [
            1, 2, 3, 4, 6, 8, 10, 13]
        assert [LINBITS[t] for t in range(24, 32)] == [
            4, 5, 6, 7, 8, 9, 11, 13]


def _roundtrip(pairs_g1, pairs_g2, table_select, region_counts=(1, 0)):
    blob = write_l3_fixture(
        [[], []], granule_pairs=[pairs_g1, pairs_g2],
        table_select=table_select, region_counts=region_counts,
        br_idx=5, esc_profile="engine",
    )
    fr = decode_l3_spectral(blob, esc_profile="engine")[0]
    for gi, src in ((0, pairs_g1), (1, pairs_g2)):
        got = fr["granules"][gi]["is"][: 2 * len(src)]
        exp = []
        for x, y, sx, sy in src:
            exp += [x * (-1 if sx and x else 1),
                    y * (-1 if sy and y else 1)]
        assert got == exp, (gi, got, exp)
    return fr


class TestEscRoundTrip:
    def test_mixed_regions_escapes(self):
        # r0 = table 20 (linbits 6), r1 = 27 (linbits 7), r2 = 13
        g1 = [(15, 0, 1, 0), (17, 3, 0, 1), (78, 15, 1, 1),
              (0, 16, 0, 0), (3, 142, 0, 1), (15, 15, 1, 0),
              (15, 15, 0, 1), (12, 7, 1, 0)]
        g2 = [(20, 1, 0, 0), (0, 0, 0, 0), (15, 60, 1, 0),
              (41, 2, 0, 1), (142, 142, 1, 1), (7, 0, 0, 0),
              (1, 15, 0, 1), (15, 15, 1, 1)]
        _roundtrip(g1, g2, (20, 27, 13))

    def test_escape_value_15_reads_zero_linbits_field(self):
        # |x| == 15 under an ESC table ALWAYS carries the linbits
        # field, even when it encodes 0 — the round-trip breaks if
        # either side skips it
        fr = _roundtrip([(15, 15, 0, 1)], [], (16, 0, 0))
        g = fr["granules"][0]
        # code + 1-bit extra ×2 + sign ×2
        tab = _ENGINE_HUFF[16]
        assert g["part2_3_length"] == tab[(15, 15)][0] + 2 * 1 + 2

    def test_max_escape_13_linbits(self):
        for tab in (23, 31):
            fr = _roundtrip([(8206, 0, 1, 0)], [], (tab, 0, 0))
            assert fr["granules"][0]["is"][0] == -8206

    def test_shared_code_table_bit_accounting(self):
        # families 16-23 share code table 16: the same (x, y) costs
        # identical code bits, differing only in the linbits field
        lens = {}
        for fam in range(16, 24):
            blob = write_l3_fixture(
                [[], []], granule_pairs=[[(16, 0, 0, 0)], []],
                table_select=(fam, 0, 0), br_idx=5,
                esc_profile="engine",
            )
            fr = decode_l3_spectral(blob, esc_profile="engine")[0]
            lens[fam] = fr["granules"][0]["part2_3_length"]
        base = lens[16] - LINBITS[16]
        for fam in range(16, 24):
            assert lens[fam] == base + LINBITS[fam]

    def test_tables_13_15_full_dimension_no_linbits(self):
        # dim-15 values decode directly — no escape on non-ESC tables
        for tab in (13, 15):
            fr = _roundtrip([(15, 15, 1, 0), (0, 14, 0, 1)], [],
                            (tab, 0, 0))
            assert fr["granules"][0]["is"][:4] == [-15, 15, 0, -14]

    def test_count1_region_follows_esc_region(self):
        blob = write_l3_fixture(
            [[(1, 0, 1, 1, 1)], []],
            granule_pairs=[[(29, 2, 1, 0)], []],
            table_select=(24, 0, 0), br_idx=5, esc_profile="engine",
        )
        g = decode_l3_spectral(blob, esc_profile="engine")[0][
            "granules"][0]
        assert g["is"][:2] == [-29, 2]
        assert g["is"][2:6] == [-1, 0, -1, -1]

    def test_requantization_of_escaped_magnitudes(self):
        # the float layer consumes escaped magnitudes: xr ∝ |is|^(4/3)
        blob = write_l3_fixture(
            [[], []], granule_pairs=[[(100, 0, 0, 0)], []],
            table_select=(21, 0, 0), br_idx=5, esc_profile="engine",
        )
        out = decode_l3_subbands(blob, esc_profile="engine")
        assert out["n_frames"] == 1
        assert any(any(s) for s in out["subbands"])


class TestFailClosed:
    def test_strict_default_rejects_engine_stream(self):
        blob = write_l3_fixture(
            [[], []], granule_pairs=[[(16, 0, 0, 0)], []],
            table_select=(16, 0, 0), br_idx=5, esc_profile="engine",
        )
        with pytest.raises(NotImplementedError, match="table 16"):
            decode_l3_spectral(blob)

    def test_strict_writer_rejects_esc_tables(self):
        with pytest.raises(ValueError, match="esc_profile"):
            write_l3_fixture(
                [[], []], granule_pairs=[[(1, 0, 0, 0)], []],
                table_select=(16, 0, 0), br_idx=5,
            )

    def test_escape_overflow_rejected(self):
        # linbits 1 (table 16) caps magnitude at 15 + 1
        with pytest.raises(ValueError, match="linbits"):
            write_l3_fixture(
                [[], []], granule_pairs=[[(17, 0, 0, 0)], []],
                table_select=(16, 0, 0), br_idx=5,
                esc_profile="engine",
            )

    def test_non_esc_table_rejects_over_dimension(self):
        with pytest.raises(ValueError, match="linbits|dimension"):
            write_l3_fixture(
                [[], []], granule_pairs=[[(16, 0, 0, 0)], []],
                table_select=(13, 0, 0), br_idx=5,
                esc_profile="engine",
            )

    def test_bad_profile_rejected(self):
        with pytest.raises(ValueError, match="esc_profile"):
            decode_l3_spectral(b"\xff\xfb\x50\xc0" + bytes(100),
                               esc_profile="wild")

    def test_transcribed_tables_unaffected_by_profile(self):
        # tables 1-12 decode identically under both profiles
        blob = write_l3_fixture(
            [[], []], granule_pairs=[[(7, 3, 1, 0)], []],
            table_select=(12, 0, 0), br_idx=5,
        )
        a = decode_l3_spectral(blob)[0]["granules"][0]["is"][:2]
        b = decode_l3_spectral(blob, "engine")[0]["granules"][0][
            "is"][:2]
        assert a == b == [-7, 3]
