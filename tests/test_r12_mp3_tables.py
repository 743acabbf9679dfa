"""Round 12 (VERDICT r11 item 1): ISO 11172-3 Table B.7 code tables
7-12 — the 6x6 and 8x8 mid-amplitude big-values tables — plus the
LINBITS registry for the ESC families 16-31 whose two shared 256-entry
code tables remain the declared fail-closed plug point.

Provenance gates (see operators/mp3_l3.py): tables 7/9/10 passed the
prefix-free + Kraft-complete check as transcribed; 8/11 had exactly two
slots forced uniquely by completeness; 12 carries a single-slip
reconstruction note. Writer and decoder share the constants, so every
engine fixture round-trips bit-exactly regardless; the pinned fixture
hash below makes any future table edit loudly visible."""

from __future__ import annotations

import hashlib

import pytest

from duckdb_server_spark.operators.mp3_l3 import (
    _HUFF,
    _HUFF_DIM,
    LINBITS,
    _check_prefix_complete,
    decode_l3_spectral,
    write_l3_fixture,
)

NEW_TABLES = (7, 8, 9, 10, 11, 12)


def test_new_tables_structural():
    for t in NEW_TABLES:
        _check_prefix_complete(list(_HUFF[t].values()))
        dim = _HUFF_DIM[t]
        # full rectangular grid, no holes
        assert set(_HUFF[t]) == {
            (x, y) for x in range(dim + 1) for y in range(dim + 1)
        }


def test_new_table_dims():
    assert {t: _HUFF_DIM[t] for t in NEW_TABLES} == {
        7: 5, 8: 5, 9: 5, 10: 7, 11: 7, 12: 7,
    }


@pytest.mark.parametrize("tab", NEW_TABLES)
def test_every_symbol_roundtrips(tab):
    dim = _HUFF_DIM[tab]
    pairs = []
    for i, (x, y) in enumerate(sorted(_HUFF[tab])):
        pairs.append((x, y, i % 2 if x else 0, (i + 1) % 2 if y else 0))
    blob = write_l3_fixture(
        [[], []], granule_pairs=[pairs, []],
        table_select=(tab, tab, tab), region_counts=(9, 6), br_idx=5,
    )
    g = decode_l3_spectral(blob)[0]["granules"][0]
    assert g["big_values"] == len(pairs)
    for i, (x, y, sx, sy) in enumerate(pairs):
        assert g["is"][2 * i] == (-x if sx else x)
        assert g["is"][2 * i + 1] == (-y if sy else y)
    assert all(v == 0 for v in g["is"][2 * len(pairs):])


def test_mixed_regions_use_distinct_new_tables():
    # region split at 44.1 kHz edges: region0_count=1 -> lines 0-7,
    # region1 to edges[3]=12 -> lines 8-11, region 2 beyond
    pairs = [
        (7, 3, 1, 0), (4, 6, 0, 1), (2, 7, 1, 1), (5, 5, 0, 0),  # r0: t10
        (3, 1, 1, 0), (0, 4, 0, 1),                              # r1: t11
        (6, 2, 0, 0), (1, 7, 1, 1),                              # r2: t12
    ]
    blob = write_l3_fixture(
        [[], []], granule_pairs=[pairs, []],
        table_select=(10, 11, 12), region_counts=(1, 0), br_idx=5,
    )
    g = decode_l3_spectral(blob)[0]["granules"][0]
    expect = []
    for x, y, sx, sy in pairs:
        expect += [(-x if sx else x), (-y if sy else y)]
    assert g["is"][: len(expect)] == expect


PINNED_R12_FIXTURE_SHA256 = (
    "81994193fa7d8ade22b082aef92073eb29c662d4856c1fcc69b7cd9edb5fa1e3"
)


def test_r12_fixture_bytes_pinned():
    pairs = [(5, 2, 1, 0), (0, 3, 0, 1), (7, 7, 1, 1), (1, 0, 0, 0)]
    blob = write_l3_fixture(
        [[(1, 0, 1, 1, 0)], []], granule_pairs=[pairs, []],
        table_select=(12, 8, 9), region_counts=(1, 0), br_idx=5,
    )
    assert hashlib.sha256(blob).hexdigest() == PINNED_R12_FIXTURE_SHA256


def test_linbits_registry():
    # §2.4.2.7: families 16-23 share code table 16, 24-31 share 24
    assert LINBITS == {
        16: 1, 17: 2, 18: 3, 19: 4, 20: 6, 21: 8, 22: 10, 23: 13,
        24: 4, 25: 5, 26: 6, 27: 7, 28: 8, 29: 9, 30: 11, 31: 13,
    }


@pytest.mark.parametrize("tab,shared", [(16, 16), (19, 16), (23, 16),
                                        (24, 24), (28, 24), (31, 24)])
def test_esc_families_fail_closed_naming_linbits(tab, shared):
    # hand-build a frame whose side info selects an ESC table: the
    # writer refuses them, so patch a valid frame's table_select field
    blob = bytearray(write_l3_fixture(
        [[], []], granule_pairs=[[(1, 1, 0, 0)], []],
        table_select=(1, 1, 1), region_counts=(0, 0),
    ))
    # mono side info: table_select[0] for granule 1 sits after
    # 9+5+4 scfsi +12+9+8+4+1 = 52 bits from byte 4
    bitpos = 52
    byte0 = 4 + bitpos // 8
    # clear the 5-bit field then set `tab`
    cur = int.from_bytes(blob[byte0:byte0 + 2], "big")
    shift = 16 - (bitpos % 8) - 5
    cur &= ~(0b11111 << shift)
    cur |= tab << shift
    blob[byte0:byte0 + 2] = cur.to_bytes(2, "big")
    with pytest.raises(NotImplementedError) as ei:
        decode_l3_spectral(bytes(blob))
    msg = str(ei.value)
    assert f"table {tab} " in msg
    assert f"{LINBITS[tab]} linbits" in msg
    assert f"table {shared}" in msg


@pytest.mark.parametrize("tab", [13, 15])
def test_tables_13_15_fail_closed(tab):
    blob = bytearray(write_l3_fixture(
        [[], []], granule_pairs=[[(1, 1, 0, 0)], []],
        table_select=(1, 1, 1), region_counts=(0, 0),
    ))
    bitpos = 52
    byte0 = 4 + bitpos // 8
    cur = int.from_bytes(blob[byte0:byte0 + 2], "big")
    shift = 16 - (bitpos % 8) - 5
    cur &= ~(0b11111 << shift)
    cur |= tab << shift
    blob[byte0:byte0 + 2] = cur.to_bytes(2, "big")
    with pytest.raises(NotImplementedError, match=f"table {tab} "):
        decode_l3_spectral(bytes(blob))


def test_new_tables_work_in_reservoir_stream():
    # the round-11 reservoir writer composes with the round-12 tables
    from duckdb_server_spark.operators.mp3_l3 import (
        write_l3_reservoir_stream,
    )

    specs = [
        {"granule_quads": [[], []],
         "granule_pairs": [[(7, 1, 0, 1), (2, 2, 1, 0)], []],
         "table_select": (10, 10, 10), "region_counts": (9, 6)},
        {"granule_quads": [[(1, 1, 0, 1, 0)], []],
         "granule_pairs": [[(3, 5, 1, 1)], [(4, 4, 0, 0)]],
         "table_select": (11, 11, 11), "region_counts": (9, 6)},
    ]
    stream = write_l3_reservoir_stream(specs, br_idx=5)
    frames = decode_l3_spectral(stream)
    assert len(frames) == 2
    g = frames[0]["granules"][0]
    assert g["is"][:4] == [7, -1, -2, 2]
    g2 = frames[1]["granules"]
    assert g2[0]["is"][:2] == [-3, -5]
    assert g2[1]["is"][:2] == [4, 4]
