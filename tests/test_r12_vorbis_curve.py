"""Round 12 (VERDICT r11 item 2): Vorbis floor1 CURVE synthesis —
§7.2.4 amplitude reconstruction + §9.2.4-9.2.7 integer helpers
(low/high neighbor, render_point, render_line). Pure integer math, no
value table: the fail-closed line moves from "posts" to "synthesized
integer floor curve"; only the §10.1 inverse-dB lookup + IMDCT remain
the float plug point."""

from __future__ import annotations

import random

import pytest

from duckdb_server_spark.operators.vorbis import (
    Codebook,
    Floor1,
    Residue2,
    decode_ogg_vorbis,
    decode_vorbis_floor_curve,
    encode_ogg_vorbis,
    encode_vorbis_audio,
    floor1_amplitude,
    high_neighbor,
    low_neighbor,
    parse_vorbis_setup,
    render_line,
    render_point,
    synthesize_floor_curve,
)


def _fixture_floor():
    return Floor1([0], [3], [0], multiplier=1, rangebits=6,
                  x_list=[0, 64, 8, 16, 32])


# --- §9.2.4/9.2.5 neighbors ---------------------------------------------------


def test_neighbors_definition():
    xs = [0, 64, 8, 16, 32]
    # greatest value below / least value above, among PRIOR positions
    assert low_neighbor(xs, 2) == 0 and high_neighbor(xs, 2) == 1
    assert low_neighbor(xs, 3) == 2 and high_neighbor(xs, 3) == 1
    assert low_neighbor(xs, 4) == 3 and high_neighbor(xs, 4) == 1


def test_neighbors_raise_without_candidate():
    with pytest.raises(ValueError):
        low_neighbor([5, 3], 1)  # nothing below 3
    with pytest.raises(ValueError):
        high_neighbor([5, 9], 1)  # nothing above 9


# --- §9.2.6/9.2.7 render helpers ------------------------------------------------


def test_render_point_truncates_toward_zero():
    assert render_point(0, 0, 64, 255, 8) == (8 * 255) // 64
    assert render_point(0, 255, 64, 0, 8) == 255 - (8 * 255) // 64
    assert render_point(0, 10, 10, 10, 5) == 10


def test_render_line_closed_form():
    # the oracle contract: y(x0+k) = y0 + sign(dy) * (k*|dy|) // adx
    rng = random.Random(12)
    for _ in range(500):
        x0 = rng.randrange(0, 40)
        x1 = x0 + rng.randrange(1, 90)
        y0 = rng.randrange(0, 256)
        y1 = rng.randrange(0, 256)
        v = [None] * x1
        render_line(x0, y0, x1, y1, v)
        dy = y1 - y0
        for k in range(x1 - x0):
            exp = (y0 + (k * dy) // (x1 - x0) if dy >= 0
                   else y0 - (k * -dy) // (x1 - x0))
            assert v[x0 + k] == exp
        # x1 itself is NOT written (next segment's job)
        assert all(e is not None for e in v[x0:x1])


# --- §7.2.4 step 1: amplitude ---------------------------------------------------


def test_amplitude_even_odd_split():
    floor = _fixture_floor()
    # posts 2..4 small and nonzero -> predicted +- val/2
    fy, fl = floor1_amplitude(floor, [100, 100, 4, 3, 8])
    assert fy[0] == 100 and fy[1] == 100
    assert fy[2] == 100 + 2          # even: predicted + val//2
    # post 3 predicts from the MODIFIED post 2 (102 along 8->64 gives
    # predicted 102), then odd val 3 subtracts (val+1)//2
    assert fy[3] == 102 - 2
    assert fy[4] == 100 + 4          # predicts from post 3 (100) flat
    assert fl == [True] * 5


def test_amplitude_zero_val_unflagged_but_predictive():
    floor = _fixture_floor()
    fy, fl = floor1_amplitude(floor, [0, 128, 0, 0, 0])
    # every post is the straight-line prediction, none flagged (no
    # later nonzero val re-flags a neighbor)
    assert fy[2] == render_point(0, 0, 64, 128, 8) == 16
    assert fy[3] == render_point(8, 16, 64, 128, 16) == 32
    assert fy[4] == render_point(16, 32, 64, 128, 32) == 64
    assert fl == [True, True, False, False, False]


def test_amplitude_nonzero_val_flags_neighbors():
    floor = _fixture_floor()
    # p2 = p3 = 0 but p4 != 0: post 4's low neighbor is post 3 -> post
    # 3 gets flagged even though its own val is 0; post 2 stays off
    fy, fl = floor1_amplitude(floor, [0, 128, 0, 0, 6])
    assert fl == [True, True, False, True, True]


def test_amplitude_escape_branches():
    floor = _fixture_floor()
    # predicted 0 -> lowroom 0, room 0, every nonzero val escapes high
    fy, _ = floor1_amplitude(floor, [0, 0, 9, 0, 0])
    assert fy[2] == 9 - 0 + 0  # val - lowroom + predicted
    # predicted 255 -> highroom 1, lowroom 255, room 2: val >= 2
    # escapes low: predicted - val + highroom - 1
    fy, _ = floor1_amplitude(floor, [255, 255, 9, 0, 0])
    assert fy[2] == 255 - 9 + 1 - 1
    assert all(0 <= y < 256 for y in fy)


# --- §7.2.4 step 2: curve -------------------------------------------------------


def test_curve_hits_flagged_posts_exactly():
    floor = _fixture_floor()
    posts = [10, 200, 30, 21, 44]
    fy, fl = floor1_amplitude(floor, posts)
    v = synthesize_floor_curve(floor, posts, 128)
    assert len(v) == 128
    for i, x in enumerate(floor.x_list):
        if fl[i]:
            assert v[x] == fy[i] * floor.multiplier
    # flat tail past the last post
    assert set(v[64:]) == {fy[1]}


def test_curve_skips_unflagged_posts():
    floor = _fixture_floor()
    # p2=p3=p4=0 -> single segment 0..64: closed-form straight line
    v = synthesize_floor_curve(floor, [0, 128, 0, 0, 0], 128)
    for x in range(64):
        assert v[x] == (x * 128) // 64
    assert set(v[64:]) == {128}


def test_curve_renders_neighbor_flagged_predicted_post():
    floor = _fixture_floor()
    # post 3 flagged only via post 4's neighbor rule: the curve passes
    # through (16, predicted_3), which differs from the direct 8->32
    # interpolation by integer rounding
    posts = [0, 128, 0, 0, 6]
    fy, fl = floor1_amplitude(floor, posts)
    v = synthesize_floor_curve(floor, posts, 128)
    assert fl[3] and not fl[2]
    assert v[16] == fy[3]


def test_multiplier_scales_amplitudes():
    floor = Floor1([0], [3], [0], multiplier=2, rangebits=6,
                   x_list=[0, 64, 8, 16, 32])
    posts = [10, 100, 4, 5, 6]  # range 128 at multiplier 2
    fy, _ = floor1_amplitude(floor, posts)
    v = synthesize_floor_curve(floor, posts, 128)
    assert v[0] == 20 and v[64] == 200
    assert v[8] == fy[2] * 2


def test_curve_truncation_when_n_short():
    floor = _fixture_floor()
    v = synthesize_floor_curve(floor, [50, 60, 10, 11, 12], 32)
    assert len(v) == 32


# --- end to end through the Ogg container ---------------------------------------


def test_decode_floor_curve_end_to_end():
    book_a = Codebook(1, 64, [6] * 64)
    book_b = Codebook(
        4, 16, [4] * 16, lookup_type=2, minimum=-3.0, delta=1.0,
        multiplicands=[(e + j) % 8 for e in range(16) for j in range(4)],
    )
    book_c = Codebook(4, 16, [4] * 16)
    books = [book_a, book_b, book_c]
    floor = _fixture_floor()
    residue = Residue2(0, 128, 32, 2, 2, cascades=[0, 1],
                       books=[[-1] * 8, [1] + [-1] * 7])
    posts = [40, 200, 10, 0, 33]
    pkt = encode_vorbis_audio(posts, [], [0], floor, residue, books)
    stream = encode_ogg_vorbis([pkt], books, floor, residue)
    out = decode_ogg_vorbis(stream)
    setup_pkt = None  # setup is re-parsed inside decode; rebuild here
    from duckdb_server_spark.operators.vorbis import encode_vorbis_setup
    setup = parse_vorbis_setup(encode_vorbis_setup(books, floor, residue))
    got = decode_vorbis_floor_curve(pkt, setup, 128)
    assert got["posts"] == posts
    assert got["floor_curve"] == synthesize_floor_curve(floor, posts, 128)
    assert out["frames"][0]["posts"] == posts


def test_unused_floor_returns_none_curve():
    from duckdb_server_spark.operators.vorbis import (
        _BitWriterLSB,
        encode_vorbis_setup,
    )

    book_a = Codebook(1, 64, [6] * 64)
    book_c = Codebook(4, 16, [4] * 16)
    books = [book_a, book_a, book_c]
    floor = _fixture_floor()
    residue = Residue2(0, 128, 32, 2, 2, cascades=[0, 0],
                       books=[[-1] * 8, [-1] * 8])
    setup = parse_vorbis_setup(encode_vorbis_setup(books, floor, residue))
    bw = _BitWriterLSB()
    bw.write(0, 1)  # audio packet
    bw.write(0, 1)  # floor NOT used
    got = decode_vorbis_floor_curve(bw.render() + b"\x00", setup, 128)
    assert got["floor_curve"] is None and got["posts"] is None
