"""Round 13 (VERDICT r12 item 3): MP3 decode-status census.

The census turns fail-closed decode subsets into stable status strings
so a corpus sweep aggregates coverage instead of dying on the first
wild frame. The decode path itself stays fail-closed — the census only
catches and names; it never fabricates spectral values.
"""

from __future__ import annotations

from duckdb_server_spark.operators.mp3_l3 import (
    decode_l3_spectral,
    mp3_decode_census,
    write_l3_fixture,
    write_l3_reservoir_stream,
)


def _quads(cs: bytes):
    return [((c >> 3) & 1, (c >> 2) & 1, (c >> 1) & 1, c & 1,
             (c >> 6) & 1) for c in cs]


def _esc_pairs(cs: bytes):
    return [(15 + (c % 64), c % 8, (c >> 6) % 2 if c else 0,
             (c >> 1) % 2) for c in cs[:4]]


def _strict_blob(cs: bytes = b"Hal!") -> bytes:
    return write_l3_fixture([_quads(cs), _quads(cs[::-1])])


def _esc_blob(cs: bytes = b"Hal!") -> bytes:
    return write_l3_fixture(
        [[], []], granule_pairs=[_esc_pairs(cs), _esc_pairs(cs)],
        table_select=(20, 0, 0), region_counts=(1, 0), br_idx=5,
        esc_profile="engine",
    )


def test_decoded_census_matches_decode():
    blob = _strict_blob()
    cen = mp3_decode_census(blob)
    assert cen["status"] == "decoded"
    frames = decode_l3_spectral(blob)
    assert cen["n_frames"] == len(frames) == 1
    assert cen["n_granules"] == 2
    assert cen["spectral_sum"] == sum(
        sum(g["is"]) for f in frames for g in f["granules"]
    )


def test_esc_table_fail_closed_named():
    cen = mp3_decode_census(_esc_blob())
    assert cen["status"] == "fail-closed:table-20"
    # header walk still sizes the file
    assert cen["n_frames"] == 1
    assert cen["spectral_sum"] is None


def test_esc_table_decodes_under_engine_profile():
    cen = mp3_decode_census(_esc_blob(), esc_profile="engine")
    assert cen["status"] == "decoded"
    assert cen["n_granules"] == 2


def test_joint_stereo_decodes_via_float_path():
    # round 13: a REAL mode-1 MS frame routes through the joint float
    # path and counts as decoded (2 granules × 2 channels of M/S-coded
    # integer evidence)
    from duckdb_server_spark.operators.mp3_l3 import (
        write_l3_stereo_fixture,
    )

    cs = b"Hal!"
    blob = write_l3_stereo_fixture(
        [[_quads(cs), _quads(cs[::-1])],
         [_quads(cs[::-1]), _quads(cs)]],
        mode=1, mode_extension=2,
    )
    cen = mp3_decode_census(blob)
    assert cen["status"] == "decoded"
    assert cen["n_frames"] == 1
    assert cen["n_granules"] == 4
    a = sum((1 - 2 * ((c >> 6) & 1)) * bin(c & 0xF).count("1")
            for c in cs)
    assert cen["spectral_sum"] == 4 * a


def test_mode_bits_on_mono_body_is_malformed():
    # the r13-retired class: a MONO frame with its header mode bits
    # patched to joint — as a stereo frame the body is malformed, and
    # the census says so instead of raising
    base = _strict_blob()
    patched = base[:3] + bytes([(base[3] & 0x3F) | 0x40]) + base[4:]
    cen = mp3_decode_census(patched)
    assert cen["status"].startswith("error:")
    assert cen["n_frames"] == 1


def test_malformed_and_truncated():
    assert mp3_decode_census(b"NOTANMP3" * 4)["status"] == (
        "error:malformed"
    )
    # cut inside the side info so the bitstream genuinely underruns
    blob = _strict_blob()
    cen = mp3_decode_census(blob[:12])
    assert cen["status"] == "error:malformed"  # bitstream underrun


def test_reservoir_underrun_classified():
    # a mid-stream start: drop the first frame of a reservoir stream so
    # main_data_begin points past the buffered pool
    specs = [
        {"granule_quads": [[(1, 0, 0, 1, 0)], [(1, 1, 0, 0, 1)]]},
        {"granule_quads": [[(0, 1, 1, 0, 1)], []],
         "granule_pairs": [[(1, 1, 0, 1)], []],
         "table_select": (1, 1, 1)},
    ]
    stream = write_l3_reservoir_stream(specs)
    from duckdb_server_spark.operators.mp3 import parse_frame_header

    h = parse_frame_header(stream, 0)
    tail = stream[h["length"]:]
    cen = mp3_decode_census(tail)
    assert cen["status"] == "error:reservoir-underrun"


def test_census_never_raises_on_byte_noise():
    for seed in range(32):
        payload = bytes((seed * 37 + i * 11) % 256 for i in range(200))
        cen = mp3_decode_census(payload)
        assert isinstance(cen["status"], str)
        assert cen["status"] != "decoded" or cen["spectral_sum"] is not None
