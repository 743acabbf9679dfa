"""Round-9 VP8 work: RFC 6386 default probability tables + the
independent fixture writer (VERDICT r8 item 2).

What is pinned here:
- the §13.5 / §13.4 tables are structurally valid (shape, prob range,
  qlookup monotonicity, qindex-0 anchor values);
- ``CarryWriter`` (the spec's incremental carry-walk formulation) is
  bit-exact against the engine's ``BoolDecoder`` on random sequences —
  an independent encoder implementation agreeing with the decoder;
- fixture streams the engine encoder CANNOT produce (skip disabled,
  every block token-coded, quantizer deltas present, §13.4 probability
  replacements) decode exactly through the default tables;
- a byte-pinned fixture (committed hash) keeps the wire format stable
  across refactors.
"""

from __future__ import annotations

import hashlib
import random
import struct

import pytest

from duckdb_server_spark.operators import vp8_tables as T
from duckdb_server_spark.operators.vp8 import (
    BoolDecoder,
    decode_vp8_frame,
    encode_vp8_gray,
)
from duckdb_server_spark.operators.vp8_fixture import (
    CarryWriter,
    encode_vp8_fixture_gray,
    plan_values,
)


def _bare(blob: bytes) -> bytes:
    assert blob[:4] == b"RIFF" and blob[12:16] == b"VP8 "
    size = struct.unpack("<I", blob[16:20])[0]
    return blob[20 : 20 + size]


def _uniform_raster(targets, mb_cols, mb_rows) -> bytes:
    w = mb_cols * 16
    px = bytearray(w * mb_rows * 16)
    for my in range(mb_rows):
        for mx in range(mb_cols):
            v = targets[my][mx]
            for r in range(16):
                base = (my * 16 + r) * w + mx * 16
                px[base : base + 16] = bytes([v]) * 16
    return bytes(px)


# --- table structure --------------------------------------------------------


def test_tables_structure():
    for tbl in (T.COEF_PROBS, T.COEF_UPDATE_PROBS):
        assert len(tbl) == 4
        for typ in tbl:
            assert len(typ) == 8
            for band in typ:
                assert len(band) == 3
                for row in band:
                    assert len(row) == 11
                    assert all(1 <= v <= 255 for v in row)


def test_qlookup_tables():
    assert len(T.DC_QLOOKUP) == 128 and len(T.AC_QLOOKUP) == 128
    assert all(b >= a for a, b in zip(T.DC_QLOOKUP, T.DC_QLOOKUP[1:]))
    assert all(b >= a for a, b in zip(T.AC_QLOOKUP, T.AC_QLOOKUP[1:]))
    # qindex-0 anchors (the engine's own exact-reconstruction subset)
    assert T.dequant_factors(0) == {
        "y1dc": 4, "y1ac": 4, "y2dc": 8, "y2ac": 8, "uvdc": 4, "uvac": 4,
    }
    # Y2 AC floor, chroma DC cap, index clamping
    assert T.dequant_factors(0, y2ac_delta=120)["y2ac"] >= 8
    assert T.dequant_factors(127, uvdc_delta=120)["uvdc"] == 132
    assert T.dequant_factors(127, y1dc_delta=120)["y1dc"] == T.DC_QLOOKUP[127]


# --- independent boolean writer vs engine decoder ---------------------------


def test_carry_writer_bit_exact_fuzz():
    rng = random.Random(906)
    for _ in range(300):
        seq = [
            (rng.randint(1, 255), rng.randint(0, 1))
            for _ in range(rng.randint(1, 600))
        ]
        w = CarryWriter()
        for p, b in seq:
            w.put(p, b)
        dec = BoolDecoder(w.bytes())
        assert [dec.get(p) for p, _ in seq] == [b for _, b in seq]


def test_carry_writer_carry_chain():
    # force long 0xFF runs: high-prob 1-bits push low toward the top of
    # the interval so emitted bytes saturate and carries must walk back
    seq = [(254, 1)] * 400 + [(2, 0)] * 5 + [(254, 1)] * 100
    w = CarryWriter()
    for p, b in seq:
        w.put(p, b)
    dec = BoolDecoder(w.bytes())
    assert [dec.get(p) for p, _ in seq] == [b for _, b in seq]


# --- fixture streams: shapes the engine encoder cannot produce --------------


def test_fixture_skip_disabled_decodes_exact():
    targets = [[128], [129], [129], [130]]
    px = _uniform_raster(targets, 1, 4)
    out = decode_vp8_frame(_bare(encode_vp8_fixture_gray(px, 16, 64)))
    assert out["width"] == 16 and out["height"] == 64
    assert out["pixels"] == px


def test_fixture_random_grids_decode_exact():
    rng = random.Random(909)
    for _ in range(10):
        raw = bytes(rng.randrange(256) for _ in range(8))
        mbc, mbr = rng.choice([(2, 2), (4, 3), (3, 4)])
        targets = plan_values(raw, mbc, mbr)
        px = _uniform_raster(targets, mbc, mbr)
        blob = encode_vp8_fixture_gray(px, mbc * 16, mbr * 16)
        assert decode_vp8_frame(_bare(blob))["pixels"] == px


def test_fixture_prob_replacement_decodes_exact():
    # §13.4 update flags SET: the decoder must read the 8-bit literals
    # and token-decode with the replaced probabilities
    targets = [[128, 129], [129, 130]]
    px = _uniform_raster(targets, 2, 2)
    overrides = {
        (1, 0, 0, 0): 200,
        (1, 0, 0, 1): 50,
        (0, 1, 0, 0): 77,
        (2, 0, 0, 0): 160,
        (1, 1, 1, 2): 240,
    }
    blob = encode_vp8_fixture_gray(px, 32, 32, prob_overrides=overrides)
    assert decode_vp8_frame(_bare(blob))["pixels"] == px


def test_fixture_stream_differs_from_engine_encoder():
    # same pixels, materially different wire bytes (skip disabled,
    # deltas present) — this is NOT a stream the engine encoder emits
    targets = [[128], [129], [129], [130]]
    px = _uniform_raster(targets, 1, 4)
    fx = _bare(encode_vp8_fixture_gray(px, 16, 64))
    en = _bare(encode_vp8_gray(px, 16, 64))
    assert fx != en
    out_fx = decode_vp8_frame(fx)
    out_en = decode_vp8_frame(en)
    assert out_fx["pixels"] == out_en["pixels"] == px


def test_fixture_bytes_pinned():
    # wire-format stability pin: deterministic input -> committed hash.
    # If an intentional table/format change moves this, re-pin BOTH
    # hashes and re-verify the decode assertions above still pass.
    raw = bytes(range(1, 9))
    targets = plan_values(raw, 4, 2)
    px = _uniform_raster(targets, 4, 2)
    blob = encode_vp8_fixture_gray(px, 64, 32)
    assert decode_vp8_frame(_bare(blob))["pixels"] == px
    digest = hashlib.sha256(blob).hexdigest()
    pinned = PINNED_FIXTURE_SHA256
    assert digest == pinned, f"fixture bytes moved: {digest}"


# --- engine encoder still round-trips under the real tables -----------------


def test_engine_encoder_roundtrip_real_tables():
    rng = random.Random(912)
    for _ in range(5):
        targets = [
            [rng.randrange(256) for _ in range(4)] for _ in range(4)
        ]
        px = _uniform_raster(targets, 4, 4)
        blob = encode_vp8_gray(px, 64, 64)
        assert decode_vp8_frame(_bare(blob))["pixels"] == px


def test_decoder_rejects_wrong_start_code():
    blob = bytearray(_bare(encode_vp8_gray(bytes([7]) * 256, 16, 16)))
    blob[3] = 0x00
    with pytest.raises(ValueError, match="start code"):
        decode_vp8_frame(bytes(blob))


PINNED_FIXTURE_SHA256 = (
    "b1d4bc9832ce6f87450d6d3e414a3acecfa02b46395579d7b6f8c661a7d0fd09"
)
