"""VP8 constant-table audit artifact (round 10, VERDICT r9 item 6).

Two layers of pinning so any future table correction is a VISIBLE,
deliberate change:

1. ``TABLE_SHA256`` in vp8_tables.py records the committed checksum of
   each constant table; this file recomputes them. Editing a single
   byte of COEF_PROBS / COEF_UPDATE_PROBS / the quantizer lookups
   fails here until the recorded checksum is re-pinned alongside.
2. Per-block-type pinned fixture streams (byte hashes + exact decode):
   - type 1 (Y2): a DC-residual macroblock whose Y2 token path runs;
   - types 0 and 2 (Y-after-Y2, chroma): an all-EOB skip-disabled
     frame where every one of the 25 per-MB blocks token-codes an EOB
     under its band/context probabilities;
   - the §13.4 update walk with replacements in ALL FOUR types —
     including type 3 (B_PRED), whose decode is guarded off but whose
     flag slots are wire-sync load-bearing: the walk consumes all
     4*8*3*11 slots in order, so a wrong type-3 byte desyncs every
     following header bit.

Re-pinning procedure (intentional table corrections only): update the
table, rerun, copy the new hashes into BOTH vp8_tables.TABLE_SHA256 and
the constants below, and confirm the exact-decode assertions still
hold (they are table-independent: encoder and decoder share the table).
"""

from __future__ import annotations

import hashlib
import struct

from duckdb_server_spark.operators import vp8_tables as T
from duckdb_server_spark.operators.vp8 import decode_vp8_frame
from duckdb_server_spark.operators.vp8_fixture import encode_vp8_fixture_gray


def _flat_bytes(tbl) -> bytes:
    out = []

    def walk(x):
        if isinstance(x, (tuple, list)):
            for y in x:
                walk(y)
        else:
            out.append(int(x))

    walk(tbl)
    return bytes(out)


def _u16_bytes(tbl) -> bytes:
    return b"".join(int(v).to_bytes(2, "big") for v in tbl)


def test_table_checksums_match_committed():
    got = {
        "COEF_PROBS": hashlib.sha256(_flat_bytes(T.COEF_PROBS)).hexdigest(),
        "COEF_UPDATE_PROBS": hashlib.sha256(
            _flat_bytes(T.COEF_UPDATE_PROBS)
        ).hexdigest(),
        "DC_QLOOKUP": hashlib.sha256(_u16_bytes(T.DC_QLOOKUP)).hexdigest(),
        "AC_QLOOKUP": hashlib.sha256(_u16_bytes(T.AC_QLOOKUP)).hexdigest(),
    }
    assert got == T.TABLE_SHA256, (
        "constant table bytes moved — if intentional, re-pin TABLE_SHA256"
        " and the fixture hashes in this file together"
    )


def test_coef_table_sizes():
    assert len(_flat_bytes(T.COEF_PROBS)) == 4 * 8 * 3 * 11
    assert len(_flat_bytes(T.COEF_UPDATE_PROBS)) == 4 * 8 * 3 * 11


# --- per-block-type pinned streams -------------------------------------------


def _raster(targets, mb_cols, mb_rows) -> bytes:
    w = mb_cols * 16
    px = bytearray(w * mb_rows * 16)
    for my in range(mb_rows):
        for mx in range(mb_cols):
            v = targets[my][mx]
            for r in range(16):
                base = (my * 16 + r) * w + mx * 16
                px[base : base + 16] = bytes([v]) * 16
    return bytes(px)


def _bare(blob: bytes) -> bytes:
    assert blob[:4] == b"RIFF" and blob[12:16] == b"VP8 "
    size = struct.unpack("<I", blob[16:20])[0]
    return blob[20 : 20 + size]


PIN_TYPE1_Y2 = (
    "103c06494cae5f3dca085a77f6a6cf611fb20ae1562f1e7a8786099516e656e4"
)
PIN_TYPE0_TYPE2_EOB = (
    "8c8980d7cfa3019e4d80a9f8ad2af093c8107d3f08c16ecc37d6dff6aa35cf79"
)
PIN_UPDATE_WALK_ALL_TYPES = (
    "f9c167ce7d32792e3186c46c3f4d925c9d3026158783cfa462ffc24a8ef51767"
)


def test_pinned_type1_y2_stream():
    px = _raster([[129]], 1, 1)  # DC_PRED residual 1 -> Y2 token coded
    blob = encode_vp8_fixture_gray(px, 16, 16)
    assert hashlib.sha256(blob).hexdigest() == PIN_TYPE1_Y2
    assert decode_vp8_frame(_bare(blob))["pixels"] == px


def test_pinned_type0_type2_eob_stream():
    # all-zero residuals with skip DISABLED: 25 explicit EOBs per MB
    # under the type 0 (Y), type 1 (Y2), type 2 (chroma) band probs
    px = _raster([[128, 128], [128, 128]], 2, 2)
    blob = encode_vp8_fixture_gray(px, 32, 32)
    assert hashlib.sha256(blob).hexdigest() == PIN_TYPE0_TYPE2_EOB
    assert decode_vp8_frame(_bare(blob))["pixels"] == px


def test_pinned_update_walk_touches_all_four_types():
    ov = {(0, 0, 0, 0): 111, (1, 0, 0, 0): 200,
          (2, 0, 0, 0): 99, (3, 7, 2, 10): 55}
    px = _raster([[128, 129], [129, 129]], 2, 2)
    blob = encode_vp8_fixture_gray(px, 32, 32, prob_overrides=ov)
    assert hashlib.sha256(blob).hexdigest() == PIN_UPDATE_WALK_ALL_TYPES
    assert decode_vp8_frame(_bare(blob))["pixels"] == px
