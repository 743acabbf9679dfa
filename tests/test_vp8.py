"""VP8 (lossy WebP) codec unit tests — boolean coder, transforms,
token coding, prediction, and the exact-reconstruction roundtrip
(operators/vp8.py; the b30e differential oracle is the driver-level
check, these pin the components)."""

import random
import struct

import pytest

from duckdb_server_spark.operators.vp8 import (
    BoolDecoder,
    BoolEncoder,
    CAT_BASE,
    CAT6,
    decode_vp8_frame,
    encode_vp8_gray,
    inv_dct4x4,
    inv_walsh4x4,
)
from duckdb_server_spark.operators.webp import decode_webp


def _mb_image(vals, mbc, mbr):
    w, h = mbc * 16, mbr * 16
    px = bytearray(w * h)
    for my in range(mbr):
        for mx in range(mbc):
            v = vals[my][mx]
            for r in range(16):
                base = (my * 16 + r) * w + mx * 16
                px[base : base + 16] = bytes([v]) * 16
    return bytes(px), w, h


def test_bool_coder_roundtrip_fuzz():
    rng = random.Random(7)
    for _ in range(50):
        n = rng.randrange(1, 400)
        seq = [(rng.randrange(1, 255), rng.randrange(2)) for _ in range(n)]
        enc = BoolEncoder()
        for p, b in seq:
            enc.put(p, b)
        dec = BoolDecoder(enc.bytes())
        assert [dec.get(p) for p, _ in seq] == [b for _, b in seq]


def test_bool_coder_single_bit():
    # the flush must emit the (nbits+8)-bit codeword, not nbits bits
    enc = BoolEncoder()
    enc.put(128, 1)
    data = enc.bytes()
    assert BoolDecoder(data).get(128) == 1


def test_bool_literal_roundtrip():
    enc = BoolEncoder()
    for v, w in ((0, 1), (255, 8), (77, 7), (5, 3)):
        enc.put_literal(v, w)
    dec = BoolDecoder(enc.bytes())
    for v, w in ((0, 1), (255, 8), (77, 7), (5, 3)):
        assert dec.get_literal(w) == v


def test_inv_walsh_dc_only():
    # RFC 6386 DC-only inverse WHT: every output = (dc + 3) >> 3
    for dc in (-1028, -9, -4, 0, 3, 4, 100, 1012):
        out = inv_walsh4x4([dc] + [0] * 15)
        assert out == [(dc + 3) >> 3] * 16


def test_inv_dct_dc_only():
    # DC-only inverse DCT: every output = (dc + 4) >> 3
    for dc in (-500, -8, -1, 0, 1, 7, 8, 500):
        out = inv_dct4x4([dc] + [0] * 15)
        assert out == [(dc + 4) >> 3] * 16


def test_exact_reconstruction_identity():
    # level = 8d - 4 → WHT dc = level, pixel residual = d, for every
    # possible residual (the encoder's exactness contract)
    for d in range(-128, 128):
        level = 8 * d - 4
        dequant = level * 8  # qindex-0 Y2 DC quantizer
        subdc = inv_walsh4x4([dequant] + [0] * 15)
        assert subdc == [level] * 16
        resid = inv_dct4x4([level] + [0] * 15)
        assert resid == [d] * 16


def test_roundtrip_exact_fuzz():
    rng = random.Random(99)
    for trial in range(15):
        mbc, mbr = rng.choice([(1, 1), (2, 3), (4, 4), (5, 2)])
        vals = [
            [rng.randrange(256) for _ in range(mbc)] for _ in range(mbr)
        ]
        if trial % 3 == 0 and mbr > 1:
            vals[1] = list(vals[0])  # V_PRED skip row
        if trial % 3 == 1 and mbc > 1:
            for row in vals:
                row[1] = row[0]  # H_PRED skip column
        px, w, h = _mb_image(vals, mbc, mbr)
        out = decode_webp(encode_vp8_gray(px, w, h))
        assert (out["width"], out["height"]) == (w, h)
        assert out["pixels"] == px


def test_roundtrip_extreme_values():
    # residual extremes: 0 vs 255 checkerboard exercises cat5/cat6 tokens
    vals = [[0, 255, 0, 255], [255, 0, 255, 0]]
    px, w, h = _mb_image(vals, 4, 2)
    assert decode_webp(encode_vp8_gray(px, w, h))["pixels"] == px


def test_all_skip_image():
    px = bytes([128]) * (48 * 32)
    blob = encode_vp8_gray(px, 48, 32)
    assert decode_webp(blob)["pixels"] == px


def test_cat6_level_range():
    # worst-case token level |8*(-128) - 4| = 1028 fits in cat6's range
    assert CAT_BASE[CAT6] + 2047 >= 1028


def test_container_shape():
    px, w, h = _mb_image([[10]], 1, 1)
    blob = encode_vp8_gray(px, w, h)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WEBP"
    assert blob[12:16] == b"VP8 "
    frame = blob[20:]
    assert frame[3:6] == b"\x9d\x01\x2a"
    assert struct.unpack("<H", frame[6:8])[0] & 0x3FFF == 16
    assert (frame[0] & 1) == 0  # keyframe bit


def test_subset_guards():
    with pytest.raises(NotImplementedError):
        encode_vp8_gray(bytes(10 * 10), 10, 10)  # unaligned dims
    px = bytearray(16 * 16)
    px[0] = 1  # non-uniform macroblock
    with pytest.raises(NotImplementedError):
        encode_vp8_gray(bytes(px), 16, 16)
    with pytest.raises(ValueError):
        decode_vp8_frame(b"\x00" * 4)  # truncated
    good = encode_vp8_gray(bytes([5]) * 256, 16, 16)
    frame = bytearray(good[20:])
    frame[3] = 0x9C  # corrupt start code
    with pytest.raises(ValueError):
        decode_vp8_frame(bytes(frame))


def test_decode_image_dispatch():
    from duckdb_server_spark.operators.multimodal import decode_image

    px, w, h = _mb_image([[200, 17]], 2, 1)
    img = decode_image(encode_vp8_gray(px, w, h))
    assert img["pixels"] == px and img["width"] == 32


def test_bare_frame_dispatch():
    # WebM SimpleBlocks carry VP8 frames without the RIFF wrapper —
    # decode_image dispatches on the frame's own 9d 01 2a start code
    from duckdb_server_spark.operators.multimodal import decode_image

    px, w, h = _mb_image([[7]], 1, 1)
    blob = encode_vp8_gray(px, w, h)
    n = int.from_bytes(blob[16:20], "little")
    bare = blob[20 : 20 + n]
    assert decode_image(bare)["pixels"] == px


def test_webm_vp8_end_to_end():
    # V_VP8 contract: webm DocType, bare frames in SimpleBlocks, cue
    # fetch, then real VP8 entropy decode per sampled frame
    from duckdb_server_spark.operators.webm import (
        decode_webm_frame,
        encode_webm_mjpeg,
        probe_webm,
    )
    from duckdb_server_spark.operators.multimodal import decode_image

    vals = [10, 200, 55, 128]
    frames = []
    for v in vals:
        blob = encode_vp8_gray(bytes([v]) * 256, 16, 16)
        n = int.from_bytes(blob[16:20], "little")
        frames.append(blob[20 : 20 + n])
    webm = encode_webm_mjpeg(frames, 16, 16, codec_id=b"V_VP8")
    assert b"webm" in webm[:64] and b"V_VP8" in webm[:256]
    video = probe_webm(webm)
    assert video["declared_frames"] == 4
    for i, v in enumerate(vals):
        img = decode_image(decode_webm_frame(webm, i, video))
        assert img["pixels"] == bytes([v]) * 256
