"""MP3 frame demux + EXIF APP1/TIFF metadata — module-level coverage
(no Spark). The catalog queries b35/b36 carry the differential DuckDB
oracles; here: geometry math, ID3v2 syncsafe skip, both TIFF byte
orders, fail-closed paths, and coexistence with the real JPEG decoder.
"""

from __future__ import annotations

import pytest

from duckdb_server_spark.operators import exif, mp3
from duckdb_server_spark.operators.jpeg import decode_jpeg, encode_jpeg_gray


# --- MP3 -------------------------------------------------------------------


def test_mp3_roundtrip_mono_128():
    m = mp3.probe_mp3(mp3.write_mp3(5, br_idx=9, sr_idx=0, mono=True))
    assert m["n_frames"] == 5
    assert m["bitrate"] == 128000
    assert m["sample_rate"] == 44100
    assert m["channels"] == 1
    assert m["duration_ms"] == 5 * 1152 * 1000 // 44100
    assert m["vbr"] is False


def test_mp3_id3v2_skip():
    note = b"title: something" * 10
    m = mp3.probe_mp3(mp3.write_mp3(3, id3_note=note))
    assert m["n_frames"] == 3


def test_mp3_every_table_entry_roundtrips():
    for br in range(1, 15):
        for sr in range(3):
            m = mp3.probe_mp3(mp3.write_mp3(2, br_idx=br, sr_idx=sr))
            assert m["bitrate"] == mp3.BITRATES_V1_L3[br] * 1000
            assert m["sample_rate"] == mp3.SAMPLE_RATES[3][sr]


def test_mp3_bad_sync_rejected():
    with pytest.raises(ValueError, match="sync"):
        mp3.probe_mp3(b"\xff\x00" + bytes(16))


def test_mp3_truncated_final_frame_rejected():
    blob = mp3.write_mp3(2)
    with pytest.raises(ValueError, match="truncated"):
        mp3.probe_mp3(blob[:-10])


def test_mp3_nonsyncsafe_id3_rejected():
    bad = b"ID3" + bytes([4, 0, 0]) + b"\x80\x00\x00\x01" + b"x"
    with pytest.raises(ValueError, match="syncsafe"):
        mp3.probe_mp3(bad + mp3.write_mp3(1))


def test_mp3_audio_decode_fails_closed():
    with pytest.raises(NotImplementedError, match="entropy-coded"):
        mp3.decode_mp3_audio(mp3.write_mp3(1))


# --- EXIF ------------------------------------------------------------------

_FIELDS = {
    "make": "Acme", "model": "Cam-9", "orientation": 6,
    "datetime": "2024:05:01 10:00:00", "pixel_x": 4032, "pixel_y": 3024,
}


@pytest.mark.parametrize("big_endian", [False, True])
def test_exif_roundtrip_both_byte_orders(big_endian):
    jpg = encode_jpeg_gray(bytes([100]) * 64, 8, 8)
    app1 = exif.build_exif_app1(
        _FIELDS["make"], _FIELDS["model"], _FIELDS["orientation"],
        _FIELDS["datetime"], _FIELDS["pixel_x"], _FIELDS["pixel_y"],
        big_endian=big_endian,
    )
    meta = exif.parse_exif(exif.insert_exif(jpg, app1))
    assert meta == {
        **_FIELDS, "byte_order": "MM" if big_endian else "II",
    }


def test_exif_tagged_jpeg_still_decodes():
    jpg = encode_jpeg_gray(bytes(range(64)), 8, 8)
    ref = decode_jpeg(jpg)
    app1 = exif.build_exif_app1("A", "B", 1, "2024:01:01 00:00:00", 8, 8)
    out = decode_jpeg(exif.insert_exif(jpg, app1))
    assert out["pixels"] == ref["pixels"]


def test_exif_missing_segment_fails_closed():
    jpg = encode_jpeg_gray(bytes([1]) * 64, 8, 8)
    with pytest.raises(ValueError, match="no APP1"):
        exif.parse_exif(jpg)


def test_exif_bad_byte_order_mark_rejected():
    jpg = encode_jpeg_gray(bytes([1]) * 64, 8, 8)
    app1 = exif.build_exif_app1("A", "B", 1, "2024:01:01 00:00:00", 8, 8)
    broken = bytearray(exif.insert_exif(jpg, app1))
    at = bytes(broken).find(b"Exif\x00\x00") + 6
    broken[at : at + 2] = b"XX"
    with pytest.raises(ValueError, match="byte-order"):
        exif.parse_exif(bytes(broken))


def test_exif_non_jpeg_rejected():
    with pytest.raises(ValueError, match="SOI"):
        exif.parse_exif(b"not a jpeg")
