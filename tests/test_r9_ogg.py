"""Ogg container (RFC 3533) + Ogg-FLAC / Vorbis-header coverage.

Pure-Python module tests (no Spark): page CRC, lacing edges including
continued packets, the public Ogg-FLAC mapping round-trip through the
verified FLAC decoder, and fail-closed behavior for entropy-coded
Vorbis audio. The catalog queries b34/b34b carry the differential
DuckDB oracles (driver + tools/driver_mimic.py).
"""

from __future__ import annotations

import pytest

from duckdb_server_spark.operators import ogg
from duckdb_server_spark.operators.multimodal import decode_audio

SAMPLES = [(k * 37) % 501 - 250 for k in range(64)]


def test_ogg_flac_roundtrip():
    blob = ogg.encode_ogg_flac(SAMPLES, 8000)
    out = ogg.decode_ogg_audio(blob)
    assert out["samples"] == SAMPLES
    assert out["sample_rate"] == 8000
    assert out["channels"] == 1


def test_decode_audio_dispatches_on_oggs_magic():
    blob = ogg.encode_ogg_flac(SAMPLES, 8000)
    assert blob[:4] == b"OggS"
    assert decode_audio(blob)["samples"] == SAMPLES


def test_page_crc_rejects_corruption():
    blob = bytearray(ogg.encode_ogg_flac(SAMPLES, 8000))
    blob[40] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        ogg.read_pages(bytes(blob))


def test_bad_capture_pattern_rejected():
    with pytest.raises(ValueError, match="capture"):
        ogg.read_pages(b"NotO" + bytes(30))


def test_lacing_edges_roundtrip():
    cap = 254 * 255
    for payload in (b"", bytes(255), bytes(510), bytes(cap),
                    bytes(cap + 1), bytes(range(256)) * 300):
        stream = ogg.write_stream(5, [payload], [7])
        st = ogg.demux_ogg(stream)[5]
        assert st["packets"] == [payload]
        assert st["granule"] == 7


def test_continued_packet_pages_flagged():
    big = bytes(300000)
    pages = ogg.read_pages(ogg.write_stream(5, [big], [0]))
    assert len(pages) > 1
    assert pages[0]["flags"] & 0x02          # BOS
    assert not pages[0]["flags"] & 0x01
    for p in pages[1:]:
        assert p["flags"] & 0x01             # continued
    assert pages[-1]["flags"] & 0x04         # EOS
    # non-final pages of a spanning packet carry granule -1
    assert all(p["granule"] == -1 for p in pages[:-1])


def test_multi_packet_stream_and_granules():
    pkts = [b"\x7fFLAChdr", b"frame-one", b"frame-two"]
    st = ogg.demux_ogg(ogg.write_stream(11, pkts, [0, 64, 128]))[11]
    assert st["packets"] == pkts
    assert st["granule"] == 128


def test_vorbis_id_header_roundtrip():
    vid = ogg.encode_vorbis_id(2, 44100, 128000)
    meta = ogg.parse_vorbis_id(vid)
    assert meta == {
        "codec": "vorbis", "channels": 2, "sample_rate": 44100,
        "bitrate_nominal": 128000, "blocksize_0": 256, "blocksize_1": 256,
    }


def test_probe_ogg_flac_fields():
    blob = ogg.encode_ogg_flac(SAMPLES, 8000, serial=42)
    meta = ogg.probe_ogg(blob)
    assert meta["codec"] == "flac"
    assert meta["sample_rate"] == 8000
    assert meta["serial"] == 42
    assert meta["n_packets"] == 2
    assert meta["granule_total"] == 64


def test_vorbis_header_only_stream_fails_closed():
    # round 11: Vorbis audio DECODES (operators/vorbis.py); a stream
    # carrying only the identification header — no comment/setup — is
    # malformed and must fail closed, not index past its packets
    vb = ogg.write_stream(7, [ogg.encode_vorbis_id(1, 22050)], [0])
    with pytest.raises(ValueError, match="header packets"):
        ogg.decode_ogg_audio(vb)


def test_unknown_codec_mapping_fails_closed():
    stream = ogg.write_stream(3, [b"\x01theora\x00\x00"], [0])
    with pytest.raises(NotImplementedError, match="unknown codec"):
        ogg.probe_ogg(stream)


def test_truncated_stream_rejected():
    blob = ogg.encode_ogg_flac(SAMPLES, 8000)
    with pytest.raises(ValueError):
        ogg.read_pages(blob[:-3])


def test_ogg_flac_skips_declared_metadata_headers():
    """A stream declaring one extra header packet (e.g. VORBIS_COMMENT)
    must skip it before the audio frames, per the mapping."""
    from duckdb_server_spark.operators.flac import encode_flac

    native = encode_flac(SAMPLES, 8000)
    meta_len = int.from_bytes(native[5:8], "big")
    split = 8 + meta_len
    head = b"\x7fFLAC" + bytes([1, 0]) + (1).to_bytes(2, "big") \
        + native[:split]
    comment = b"\x84\x00\x00\x04misc"  # last-flag VORBIS_COMMENT-ish block
    stream = ogg.write_stream(5, [head, comment, native[split:]], [0, 0, 64])
    out = ogg.decode_ogg_audio(stream)
    assert out["samples"] == SAMPLES
