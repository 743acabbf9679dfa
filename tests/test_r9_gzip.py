"""gzip member framing (RFC 1952) — module coverage, no Spark. The
catalog query b74_gzip_corpus carries the differential oracle."""

from __future__ import annotations

import gzip as stdgzip

import pytest

from duckdb_server_spark.operators import gzipio


def test_roundtrip_and_stdlib_interop_both_ways():
    data = b"hello gzip world " * 100
    ours = gzipio.write_member(data, name="rec-0.txt")
    assert stdgzip.decompress(ours) == data          # stdlib reads ours
    std = stdgzip.compress(b"from stdlib", 5)
    assert gzipio.decompress_all(std) == b"from stdlib"  # we read stdlib


def test_multi_member_walk_with_names():
    blob = gzipio.write_member(b"part-one|") + gzipio.write_member(
        b"part-two", name="x"
    )
    members = gzipio.read_members(blob)
    assert [m["data"] for m in members] == [b"part-one|", b"part-two"]
    assert members[0]["name"] is None and members[1]["name"] == "x"
    assert sum(m["compressed_size"] for m in members) == len(blob)
    assert gzipio.decompress_all(blob) == b"part-one|part-two"


def test_member_writer_is_deterministic():
    assert gzipio.write_member(b"abc") == gzipio.write_member(b"abc")


def test_crc_mismatch_rejected():
    blob = bytearray(gzipio.write_member(b"payload"))
    blob[-6] ^= 1
    with pytest.raises(ValueError, match="CRC32"):
        gzipio.read_members(bytes(blob))


def test_isize_mismatch_rejected():
    blob = bytearray(gzipio.write_member(b"payload"))
    blob[-1] ^= 1
    with pytest.raises(ValueError, match="ISIZE"):
        gzipio.read_members(bytes(blob))


def test_truncated_trailer_rejected():
    blob = gzipio.write_member(b"payload")
    with pytest.raises(ValueError, match="truncated"):
        gzipio.read_members(blob[:-3])


def test_bad_magic_and_reserved_flags_rejected():
    with pytest.raises(ValueError, match="magic"):
        gzipio.read_members(b"\x1f\x8c" + bytes(20))
    blob = bytearray(gzipio.write_member(b"x"))
    blob[3] |= 0xE0
    with pytest.raises(ValueError, match="reserved"):
        gzipio.read_members(bytes(blob))


def test_empty_payload_rejected():
    with pytest.raises(ValueError, match="empty"):
        gzipio.read_members(b"")


def test_fextra_and_fcomment_fields_skip():
    import struct

    body_member = gzipio.write_member(b"data-after-extras")
    # hand-build a member with FEXTRA + FCOMMENT + FNAME
    flg = 4 | 8 | 16
    hdr = struct.pack("<4BIBB", 0x1F, 0x8B, 8, flg, 0, 0, 255)
    hdr += struct.pack("<H", 4) + b"XTRA"          # FEXTRA
    hdr += b"a-name\x00"                           # FNAME
    hdr += b"a comment\x00"                        # FCOMMENT
    raw = body_member[10:]                         # deflate body + trailer
    members = gzipio.read_members(hdr + raw)
    assert members[0]["data"] == b"data-after-extras"
    assert members[0]["name"] == "a-name"
