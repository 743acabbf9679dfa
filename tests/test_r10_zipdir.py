"""ZIP central-directory reading (operators/zipdir.py): round-trips,
stdlib interop both directions, O(1)-by-offset member fetch, and the
fail-closed guards for every unsupported/corrupt archive shape."""

from __future__ import annotations

import io
import struct
import zipfile

import pytest

from duckdb_server_spark.operators.zipdir import (
    list_zip,
    read_zip_entry,
    write_zip,
)


def _blob():
    return write_zip([
        ("text.txt", b"hello corpus " * 10, True),
        ("meta.json", b'{"id": 7}', False),
        ("dir/nested.bin", bytes(range(64)), True),
    ])


def test_directory_walk_and_extract():
    blob = _blob()
    entries = list_zip(blob)
    assert [e["name"] for e in entries] == [
        "text.txt", "meta.json", "dir/nested.bin"]
    assert entries[0]["method"] == "deflate"
    assert entries[1]["method"] == "stored"
    assert read_zip_entry(blob, "text.txt") == b"hello corpus " * 10
    assert read_zip_entry(blob, "dir/nested.bin") == bytes(range(64))


def test_stdlib_reads_engine_archive():
    zf = zipfile.ZipFile(io.BytesIO(_blob()))
    assert zf.read("meta.json") == b'{"id": 7}'
    assert zf.testzip() is None  # stdlib CRC sweep agrees


def test_engine_reads_stdlib_archive_with_comment():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("a.txt", "alpha" * 100)
        z.writestr("b.bin", bytes(255 for _ in range(10)))
        z.comment = b"trailing archive comment"
    blob = buf.getvalue()
    assert read_zip_entry(blob, "a.txt") == b"alpha" * 100
    assert len(list_zip(blob)) == 2


def test_missing_member_fails_closed():
    with pytest.raises(ValueError, match="no such member"):
        read_zip_entry(_blob(), "absent.txt")


def test_crc_mismatch_fails_closed():
    blob = bytearray(_blob())
    # corrupt a byte inside the stored meta.json payload
    idx = blob.find(b'{"id": 7}')
    blob[idx + 2] ^= 0xFF
    with pytest.raises(ValueError, match="CRC-32"):
        read_zip_entry(bytes(blob), "meta.json")


def test_name_mismatch_fails_closed():
    blob = bytearray(_blob())
    # tamper the FIRST local header's name (central directory unchanged)
    lfh = blob.find(b"PK\x03\x04")
    name_at = lfh + 30
    blob[name_at : name_at + 8] = b"evil.txt"
    with pytest.raises(ValueError, match="disagrees"):
        read_zip_entry(bytes(blob), "text.txt")


def test_encrypted_flag_fails_closed():
    blob = bytearray(_blob())
    cde = blob.find(b"PK\x01\x02")
    flags_at = cde + 8
    blob[flags_at] |= 0x01
    with pytest.raises(ValueError, match="encrypted"):
        list_zip(bytes(blob))


def test_data_descriptor_flag_fails_closed():
    blob = bytearray(_blob())
    cde = blob.find(b"PK\x01\x02")
    blob[cde + 8] |= 0x08
    with pytest.raises(ValueError, match="data-descriptor"):
        list_zip(bytes(blob))


def test_unsupported_method_fails_closed():
    blob = bytearray(_blob())
    cde = blob.find(b"PK\x01\x02")
    blob[cde + 10] = 12  # bzip2 method id
    with pytest.raises(ValueError, match="method"):
        list_zip(bytes(blob))


def test_no_eocd_fails_closed():
    with pytest.raises(ValueError, match="end-of-central-directory"):
        list_zip(b"PK\x03\x04 definitely not a full archive")


def test_truncated_member_fails_closed():
    blob = _blob()
    entries = list_zip(blob)
    # rebuild an archive whose directory claims more csize than present
    bad = bytearray(blob)
    cde = bad.find(b"PK\x01\x02")
    struct.pack_into("<I", bad, cde + 20, entries[0]["csize"] + 10_000)
    with pytest.raises(ValueError, match="truncated|size"):
        read_zip_entry(bytes(bad), "text.txt")
