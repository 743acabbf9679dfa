"""ustar archive walk (operators/tario.py): round-trips, stdlib
interop both directions, prefix-joined long paths, and fail-closed
guards (checksum, typeflag, truncation, non-octal fields)."""

from __future__ import annotations

import io
import tarfile

import pytest

from duckdb_server_spark.operators.tario import (
    list_tar,
    read_tar_member,
    write_tar,
)


def test_roundtrip_and_block_padding():
    blob = write_tar([("a.txt", b"x" * 511), ("b.txt", b"y" * 513)])
    assert [(e["name"], e["size"]) for e in list_tar(blob)] == [
        ("a.txt", 511), ("b.txt", 513)]
    assert read_tar_member(blob, "a.txt") == b"x" * 511
    assert read_tar_member(blob, "b.txt") == b"y" * 513


def test_stdlib_reads_engine_tar():
    tf = tarfile.open(fileobj=io.BytesIO(write_tar([("d.txt", b"data")])))
    assert tf.extractfile("d.txt").read() == b"data"


def test_engine_reads_stdlib_tar_with_dirs_and_prefix():
    buf = io.BytesIO()
    long_name = "deep/" * 28 + "leaf.txt"  # >100 bytes → ustar prefix
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as t:
        d = tarfile.TarInfo("deep")
        d.type = tarfile.DIRTYPE
        t.addfile(d)
        info = tarfile.TarInfo(long_name)
        data = b"prefix works"
        info.size = len(data)
        t.addfile(info, io.BytesIO(data))
    blob = buf.getvalue()
    entries = list_tar(blob)
    assert entries[0]["typeflag"] == "dir"
    assert entries[1]["name"] == long_name
    assert read_tar_member(blob, long_name) == b"prefix works"


def test_checksum_mismatch_fails_closed():
    blob = bytearray(write_tar([("a.txt", b"abc")]))
    blob[0] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        list_tar(bytes(blob))


def test_unknown_typeflag_fails_closed():
    blob = bytearray(write_tar([("a.txt", b"abc")]))
    blob[156] = ord("2")  # symlink
    # re-fix the checksum so the typeflag guard (not the checksum) fires
    hdr = blob[:512]
    chk = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:512])
    blob[148:156] = f"{chk:06o}\x00 ".encode()
    with pytest.raises(ValueError, match="typeflag"):
        list_tar(bytes(blob))


def test_truncated_data_fails_closed():
    blob = write_tar([("a.txt", b"z" * 900)])
    with pytest.raises(ValueError, match="truncated"):
        list_tar(blob[:600])


def test_non_octal_size_fails_closed():
    blob = bytearray(write_tar([("a.txt", b"abc")]))
    blob[124:136] = b"notanoctal!\x00"
    hdr = blob[:512]
    chk = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:512])
    blob[148:156] = f"{chk:06o}\x00 ".encode()
    with pytest.raises(ValueError, match="non-octal"):
        list_tar(bytes(blob))


def test_directory_member_not_extractable():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as t:
        d = tarfile.TarInfo("only_dir")
        d.type = tarfile.DIRTYPE
        t.addfile(d)
    blob = buf.getvalue()
    dir_name = list_tar(blob)[0]["name"]  # stdlib appends the slash
    with pytest.raises(ValueError, match="not a regular file"):
        read_tar_member(blob, dir_name)
