"""gzip member framing (RFC 1952) — the compressed-corpus container:
web-archive corpora (WARC/WET) arrive as CONCATENATED gzip members,
one record each, so the reader must walk members, verify each member's
CRC32 + ISIZE trailer, and honor the optional FEXTRA/FNAME/FCOMMENT
header fields. The deflate bodies use stdlib zlib (raw streams,
wbits=-15) — the container walk, trailer verification, and member
splitting here are the engine's own, from the public RFC.

Reference scope: the reference moves blobs opaquely (main.go:199);
this is beyond-reference capability for compressed text columns.
Scale shape: a linear member walk per payload inside mapInPandas —
embarrassingly parallel, payloads never cross the driver.
"""

from __future__ import annotations

import struct
import zlib

_FTEXT, _FHCRC, _FEXTRA, _FNAME, _FCOMMENT = 1, 2, 4, 8, 16


def write_member(data: bytes, name: str | None = None, level: int = 6) -> bytes:
    """One deterministic gzip member: MTIME=0, XFL=0, OS=255 (unknown),
    optional FNAME — byte-stable across runs for fixture use."""
    flg = _FNAME if name else 0
    header = struct.pack("<4BIBB", 0x1F, 0x8B, 8, flg, 0, 0, 255)
    if name:
        header += name.encode("latin-1") + b"\x00"
    comp = zlib.compressobj(level, zlib.DEFLATED, -15)
    body = comp.compress(data) + comp.flush()
    trailer = struct.pack("<II", zlib.crc32(data) & 0xFFFFFFFF,
                          len(data) & 0xFFFFFFFF)
    return header + body + trailer


def read_members(payload: bytes) -> list[dict]:
    """Walk every concatenated member, verifying magic, CRC32, and
    ISIZE; returns [{data, name, compressed_size}]."""
    out, pos = [], 0
    while pos < len(payload):
        if pos + 10 > len(payload):
            raise ValueError("gzip: truncated header")
        if payload[pos : pos + 2] != b"\x1f\x8b":
            raise ValueError("gzip: bad magic")
        if payload[pos + 2] != 8:
            raise ValueError("gzip: unknown compression method")
        flg = payload[pos + 3]
        if flg & 0xE0:
            raise ValueError("gzip: reserved FLG bits set")
        start = pos
        pos += 10
        if pos > len(payload):
            raise ValueError("gzip: truncated header")
        if flg & _FEXTRA:
            if pos + 2 > len(payload):
                raise ValueError("gzip: truncated header (FEXTRA length)")
            (xlen,) = struct.unpack("<H", payload[pos : pos + 2])
            pos += 2 + xlen
            if pos > len(payload):
                raise ValueError("gzip: truncated header (FEXTRA field)")
        name = None
        if flg & _FNAME:
            end = payload.find(b"\x00", pos)
            if end < 0:
                raise ValueError("gzip: truncated header (unterminated FNAME)")
            name = payload[pos:end].decode("latin-1")
            pos = end + 1
        if flg & _FCOMMENT:
            end = payload.find(b"\x00", pos)
            if end < 0:
                raise ValueError("gzip: truncated header (unterminated FCOMMENT)")
            pos = end + 1
        if flg & _FHCRC:
            pos += 2
        if pos > len(payload):
            raise ValueError("gzip: truncated header")
        d = zlib.decompressobj(-15)
        data = d.decompress(payload[pos:])
        data += d.flush()
        consumed = len(payload) - pos - len(d.unused_data)
        pos += consumed
        if pos + 8 > len(payload):
            raise ValueError("gzip: truncated member trailer")
        crc, isize = struct.unpack("<II", payload[pos : pos + 8])
        pos += 8
        if crc != (zlib.crc32(data) & 0xFFFFFFFF):
            raise ValueError("gzip: member CRC32 mismatch")
        if isize != (len(data) & 0xFFFFFFFF):
            raise ValueError("gzip: member ISIZE mismatch")
        out.append({
            "data": data,
            "name": name,
            "compressed_size": pos - start,
        })
    if not out:
        raise ValueError("gzip: empty payload")
    return out


def decompress_all(payload: bytes) -> bytes:
    """All members' data concatenated (the WARC/WET read shape)."""
    return b"".join(m["data"] for m in read_members(payload))
