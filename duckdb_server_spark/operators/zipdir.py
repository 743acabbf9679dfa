"""ZIP archive reading via the central directory — hand-rolled from the
public PKWARE APPNOTE layout: datasets ship as zip bundles, and the
central directory is what makes member access O(1) AT 100 TB — the
reader seeks to the EOCD at the tail, walks the directory, and fetches
ONE member's bytes by offset without scanning the archive (exactly the
access pattern MP4's stbl and WebM's Cues give video, X110/X113 —
applied to the archive container).

Layout parsed (all little-endian):
* End of central directory (``PK\\x05\\x06``): located by a bounded
  backward scan over the ≤64KiB comment window, validated by its
  comment-length field reaching the payload end;
* central directory entries (``PK\\x01\\x02``): method, CRC-32, sizes,
  name, local-header offset;
* local file headers (``PK\\x03\\x04``) at fetch time — name must match
  the directory (a mismatch means a corrupt or hostile archive);
* methods: 0 = stored, 8 = deflate (stdlib zlib raw streams, the X147
  convention); every extracted member verifies CRC-32 and both sizes.

Fail closed (never garbage bytes): zip64 markers, encryption flags,
the bit-3 data-descriptor flag (streams written without sizes),
multi-disk archives, method values beyond stored/deflate, CRC or size
mismatches, and directory/local header disagreements.

Reference scope: blobs are opaque to the reference (main.go:199);
beyond-reference capability. Scale shape: per-payload walk inside
mapInPandas; the directory walk is O(entries), a member fetch O(1).
"""

from __future__ import annotations

import struct
import zlib

_EOCD_MAGIC = b"PK\x05\x06"
_CDE_MAGIC = b"PK\x01\x02"
_LFH_MAGIC = b"PK\x03\x04"
_DOS_TIME = (0, 0)  # fixed (time, date) words for byte-stable fixtures


def _find_eocd(payload: bytes) -> int:
    """Offset of the EOCD record: backward scan bounded by the maximum
    comment size, validated by the comment length reaching the end."""
    n = len(payload)
    lo = max(0, n - 22 - 0xFFFF)
    i = n - 22
    while i >= lo:
        if payload[i : i + 4] == _EOCD_MAGIC:
            (clen,) = struct.unpack("<H", payload[i + 20 : i + 22])
            if i + 22 + clen == n:
                return i
        i -= 1
    raise ValueError("zip: no end-of-central-directory record")


def list_zip(payload: bytes) -> list[dict]:
    """Central-directory walk → [{name, method ('stored'/'deflate'),
    crc32, csize, usize, offset}] in directory order."""
    eocd = _find_eocd(payload)
    disk, cd_disk, n_here, n_total, cd_size, cd_off = struct.unpack(
        "<HHHHII", payload[eocd + 4 : eocd + 20]
    )
    if disk or cd_disk:
        raise ValueError("zip: multi-disk archives are not supported")
    if n_here != n_total:
        raise ValueError("zip: inconsistent entry counts")
    if n_total == 0xFFFF or cd_off == 0xFFFFFFFF:
        raise ValueError("zip: zip64 archives are not supported")
    entries = []
    pos = cd_off
    for _ in range(n_total):
        if payload[pos : pos + 4] != _CDE_MAGIC:
            raise ValueError("zip: bad central-directory entry magic")
        (
            _vmade, _vneed, flags, method, _t, _d, crc, csize, usize,
            nlen, elen, clen, _dsk, _iattr, _eattr, offset,
        ) = struct.unpack("<HHHHHHIIIHHHHHII", payload[pos + 4 : pos + 46])
        if flags & 0x0001:
            raise ValueError("zip: encrypted entries are not supported")
        if flags & 0x0008:
            raise ValueError(
                "zip: data-descriptor (streamed) entries are not supported"
            )
        name = payload[pos + 46 : pos + 46 + nlen].decode("utf-8")
        if method == 0:
            meth = "stored"
        elif method == 8:
            meth = "deflate"
        else:
            raise ValueError(f"zip: unsupported method {method}")
        entries.append(
            {
                "name": name,
                "method": meth,
                "crc32": crc,
                "csize": csize,
                "usize": usize,
                "offset": offset,
            }
        )
        pos += 46 + nlen + elen + clen
    if pos != eocd and pos != cd_off + cd_size:
        raise ValueError("zip: central directory size mismatch")
    return entries


def read_zip_entry(payload: bytes, name: str) -> bytes:
    """Fetch ONE member by name via the central directory (O(1) in the
    archive size after the directory walk): seek to its local header,
    cross-check the name, inflate, verify CRC-32 and size."""
    entry = next((e for e in list_zip(payload) if e["name"] == name), None)
    if entry is None:
        raise ValueError(f"zip: no such member {name!r}")
    pos = entry["offset"]
    if payload[pos : pos + 4] != _LFH_MAGIC:
        raise ValueError("zip: bad local header magic")
    nlen, elen = struct.unpack("<HH", payload[pos + 26 : pos + 30])
    local_name = payload[pos + 30 : pos + 30 + nlen].decode("utf-8")
    if local_name != name:
        raise ValueError(
            "zip: local header name disagrees with the central directory"
        )
    data_at = pos + 30 + nlen + elen
    raw = payload[data_at : data_at + entry["csize"]]
    if len(raw) != entry["csize"]:
        raise ValueError("zip: truncated member data")
    if entry["method"] == "stored":
        data = raw
    else:
        d = zlib.decompressobj(-15)
        data = d.decompress(raw) + d.flush()
    if len(data) != entry["usize"]:
        raise ValueError("zip: member size mismatch")
    if (zlib.crc32(data) & 0xFFFFFFFF) != entry["crc32"]:
        raise ValueError("zip: member CRC-32 mismatch")
    return data


def write_zip(members: list[tuple[str, bytes, bool]]) -> bytes:
    """A deterministic archive (fixed DOS timestamps): ``members`` is
    [(name, data, deflate?)]."""
    out = bytearray()
    cd = bytearray()
    for name, data, deflate in members:
        nb = name.encode("utf-8")
        crc = zlib.crc32(data) & 0xFFFFFFFF
        if deflate:
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            raw = c.compress(data) + c.flush()
            method = 8
        else:
            raw = data
            method = 0
        offset = len(out)
        out += _LFH_MAGIC + struct.pack(
            "<HHHHHIIIHH", 20, 0, method, *_DOS_TIME, crc, len(raw),
            len(data), len(nb), 0,
        ) + nb + raw
        cd += _CDE_MAGIC + struct.pack(
            "<HHHHHHIIIHHHHHII", 20, 20, 0, method, *_DOS_TIME, crc,
            len(raw), len(data), len(nb), 0, 0, 0, 0, 0, offset,
        ) + nb
    cd_off = len(out)
    out += cd
    out += _EOCD_MAGIC + struct.pack(
        "<HHHHIIH", 0, 0, len(members), len(members), len(cd), cd_off, 0
    )
    return bytes(out)
