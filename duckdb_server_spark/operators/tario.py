"""TAR (ustar) member walk — hand-rolled from the public POSIX ustar
layout: dataset bundles and model checkpoints ship as tarballs (often
inside the X147/X152 compression layers), and the 512-byte header
blocks make a linear member index cheap: name, octal size, typeflag,
checksum — then seek size rounded to the block.

Parsed per the public format:
* 512-byte headers: name (100), mode/uid/gid (octal), size (12,
  octal), mtime (12), chksum (8, the unsigned byte sum with the
  checksum field read as spaces), typeflag, ustar magic + prefix
  (155) for long paths;
* regular files ('0'/NUL) carry data in size-rounded 512 blocks;
  directories ('5') carry none; other typeflags (links, PAX/GNU
  extensions) fail closed rather than silently mis-indexing;
* end of archive: two zero blocks (tolerated truncated at payload end).

Fail closed: bad checksum, non-octal size, truncated data, unknown
typeflag. stdlib-tarfile interop proven both directions in tests.

Reference scope: blobs are opaque to the reference (main.go:199);
beyond-reference capability. Scale shape: linear header walk per
payload inside mapInPandas — member data is only touched when
extracted.
"""

from __future__ import annotations

_BLOCK = 512


def _octal(field: bytes, what: str) -> int:
    s = field.split(b"\x00")[0].strip()
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError:
        raise ValueError(f"tar: non-octal {what} field {field!r}")


def list_tar(payload: bytes) -> list[dict]:
    """Walk the header chain → [{name, size, typeflag, offset}] where
    offset points at the member's data."""
    out, pos = [], 0
    n = len(payload)
    while pos + _BLOCK <= n:
        block = payload[pos : pos + _BLOCK]
        if block == b"\x00" * _BLOCK:
            break  # end-of-archive marker
        stored = _octal(block[148:156], "checksum")
        summed = sum(block[:148]) + 8 * 0x20 + sum(block[156:])
        if stored != summed:
            raise ValueError("tar: header checksum mismatch")
        name = block[0:100].split(b"\x00")[0].decode("utf-8")
        if block[257:262] == b"ustar" and block[345:346] != b"\x00":
            prefix = block[345:500].split(b"\x00")[0].decode("utf-8")
            if prefix:
                name = prefix + "/" + name
        size = _octal(block[124:136], "size")
        typeflag = block[156:157]
        if typeflag not in (b"0", b"\x00", b"5"):
            raise ValueError(
                f"tar: unsupported typeflag {typeflag!r} "
                "(links / PAX / GNU extensions fail closed)"
            )
        pos += _BLOCK
        if typeflag == b"5":
            size = 0
        if pos + size > n:
            raise ValueError("tar: truncated member data")
        out.append(
            {
                "name": name,
                "size": size,
                "typeflag": "dir" if typeflag == b"5" else "file",
                "offset": pos,
            }
        )
        pos += (size + _BLOCK - 1) // _BLOCK * _BLOCK
    if not out:
        raise ValueError("tar: no members")
    return out


def read_tar_member(payload: bytes, name: str) -> bytes:
    entry = next((e for e in list_tar(payload) if e["name"] == name), None)
    if entry is None:
        raise ValueError(f"tar: no such member {name!r}")
    if entry["typeflag"] != "file":
        raise ValueError(f"tar: {name!r} is not a regular file")
    return payload[entry["offset"] : entry["offset"] + entry["size"]]


def write_tar(members: list[tuple[str, bytes]]) -> bytes:
    """A deterministic ustar archive (zero mtime/uid/gid, mode 0644)."""
    out = bytearray()
    for name, data in members:
        nb = name.encode("utf-8")
        if len(nb) > 100:
            raise ValueError("tar writer: name exceeds 100 bytes")
        hdr = bytearray(_BLOCK)
        hdr[0 : len(nb)] = nb
        hdr[100:108] = b"0000644\x00"
        hdr[108:116] = b"0000000\x00"
        hdr[116:124] = b"0000000\x00"
        hdr[124:136] = f"{len(data):011o}\x00".encode()
        hdr[136:148] = b"00000000000\x00"
        hdr[148:156] = b" " * 8  # checksum placeholder
        hdr[156:157] = b"0"
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        chk = sum(hdr)
        hdr[148:156] = f"{chk:06o}\x00 ".encode()
        out += hdr + data
        pad = (-len(data)) % _BLOCK
        out += bytes(pad)
    out += bytes(2 * _BLOCK)
    return bytes(out)
