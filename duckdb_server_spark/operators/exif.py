"""EXIF metadata inside JPEG APP1 — the TIFF-structured tag walk from
the public EXIF/TIFF specifications (TIFF 6.0 §2; EXIF 2.3 §4.6):
byte-order mark (II/MM), IFD0 entry table, the standard tags a
curation pipeline reads (Make 0x010F, Model 0x0110, Orientation
0x0112, DateTime 0x0132), and the Exif sub-IFD (pointer tag 0x8769)
carrying PixelXDimension 0xA002 / PixelYDimension 0xA003. Both byte
orders parse; the writer emits either, so the reader is proven against
non-native endianness.

Reference scope: binary passthrough only in the reference
(main.go:199) — this is beyond-reference capability for the
multimodal column. Scale shape: a bounded tag walk per payload inside
mapInPandas; payloads never cross the driver.
"""

from __future__ import annotations

import struct

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL

TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
TAG_PIXEL_X = 0xA002
TAG_PIXEL_Y = 0xA003


def _entry(endian: str, tag: int, typ: int, value) -> tuple[bytes, bytes]:
    """One 12-byte IFD entry; returns (entry_without_offset, tail_data)
    — the caller patches the offset when tail data is needed."""
    if typ == 2:  # ASCII, NUL-terminated (TIFF 6.0 §2: 7-bit ASCII only)
        try:
            data = value.encode("ascii") + b"\x00"
        except UnicodeEncodeError:
            raise ValueError("EXIF writer: ASCII tag requires 7-bit text")
        count = len(data)
    elif typ == 3:
        data = struct.pack(endian + "H", value)
        count = 1
    elif typ == 4:
        data = struct.pack(endian + "I", value)
        count = 1
    else:
        raise ValueError("EXIF writer: unsupported type")
    head = struct.pack(endian + "HHI", tag, typ, count)
    if len(data) <= 4:
        return head + data.ljust(4, b"\x00"), b""
    return head, data


def build_exif_app1(
    make: str,
    model: str,
    orientation: int,
    datetime_s: str,
    pixel_x: int,
    pixel_y: int,
    big_endian: bool = False,
) -> bytes:
    """An APP1 segment (marker + length + 'Exif\\0\\0' + TIFF): IFD0
    with the four standard tags plus the Exif-IFD pointer; the sub-IFD
    carries the pixel dimensions."""
    e = ">" if big_endian else "<"
    bom = b"MM" if big_endian else b"II"

    def ifd(entries: list[tuple[int, int, object]], base: int) -> bytes:
        """base = absolute TIFF offset of this IFD's first byte."""
        n = len(entries)
        table_len = 2 + 12 * n + 4
        tail_at = base + table_len
        rows, tail = [], b""
        for tag, typ, value in entries:
            head, data = _entry(e, tag, typ, value)
            if data:
                rows.append(head + struct.pack(e + "I", tail_at + len(tail)))
                tail += data
            else:
                rows.append(head)
        return (
            struct.pack(e + "H", n) + b"".join(rows)
            + struct.pack(e + "I", 0) + tail
        )

    # lay out: header(8) → IFD0 → sub-IFD. Compute IFD0 size first with
    # a placeholder pointer, then rebuild with the real sub-IFD offset.
    ifd0_entries = [
        (TAG_MAKE, 2, make),
        (TAG_MODEL, 2, model),
        (TAG_ORIENTATION, 3, orientation),
        (TAG_DATETIME, 2, datetime_s),
        (TAG_EXIF_IFD, 4, 0),
    ]
    ifd0_probe = ifd(ifd0_entries, 8)
    sub_off = 8 + len(ifd0_probe)
    ifd0_entries[-1] = (TAG_EXIF_IFD, 4, sub_off)
    ifd0 = ifd(ifd0_entries, 8)
    sub = ifd([(TAG_PIXEL_X, 4, pixel_x), (TAG_PIXEL_Y, 4, pixel_y)], sub_off)
    tiff = bom + struct.pack(e + "H", 42) + struct.pack(e + "I", 8) + ifd0 + sub
    body = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body


def insert_exif(jpeg: bytes, app1: bytes) -> bytes:
    """Splice an APP1 segment right after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("EXIF: not a JPEG (no SOI)")
    return jpeg[:2] + app1 + jpeg[2:]


def _read_value(endian: str, typ: int, count: int, raw4: bytes,
                tiff: bytes) -> object:
    size = _TYPE_SIZES.get(typ)
    if size is None:
        return None
    total = size * count
    if total <= 4:
        data = raw4[:total]
    else:
        off = struct.unpack(endian + "I", raw4)[0]
        data = tiff[off : off + total]
        if len(data) != total:
            raise ValueError("EXIF: value offset out of bounds")
    if typ == 2:
        try:
            return data.rstrip(b"\x00").decode("ascii")
        except UnicodeDecodeError:
            raise ValueError("EXIF: non-ASCII bytes in ASCII tag")
    if typ == 3:
        return struct.unpack(endian + "H", data[:2])[0]
    if typ == 4:
        return struct.unpack(endian + "I", data[:4])[0]
    return data


def _walk_ifd(endian: str, tiff: bytes, off: int) -> dict[int, object]:
    if off + 2 > len(tiff):
        raise ValueError("EXIF: IFD offset out of bounds")
    (n,) = struct.unpack(endian + "H", tiff[off : off + 2])
    tags: dict[int, object] = {}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, count = struct.unpack(endian + "HHI", tiff[base : base + 8])
        tags[tag] = _read_value(endian, typ, count, tiff[base + 8 : base + 12],
                                tiff)
    return tags


def parse_exif(jpeg: bytes) -> dict:
    """Find APP1/Exif in a JPEG's segment chain and walk IFD0 + the
    Exif sub-IFD. Raises when no EXIF is present (fail closed — absence
    is information a curation pipeline wants surfaced, not defaulted)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("EXIF: not a JPEG (no SOI)")
    pos = 2
    while pos + 4 <= len(jpeg) and jpeg[pos] == 0xFF:
        marker = jpeg[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seg_len,) = struct.unpack(">H", jpeg[pos + 2 : pos + 4])
        if marker == 0xE1 and jpeg[pos + 4 : pos + 10] == b"Exif\x00\x00":
            tiff = jpeg[pos + 10 : pos + 2 + seg_len]
            return _parse_tiff(tiff)
        if marker == 0xDA:  # start of scan — no EXIF ahead
            break
        pos += 2 + seg_len
    raise ValueError("EXIF: no APP1/Exif segment")


def _parse_tiff(tiff: bytes) -> dict:
    if tiff[:2] == b"II":
        endian = "<"
    elif tiff[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError("EXIF: bad TIFF byte-order mark")
    if struct.unpack(endian + "H", tiff[2:4])[0] != 42:
        raise ValueError("EXIF: bad TIFF magic")
    (ifd0_off,) = struct.unpack(endian + "I", tiff[4:8])
    tags = _walk_ifd(endian, tiff, ifd0_off)
    out = {
        "make": tags.get(TAG_MAKE),
        "model": tags.get(TAG_MODEL),
        "orientation": tags.get(TAG_ORIENTATION),
        "datetime": tags.get(TAG_DATETIME),
        "pixel_x": None,
        "pixel_y": None,
        "byte_order": "MM" if endian == ">" else "II",
    }
    sub_off = tags.get(TAG_EXIF_IFD)
    if isinstance(sub_off, int):
        sub = _walk_ifd(endian, tiff, sub_off)
        out["pixel_x"] = sub.get(TAG_PIXEL_X)
        out["pixel_y"] = sub.get(TAG_PIXEL_Y)
    return out
