"""Pure-stdlib GIF codec — extends the multimodal image dispatch
(operators/multimodal.py) to a third real format, the PNG/JPEG playbook
(operators/png.py, operators/jpeg.py) applied to GIF.

GIF needs no external library: the container is a fixed header +
logical screen descriptor + optional color tables + a block stream, and
pixel data is LZW with variable code width (GIF89a spec, CompuServe
1990). This module implements the full 8-bit palette path in both
directions:

- :func:`encode_gif` — build a spec-valid GIF87a/89a from raw palette
  indices: real LZW compression (growing code table through every
  width step 9→12 bits, clear-code reset at table overflow), optional
  4-pass interlacing, 255-byte sub-block framing;
- :func:`decode_gif` — parse header + LSD, read the global/local color
  table, skip extension blocks, LZW-decompress the first image
  (variable code width, clear/EOI handling, the KwKwK special case),
  and de-interlace when flagged.

Worker-side only: these run inside mapInPandas bodies over Arrow
batches; payloads never visit the driver. The reference embeds a full
media-capable engine (main.go:199 passes any SQL through), so format
breadth here mirrors capability breadth there.
"""

from __future__ import annotations

import struct

GIF_SIGNATURES = (b"GIF87a", b"GIF89a")

# 4-pass interlace: (row offset, row step) per pass, GIF89a spec §23
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))
_MAX_CODE_WIDTH = 12


def _interlace_order(height: int) -> list[int]:
    order = []
    for off, step in _INTERLACE_PASSES:
        order.extend(range(off, height, step))
    return order


class _BitWriter:
    """LSB-first bit packer (GIF packs LZW codes little-endian)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = self.nbits = 0
        return bytes(self.out)


def _lzw_compress(data: bytes, min_code_size: int) -> bytes:
    """Real GIF LZW: dictionary of byte strings → codes, code width grows
    9→12 bits, clear code emitted on table overflow (so decoders exercise
    the reset path on large inputs)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _BitWriter()
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    w.write(clear, width)
    prefix = b""
    for byte in data:
        cand = prefix + bytes([byte])
        if cand in table:
            prefix = cand
            continue
        w.write(table[prefix], width)
        if next_code < (1 << _MAX_CODE_WIDTH):
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < _MAX_CODE_WIDTH:
                width += 1
        else:
            w.write(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([byte])
    if prefix:
        w.write(table[prefix], width)
    w.write(eoi, width)
    return w.flush()


def _lzw_decompress(data: bytes, min_code_size: int, expected: int) -> bytearray:
    """Variable-width LZW decode (LSB-first), clear/EOI handling and the
    KwKwK case (code == next_code). Stops after ``expected`` pixels."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = nbits = pos = 0
    prev: bytes | None = None
    n = len(data)
    while len(out) < expected:
        while nbits < width:
            if pos >= n:
                raise ValueError("GIF: LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"GIF: bad LZW code {code}")
        out.extend(entry)
        if prev is not None and len(table) < (1 << _MAX_CODE_WIDTH):
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry
    return out


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)  # block terminator
    return bytes(out)


def encode_gif(
    indices: bytes,
    width: int,
    height: int,
    palette: bytes | None = None,
    interlace: bool = False,
) -> bytes:
    """Raw 8-bit palette indices → GIF89a bytes. Default palette is the
    256-entry grayscale ramp (index i → RGB(i,i,i)), which makes the
    index stream equal the gray pixel stream — the property the
    differential oracle relies on."""
    if len(indices) != width * height:
        raise ValueError("GIF: indices do not match geometry")
    if palette is None:
        palette = bytes(v for i in range(256) for v in (i, i, i))
    if len(palette) != 256 * 3:
        raise ValueError("GIF: palette must have 256 RGB entries")
    out = bytearray()
    out.extend(b"GIF89a")
    # logical screen descriptor: global color table, 8 bits/channel, 256 entries
    out.extend(struct.pack("<HHBBB", width, height, 0xF7, 0, 0))
    out.extend(palette)
    # image descriptor
    flags = 0x40 if interlace else 0
    out.extend(struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, flags))
    if interlace:
        rows = _interlace_order(height)
        data = b"".join(
            indices[r * width : (r + 1) * width] for r in rows
        )
    else:
        data = indices
    out.append(8)  # LZW minimum code size
    out.extend(_sub_blocks(_lzw_compress(data, 8)))
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif(payload: bytes) -> dict:
    """GIF bytes → {'pixels': bytes (gray via palette R channel),
    'width', 'height'}. Walks the block stream (skipping 89a extension
    blocks), reads the applicable color table, LZW-decompresses the
    first image, and de-interlaces when the descriptor flags it."""
    if payload[:6] not in GIF_SIGNATURES:
        raise ValueError("not a GIF")
    sw, sh, lsd_flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    global_table = None
    if lsd_flags & 0x80:
        size = 2 << (lsd_flags & 0x07)
        global_table = payload[pos : pos + 3 * size]
        pos += 3 * size
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos]:
                pos += payload[pos] + 1
            pos += 1
        elif block == 0x2C:
            left, top, w, h, flags = struct.unpack_from("<HHHHB", payload, pos)
            pos += 9
            table = global_table
            if flags & 0x80:
                size = 2 << (flags & 0x07)
                table = payload[pos : pos + 3 * size]
                pos += 3 * size
            if table is None:
                raise ValueError("GIF: image has no color table")
            min_code = payload[pos]
            pos += 1
            lzw = bytearray()
            while payload[pos]:
                ln = payload[pos]
                lzw.extend(payload[pos + 1 : pos + 1 + ln])
                pos += ln + 1
            pos += 1
            idx = _lzw_decompress(bytes(lzw), min_code, w * h)
            if len(idx) < w * h:
                raise ValueError("GIF: pixel data short")
            if flags & 0x40:  # de-interlace
                rows = _interlace_order(h)
                ordered = bytearray(w * h)
                for src, dst in enumerate(rows):
                    ordered[dst * w : (dst + 1) * w] = idx[
                        src * w : (src + 1) * w
                    ]
                idx = ordered
            idx = idx[: w * h]
            if max(idx) >= len(table) // 3:
                raise ValueError("GIF: pixel index outside color table")
            pixels = bytes(table[i * 3] for i in idx)
            return {"pixels": pixels, "width": w, "height": h}
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
    raise ValueError("GIF: no image block")
