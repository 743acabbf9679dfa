"""Pure-stdlib PNG codec — the real decoder behind the multimodal column
plumbing (operators/multimodal.py).

No PIL/ffmpeg exists in this environment, but PNG needs neither: the
container is chunked (length/type/payload/CRC), pixel data is zlib
(stdlib) over per-scanline difference filters defined in five closed
forms (RFC 2083 §6). This module implements the full non-interlaced
8-bit path — grayscale, RGB, RGBA — in both directions:

- :func:`encode_png` — build a spec-valid PNG from raw pixels (any of
  the five scanline filters, so the decoder's unfilter paths are all
  exercisable);
- :func:`decode_png` — parse signature + IHDR, concatenate IDAT chunks,
  inflate, reverse the per-scanline filter (None/Sub/Up/Average/Paeth),
  and return the raw pixel bytes with geometry.

Worker-side only: these run inside mapInPandas bodies over Arrow
batches; payloads never visit the driver.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(
    pixels: bytes,
    width: int,
    height: int,
    color_type: int = 0,
    filter_type: int = 0,
) -> bytes:
    """Raw 8-bit pixels → PNG bytes. ``filter_type`` applies to every
    scanline (encoders may vary per line; one is enough to exercise each
    decoder path)."""
    ch = _CHANNELS[color_type]
    stride = width * ch
    if len(pixels) != stride * height:
        raise ValueError(f"expected {stride * height} pixel bytes, got {len(pixels)}")
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        raw.append(filter_type)
        if filter_type == 0:  # None
            raw += line
        elif filter_type == 1:  # Sub
            raw += bytes(
                (line[i] - (line[i - ch] if i >= ch else 0)) & 0xFF
                for i in range(stride)
            )
        elif filter_type == 2:  # Up
            raw += bytes((line[i] - prev[i]) & 0xFF for i in range(stride))
        elif filter_type == 3:  # Average
            raw += bytes(
                (line[i] - ((line[i - ch] if i >= ch else 0) + prev[i]) // 2) & 0xFF
                for i in range(stride)
            )
        elif filter_type == 4:  # Paeth
            raw += bytes(
                (
                    line[i]
                    - _paeth(
                        line[i - ch] if i >= ch else 0,
                        prev[i],
                        prev[i - ch] if i >= ch else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        else:
            raise ValueError(f"unknown filter type {filter_type}")
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> dict:
    """PNG bytes → ``{width, height, color_type, channels, pixels}`` with
    ``pixels`` the unfiltered raw bytes (row-major, interleaved samples).

    Supports the 8-bit non-interlaced grayscale/RGB/RGBA profile the
    encoder emits — and any other writer's output within that profile
    (multiple IDAT chunks are concatenated per spec; ancillary chunks are
    skipped)."""
    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos, n = 8, len(payload)
    width = height = color_type = None
    idat = bytearray()
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("IDAT length does not match geometry")
    out = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown scanline filter {ftype}")
        out += line
        prev = line
    return {
        "width": width,
        "height": height,
        "color_type": color_type,
        "channels": ch,
        "pixels": bytes(out),
    }
