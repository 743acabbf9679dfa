"""Pure-stdlib PCM WAV codec — the real audio decoder behind the
multimodal column plumbing (operators/multimodal.py), following the
PNG/JPEG playbook (operators/png.py, operators/jpeg.py): no audio
library, just the public RIFF/WAVE container layout.

Scope: integer PCM (format tag 1, 8/16-bit) plus ITU-T G.711 μ-law /
A-law companded audio (format tags 7 / 6 — the real compressed
telephony codecs, operators/g711.py), any channel count and sample
rate. Both directions:

- :func:`encode_wav` — int samples → RIFF/WAVE bytes ("fmt " + "data"
  chunks, correct block align/byte rate); ``codec="mulaw"/"alaw"``
  compands through G.711 to 8-bit codes.
- :func:`decode_wav` — chunk walk (unknown chunks skipped by their
  declared size, word-aligned, exactly as the spec requires), fmt
  validation with format-tag dispatch, and sample extraction (G.711
  codes expand back to linear through the exact inverse quantizer).

Worker-side only: runs inside mapInPandas bodies over Arrow batches;
payloads never visit the driver.
"""

from __future__ import annotations

import struct


_G711_TAGS = {"alaw": 6, "mulaw": 7}


def encode_wav(
    samples: list[int],
    sample_rate: int = 8000,
    channels: int = 1,
    bits: int = 16,
    codec: str = "pcm",
) -> bytes:
    """Interleaved integer samples → WAV bytes. 16-bit samples are
    signed little-endian; 8-bit are unsigned (the WAV convention).
    ``codec="mulaw"/"alaw"`` compands 16-bit linear input through G.711
    to 8-bit codes (format tags 7/6)."""
    if codec == "adpcm":
        from duckdb_server_spark.operators.adpcm import encode_adpcm_block

        tag, bits = 0x11, 4
        data = encode_adpcm_block(samples)
        block_align = len(data)
        fmt = struct.pack(
            "<HHIIHHHH", tag, channels, sample_rate,
            sample_rate * block_align, block_align, bits,
            2, len(samples),  # cbSize, wSamplesPerBlock
        )
        chunks = (
            b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<II", 4, len(samples))
            + b"data" + struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) % 2 else b"")
        )
        return (
            b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
        )
    if codec in _G711_TAGS:
        from duckdb_server_spark.operators.g711 import g711_encode

        tag, bits = _G711_TAGS[codec], 8
        data = g711_encode(samples, codec)
    elif codec != "pcm":
        raise ValueError(f"unknown codec {codec!r}")
    elif bits == 16:
        tag = 1
        data = b"".join(struct.pack("<h", s) for s in samples)
    elif bits == 8:
        tag = 1
        data = bytes(s & 0xFF for s in samples)
    else:
        raise ValueError("only 8/16-bit integer PCM")
    block_align = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", tag, channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes) -> dict:
    """WAV bytes → dict(samples, sample_rate, channels, bits)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    fact_count = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            tag, channels, rate, _byte_rate, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag not in (1, 6, 7, 0x11):
                raise ValueError(
                    f"only PCM, G.711, and IMA ADPCM supported (format tag {tag})"
                )
            if tag == 1 and bits not in (8, 16):
                raise ValueError("only 8/16-bit integer PCM")
            if tag in (6, 7) and bits != 8:
                raise ValueError("G.711 is 8 bits per sample")
            if tag == 0x11 and bits != 4:
                raise ValueError("IMA ADPCM is 4 bits per sample")
            fmt = (tag, channels, rate, bits)
        elif cid == b"fact":
            (fact_count,) = struct.unpack("<I", body[:4])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, channels, rate, bits = fmt
    if tag == 0x11:
        from duckdb_server_spark.operators.adpcm import decode_adpcm_block

        if fact_count is None:
            raise ValueError("IMA ADPCM requires a fact chunk")
        samples = decode_adpcm_block(data, fact_count)
    elif tag in (6, 7):
        from duckdb_server_spark.operators.g711 import g711_decode

        samples = g711_decode(data, "alaw" if tag == 6 else "mulaw")
    elif bits == 16:
        n = len(data) // 2
        samples = list(struct.unpack(f"<{n}h", data[: 2 * n]))
    else:
        samples = list(data)
    return {
        "samples": samples,
        "sample_rate": rate,
        "channels": channels,
        "bits": bits,
    }
