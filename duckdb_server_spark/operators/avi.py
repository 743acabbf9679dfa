"""Pure-stdlib AVI (RIFF) container codec for MJPEG video — closes the
video plug point of the multimodal column plumbing the way PNG/JPEG/WAV
closed images and audio: an MJPEG AVI is a spec-shaped RIFF tree whose
movi LIST carries one baseline-JPEG payload per frame, so the existing
JPEG decoder (operators/jpeg.py) turns container parsing into REAL frame
decode with no video library.

Both directions:

- :func:`encode_avi_mjpeg` — JPEG frame payloads → a valid single-stream
  MJPEG AVI (hdrl LIST with avih + strl/strh/strf headers, movi LIST of
  word-aligned '00dc' chunks, idx1 index).
- :func:`decode_avi` — RIFF walk (LIST recursion, word alignment,
  unknown chunks skipped by declared size), header extraction, and the
  ordered frame payload list; frame-level pixel decode is the caller's
  choice (decode frames eagerly, or SAMPLE every Nth — the 100 TB
  pattern — before paying JPEG decode).

Worker-side only: runs inside mapInPandas bodies over Arrow batches;
payloads never visit the driver.
"""

from __future__ import annotations

import struct


def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (
        b"\x00" if len(body) % 2 else b""
    )


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def encode_avi_mjpeg(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 10,
) -> bytes:
    """JPEG frame payloads → MJPEG AVI bytes."""
    us_per_frame = 1_000_000 // fps
    avih = struct.pack(
        "<IIIIIIIIII4I",
        us_per_frame, 0, 0, 0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, 0, width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, len(frames),
        0, 0xFFFFFFFF, 0, 0, 0, int(width), int(height),
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_body)
    # idx1: one entry per frame — offset is relative to the 'movi' fourcc
    idx_entries = []
    off = 4
    for f in frames:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(payload: bytes, pos: int, end: int, frames: list[bytes],
          headers: dict) -> None:
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body_start = pos + 8
        if cid == b"LIST":
            _walk(payload, body_start + 4, body_start + size, frames, headers)
        elif cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
            frames.append(payload[body_start : body_start + size])
        elif cid == b"avih":
            vals = struct.unpack("<10I", payload[body_start : body_start + 40])
            headers["us_per_frame"] = vals[0]
            headers["declared_frames"] = vals[4]
            headers["width"] = vals[8]
            headers["height"] = vals[9]
        pos = body_start + size + (size % 2)


def decode_avi(payload: bytes) -> dict:
    """AVI bytes → dict(frames=[payload, …], width, height,
    us_per_frame, declared_frames). Frame payloads are the raw per-frame
    codec bytes (JPEG for MJPEG) in stream order."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    frames: list[bytes] = []
    headers: dict = {}
    _walk(payload, 12, len(payload), frames, headers)
    if "width" not in headers:
        raise ValueError("missing avih header")
    if headers["declared_frames"] != len(frames):
        raise ValueError(
            f"frame count mismatch: header says {headers['declared_frames']}, "
            f"movi carries {len(frames)}"
        )
    return {"frames": frames, **headers}


def probe_avi(payload: bytes) -> dict:
    """Headers-only probe: parse avih (and confirm an idx1 exists) WITHOUT
    walking the movi frame data — the cheap first step before idx1-based
    random access. Raises ValueError when the file carries no index so
    callers can fall back to the sequential walk."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    pos, headers, has_idx = 12, {}, False
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if cid == b"LIST" and payload[pos + 8 : pos + 12] == b"hdrl":
            hpos, hend = pos + 12, pos + 8 + size
            while hpos + 8 <= hend:
                hcid = payload[hpos : hpos + 4]
                (hsize,) = struct.unpack("<I", payload[hpos + 4 : hpos + 8])
                if hcid == b"avih":
                    vals = struct.unpack(
                        "<10I", payload[hpos + 8 : hpos + 48]
                    )
                    headers = {
                        "us_per_frame": vals[0],
                        "declared_frames": vals[4],
                        "width": vals[8],
                        "height": vals[9],
                    }
                hpos += 8 + hsize + (hsize % 2)
        elif cid == b"idx1":
            has_idx = True
        pos += 8 + size + (size % 2)
    if not headers:
        raise ValueError("missing avih header")
    if not has_idx:
        raise ValueError("AVI has no idx1 index")
    return headers


def decode_avi_frame(payload: bytes, frame_idx: int) -> bytes:
    """Random-access single-frame extraction via the idx1 index — O(1)
    seek per sampled frame instead of walking the movi LIST, which is
    what stride sampling wants when frames are large: byte-range reads
    against object storage never touch unsampled footage.

    idx1 offsets are relative to the 'movi' fourcc (the convention this
    encoder and mainstream ones use); falls back to a ValueError if the
    file carries no index."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    pos, movi_pos, idx1 = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if cid == b"LIST" and payload[pos + 8 : pos + 12] == b"movi":
            movi_pos = pos + 8  # position of the 'movi' fourcc
        elif cid == b"idx1":
            idx1 = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size % 2)
    if idx1 is None or movi_pos is None:
        raise ValueError("AVI has no idx1 index")
    seen = 0
    for off in range(0, len(idx1) - 15, 16):
        ckid = idx1[off : off + 4]
        if ckid[2:4] in (b"dc", b"db") and ckid[:2].isdigit():
            if seen == frame_idx:
                rel, size = struct.unpack("<II", idx1[off + 8 : off + 16])
                start = movi_pos + rel + 8  # past the chunk header
                return payload[start : start + size]
            seen += 1
    raise ValueError(f"frame {frame_idx} not in index ({seen} frames)")
