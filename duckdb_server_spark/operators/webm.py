"""Pure-stdlib Matroska/WebM container codec for MJPEG samples —
closes the last container plug point in the video dispatch
(operators/multimodal.py), alongside AVI (RIFF idx1) and MP4 (ISO BMFF
sample tables).

Matroska (RFC 9559) is an EBML document: every element is
``ID bytes + size varint + body``. Random access is defined by two
elements, and that is exactly the shape frame-sampling needs at 100 TB:

- ``SeekHead`` (first element of the Segment) → byte position of
  ``Cues``;
- ``Cues`` → one ``CuePoint`` per keyframe carrying ``CueTime`` and
  ``CueClusterPosition`` (byte position of the Cluster holding it).

The writer emits one frame per Cluster with a CuePoint each, so a
probe is SeekHead → Cues (two O(1) jumps; no cluster body is ever
read) and a frame fetch is one Cluster header walk — unsampled frames
never pay a parse, let alone a JPEG decode.

- :func:`encode_webm_mjpeg` — EBML header + Segment(SeekHead, Info,
  Tracks, Cluster×n, Cues) with real varint sizes throughout;
- :func:`probe_webm` — EBML walk to geometry + the cue table;
- :func:`decode_webm_frame` — single-frame fetch through the cues.

Worker-side only: these run inside mapInPandas bodies; payloads never
visit the driver.

Reference parity: markdessain/duckdb-server proxies all binary columns
verbatim (main.go:199,229); container demux is beyond-reference scope
declared in SURVEY.md §2.12 (X90 plug point).
"""

from __future__ import annotations

import struct

# EBML / Matroska element IDs (raw bytes, marker included)
_EBML = b"\x1aE\xdf\xa3"
_DOCTYPE = b"\x42\x82"
_DOCTYPE_VERSION = b"\x42\x87"
_DOCTYPE_READ_VERSION = b"\x42\x85"
_EBML_VERSION = b"\x42\x86"
_EBML_READ_VERSION = b"\x42\xf7"
_MAX_ID_LENGTH = b"\x42\xf2"
_MAX_SIZE_LENGTH = b"\x42\xf3"

_SEGMENT = b"\x18\x53\x80\x67"
_SEEKHEAD = b"\x11\x4d\x9b\x74"
_SEEK = b"\x4d\xbb"
_SEEK_ID = b"\x53\xab"
_SEEK_POSITION = b"\x53\xac"
_INFO = b"\x15\x49\xa9\x66"
_TIMESTAMP_SCALE = b"\x2a\xd7\xb1"
_DURATION = b"\x44\x89"
_MUXING_APP = b"\x4d\x80"
_WRITING_APP = b"\x57\x41"
_TRACKS = b"\x16\x54\xae\x6b"
_TRACK_ENTRY = b"\xae"
_TRACK_NUMBER = b"\xd7"
_TRACK_UID = b"\x73\xc5"
_TRACK_TYPE = b"\x83"
_CODEC_ID = b"\x86"
_VIDEO = b"\xe0"
_PIXEL_WIDTH = b"\xb0"
_PIXEL_HEIGHT = b"\xba"
_CLUSTER = b"\x1f\x43\xb6\x75"
_TIMESTAMP = b"\xe7"
_SIMPLE_BLOCK = b"\xa3"
_CUES = b"\x1c\x53\xbb\x6b"
_CUE_POINT = b"\xbb"
_CUE_TIME = b"\xb3"
_CUE_TRACK_POSITIONS = b"\xb7"
_CUE_TRACK = b"\xf7"
_CUE_CLUSTER_POSITION = b"\xf1"


def _vint(n: int) -> bytes:
    """EBML size varint: width marker bit in the first byte, then the
    value — smallest width whose all-ones pattern (reserved for
    'unknown size') is not produced."""
    if n < 0:
        raise ValueError("EBML: negative size")
    for width in range(1, 9):
        if n < (1 << (7 * width)) - 1:
            return ((1 << (7 * width)) | n).to_bytes(width, "big")
    raise ValueError("EBML: size too large")


def _uint(n: int) -> bytes:
    """Unsigned integer element body: big-endian, minimal width."""
    if n == 0:
        return b"\x00"
    return n.to_bytes((n.bit_length() + 7) // 8, "big")


def _elem(eid: bytes, body: bytes) -> bytes:
    return eid + _vint(len(body)) + body


def _read_vint(payload: bytes, pos: int, keep_marker: bool = False):
    """Decode one EBML varint at ``pos`` → (value, next_pos)."""
    if pos >= len(payload):
        raise ValueError("EBML: truncated varint")
    first = payload[pos]
    if first == 0:
        raise ValueError("EBML: invalid varint")
    width = 9 - first.bit_length()
    if pos + width > len(payload):
        raise ValueError("EBML: truncated varint")
    n = int.from_bytes(payload[pos : pos + width], "big")
    if not keep_marker:
        n &= (1 << (7 * width)) - 1
    return n, pos + width


def _read_id(payload: bytes, pos: int):
    """Element IDs keep their marker bit — return the raw ID bytes."""
    if pos >= len(payload):
        raise ValueError("EBML: truncated element id")
    first = payload[pos]
    if first == 0:
        raise ValueError("EBML: invalid element id")
    width = 9 - first.bit_length()
    if width > 4 or pos + width > len(payload):
        raise ValueError("EBML: bad element id")
    return payload[pos : pos + width], pos + width


def _elements(payload: bytes, pos: int, end: int):
    """Yield (id_bytes, body_start, body_end) for each child element."""
    while pos < end:
        eid, pos = _read_id(payload, pos)
        size, pos = _read_vint(payload, pos)
        if pos + size > end:
            raise ValueError("EBML: element overruns parent")
        yield eid, pos, pos + size
        pos += size


def encode_webm_mjpeg(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 10,
    codec_id: bytes = b"V_MJPEG",
) -> bytes:
    """Frame payloads → Matroska bytes (DocType ``matroska``, or the
    ``webm`` DocType when ``codec_id`` is ``V_VP8`` — WebM's own codec
    contract stores bare VP8 frames in SimpleBlocks), one frame per
    Cluster with a CuePoint each.
    Cues live after the clusters (the streaming-writer layout), so every
    CueClusterPosition is known when they are built; the SeekHead at the
    front carries the Cues position with a fixed-width encoding so its
    own size never shifts the offsets it indexes."""
    if not frames:
        raise ValueError("WebM: no frames")
    frame_ms = 1000 // fps if fps else 100

    ebml = _elem(
        _EBML,
        _elem(_EBML_VERSION, _uint(1))
        + _elem(_EBML_READ_VERSION, _uint(1))
        + _elem(_MAX_ID_LENGTH, _uint(4))
        + _elem(_MAX_SIZE_LENGTH, _uint(8))
        + _elem(_DOCTYPE, b"webm" if codec_id == b"V_VP8" else b"matroska")
        + _elem(_DOCTYPE_VERSION, _uint(2))
        + _elem(_DOCTYPE_READ_VERSION, _uint(2)),
    )
    info = _elem(
        _INFO,
        _elem(_TIMESTAMP_SCALE, _uint(1_000_000))
        + _elem(_DURATION, struct.pack(">f", len(frames) * frame_ms))
        + _elem(_MUXING_APP, b"duckdb_server_spark")
        + _elem(_WRITING_APP, b"duckdb_server_spark"),
    )
    tracks = _elem(
        _TRACKS,
        _elem(
            _TRACK_ENTRY,
            _elem(_TRACK_NUMBER, _uint(1))
            + _elem(_TRACK_UID, _uint(1))
            + _elem(_TRACK_TYPE, _uint(1))  # video
            + _elem(_CODEC_ID, codec_id)
            + _elem(
                _VIDEO,
                _elem(_PIXEL_WIDTH, _uint(width))
                + _elem(_PIXEL_HEIGHT, _uint(height)),
            ),
        ),
    )
    clusters: list[bytes] = []
    for i, frame in enumerate(frames):
        # SimpleBlock: track varint (1 → 0x81), s16 relative timestamp,
        # flags (0x80 = keyframe), then the frame payload
        block = b"\x81" + struct.pack(">h", 0) + b"\x80" + frame
        clusters.append(
            _elem(
                _CLUSTER,
                _elem(_TIMESTAMP, _uint(i * frame_ms))
                + _elem(_SIMPLE_BLOCK, block),
            )
        )

    # SeekHead with one fixed-size entry: position of Cues relative to
    # the start of the segment body (8-byte position keeps it stable)
    def seekhead(cues_pos: int) -> bytes:
        return _elem(
            _SEEKHEAD,
            _elem(
                _SEEK,
                _elem(_SEEK_ID, _CUES)
                + _SEEK_POSITION
                + _vint(8)
                + cues_pos.to_bytes(8, "big"),
            ),
        )

    sh_len = len(seekhead(0))
    cluster_pos: list[int] = []
    off = sh_len + len(info) + len(tracks)
    for c in clusters:
        cluster_pos.append(off)
        off += len(c)
    cues_pos = off
    cues = _elem(
        _CUES,
        b"".join(
            _elem(
                _CUE_POINT,
                _elem(_CUE_TIME, _uint(i * frame_ms))
                + _elem(
                    _CUE_TRACK_POSITIONS,
                    _elem(_CUE_TRACK, _uint(1))
                    + _elem(_CUE_CLUSTER_POSITION, _uint(cluster_pos[i])),
                ),
            )
            for i in range(len(frames))
        ),
    )
    body = seekhead(cues_pos) + info + tracks + b"".join(clusters) + cues
    return ebml + _elem(_SEGMENT, body)


def probe_webm(payload: bytes) -> dict:
    """Parse geometry and the cue table; no cluster body is read.

    The walk is SeekHead → Cues (one jump) plus the Info/Tracks headers
    at the segment front; clusters between them and the cues are never
    visited. Files without a SeekHead fall back to a top-level element
    walk that SKIPS cluster bodies by size."""
    if payload[:4] != _EBML:
        raise ValueError("not an EBML/Matroska file")
    _eid, p = _read_id(payload, 0)
    hsize, p = _read_vint(payload, p)
    doctype = None
    for eid, s, e in _elements(payload, p, p + hsize):
        if eid == _DOCTYPE:
            doctype = payload[s:e].rstrip(b"\x00").decode("latin-1")
    if doctype not in ("webm", "matroska"):
        raise ValueError(f"EBML: unsupported doctype {doctype!r}")
    pos = p + hsize
    eid, pos = _read_id(payload, pos)
    if eid != _SEGMENT:
        raise ValueError("Matroska: missing Segment")
    raw_size, seg_start = _read_vint(payload, pos, keep_marker=True)
    width = seg_start - pos
    seg_size = raw_size & ~(1 << (7 * width))
    # unknown-size (all-ones) segments extend to EOF (streaming writers)
    unknown = seg_size == (1 << (7 * width)) - 1
    seg_end = len(payload) if unknown else seg_start + seg_size

    cues_pos = None
    width_px = height_px = None
    track_num = 1
    first_cluster = None
    for eid, s, e in _elements(payload, seg_start, seg_end):
        if eid == _SEEKHEAD:
            for sid, ss, se in _elements(payload, s, e):
                if sid != _SEEK:
                    continue
                target = position = None
                for fid, fs, fe in _elements(payload, ss, se):
                    if fid == _SEEK_ID:
                        target = payload[fs:fe]
                    elif fid == _SEEK_POSITION:
                        position = int.from_bytes(payload[fs:fe], "big")
                if target == _CUES and position is not None:
                    cues_pos = seg_start + position
        elif eid == _TRACKS:
            for tid, ts, te in _elements(payload, s, e):
                if tid != _TRACK_ENTRY:
                    continue
                ttype = None
                tnum = 1
                w = h = None
                for fid, fs, fe in _elements(payload, ts, te):
                    if fid == _TRACK_TYPE:
                        ttype = int.from_bytes(payload[fs:fe], "big")
                    elif fid == _TRACK_NUMBER:
                        tnum = int.from_bytes(payload[fs:fe], "big")
                    elif fid == _VIDEO:
                        for vid, vs, ve in _elements(payload, fs, fe):
                            if vid == _PIXEL_WIDTH:
                                w = int.from_bytes(payload[vs:ve], "big")
                            elif vid == _PIXEL_HEIGHT:
                                h = int.from_bytes(payload[vs:ve], "big")
                if ttype == 1 and w is not None:
                    width_px, height_px, track_num = w, h, tnum
        elif eid == _CLUSTER and first_cluster is None:
            first_cluster = s
            if cues_pos is not None:
                break  # jump straight to the cues — skip every cluster
    if width_px is None:
        raise ValueError("Matroska: no video track")

    cue_clusters: list[int] = []
    cues_span = None
    if cues_pos is not None:
        eid, cp = _read_id(payload, cues_pos)
        if eid != _CUES:
            raise ValueError("Matroska: SeekHead cues position is wrong")
        csize, cp = _read_vint(payload, cp)
        cues_span = (cp, cp + csize)
    else:
        # no SeekHead: the top-level walk above already skipped cluster
        # bodies; find the cues element the same way
        for eid, s, e in _elements(payload, seg_start, seg_end):
            if eid == _CUES:
                cues_span = (s, e)
                break
    if cues_span is None:
        raise ValueError("Matroska: no Cues index")
    for eid, s, e in _elements(payload, *cues_span):
        if eid != _CUE_POINT:
            continue
        for cid, cs, ce in _elements(payload, s, e):
            if cid != _CUE_TRACK_POSITIONS:
                continue
            for fid, fs, fe in _elements(payload, cs, ce):
                if fid == _CUE_CLUSTER_POSITION:
                    cue_clusters.append(
                        seg_start + int.from_bytes(payload[fs:fe], "big")
                    )
    if not cue_clusters:
        raise ValueError("Matroska: empty Cues")
    return {
        "declared_frames": len(cue_clusters),
        "width": width_px,
        "height": height_px,
        "track": track_num,
        "clusters": cue_clusters,
    }


def decode_webm_frame(
    payload: bytes, frame_idx: int, probe: dict | None = None
) -> bytes:
    """Fetch one frame's bytes: cue → cluster → first SimpleBlock of the
    cued track. O(cluster header) once probed; other clusters untouched."""
    info = probe if probe is not None else probe_webm(payload)
    cpos = info["clusters"][frame_idx]
    eid, p = _read_id(payload, cpos)
    if eid != _CLUSTER:
        raise ValueError("Matroska: cue does not point at a Cluster")
    csize, p = _read_vint(payload, p)
    for eid, s, e in _elements(payload, p, p + csize):
        if eid != _SIMPLE_BLOCK:
            continue
        tnum, bp = _read_vint(payload, s)
        if tnum != info["track"]:
            continue
        bp += 2  # relative timestamp (s16)
        flags = payload[bp]
        bp += 1
        if flags & 0x60:
            raise ValueError("Matroska: laced blocks not supported")
        return payload[bp:e]
    raise ValueError("Matroska: cued cluster holds no SimpleBlock")
