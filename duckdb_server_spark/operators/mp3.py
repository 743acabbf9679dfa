"""MPEG audio (MP3) frame demux — header-level container parsing from
the public MPEG-1/2 audio frame format (ISO/IEC 11172-3 §2.4.1.3):
sync word, version/layer bits, the bitrate and sample-rate index
tables, padding, channel mode, and the Layer III frame-length formula
``144 · bitrate / samplerate + padding``. ID3v2 prefixes skip via the
syncsafe size. This yields the codec-inventory metadata a crawl
pipeline needs (duration, bitrate, channels, frame count) WITHOUT
audio decode — MP3 audio is entropy-coded (Huffman + MDCT) and stays
a declared plug point exactly like Vorbis/Opus: fail closed, never
garbage samples.

Reference scope: the reference server (main.go:199) moves audio as
opaque BLOBs; this module is beyond-reference capability for the
multimodal-column pipeline. Everything here is from the public spec.

Scale shape: a linear header walk per payload inside mapInPandas —
embarrassingly parallel, payloads never cross the driver.
"""

from __future__ import annotations

# MPEG-1 Layer III bitrate table (kbps), index 1..14; 0=free, 15=bad
BITRATES_V1_L3 = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
# MPEG-2/2.5 Layer III
BITRATES_V2_L3 = (
    None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160,
)
SAMPLE_RATES = {  # version bits → (idx 0, 1, 2)
    3: (44100, 48000, 32000),   # MPEG-1
    2: (22050, 24000, 16000),   # MPEG-2
    0: (11025, 12000, 8000),    # MPEG-2.5
}
SAMPLES_PER_FRAME = {3: 1152, 2: 576, 0: 576}  # Layer III


def skip_id3v2(payload: bytes) -> int:
    """Offset past an ID3v2 prefix (syncsafe 28-bit size), else 0."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    size = 0
    for b in payload[6:10]:
        if b & 0x80:
            raise ValueError("MP3: non-syncsafe ID3v2 size byte")
        size = (size << 7) | b
    return 10 + size


def parse_frame_header(payload: bytes, pos: int) -> dict:
    """One 4-byte frame header at ``pos`` → fields + frame length."""
    if len(payload) < pos + 4:
        raise ValueError("MP3: truncated frame header")
    b0, b1, b2, b3 = payload[pos : pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        raise ValueError("MP3: lost frame sync")
    version = (b1 >> 3) & 0x03          # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer = (b1 >> 1) & 0x03            # 1 = Layer III
    if version == 1 or layer == 0:
        raise ValueError("MP3: reserved version/layer bits")
    if layer != 1:
        raise NotImplementedError("MP3: only Layer III frame walk")
    br_idx = (b2 >> 4) & 0x0F
    sr_idx = (b2 >> 2) & 0x03
    padding = (b2 >> 1) & 0x01
    if br_idx in (0, 15) or sr_idx == 3:
        raise ValueError("MP3: free-format/invalid bitrate or rate index")
    table = BITRATES_V1_L3 if version == 3 else BITRATES_V2_L3
    bitrate = table[br_idx] * 1000
    sample_rate = SAMPLE_RATES[version][sr_idx]
    mode = (b3 >> 6) & 0x03             # 3 = mono
    coeff = 144 if version == 3 else 72
    length = coeff * bitrate // sample_rate + padding
    return {
        "version": version,
        "bitrate": bitrate,
        "sample_rate": sample_rate,
        "channels": 1 if mode == 3 else 2,
        "samples": SAMPLES_PER_FRAME[version],
        "length": length,
    }


def probe_mp3(payload: bytes) -> dict:
    """Walk every frame: counts, duration, bitrate classification."""
    pos = skip_id3v2(payload)
    frames = 0
    total_samples = 0
    bitrates = set()
    first = None
    while pos < len(payload):
        h = parse_frame_header(payload, pos)
        if first is None:
            first = h
        elif (h["sample_rate"], h["channels"]) != (
            first["sample_rate"],
            first["channels"],
        ):
            raise ValueError("MP3: mid-stream rate/channel change")
        frames += 1
        total_samples += h["samples"]
        bitrates.add(h["bitrate"])
        if pos + h["length"] > len(payload):
            raise ValueError("MP3: truncated final frame")
        pos += h["length"]
    if first is None:
        raise ValueError("MP3: no frames")
    return {
        "codec": "mp3",
        "n_frames": frames,
        "sample_rate": first["sample_rate"],
        "channels": first["channels"],
        "bitrate": max(bitrates),
        "vbr": len(bitrates) > 1,
        "duration_ms": total_samples * 1000 // first["sample_rate"],
    }


def write_mp3(
    n_frames: int,
    br_idx: int = 9,
    sr_idx: int = 0,
    mono: bool = True,
    id3_note: bytes = b"",
) -> bytes:
    """A structurally valid MPEG-1 Layer III stream (headers + zero
    payload — the walk needs only the frame geometry). Optionally
    prefixed by a minimal ID3v2 tag carrying ``id3_note``."""
    out = bytearray()
    if id3_note:
        size = len(id3_note)
        if size >= 1 << 28:
            raise ValueError("MP3: ID3 note too large")
        sync = bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F,
             (size >> 7) & 0x7F, size & 0x7F]
        )
        out += b"ID3" + bytes([4, 0, 0]) + sync + id3_note
    if not 1 <= br_idx <= 14 or not 0 <= sr_idx <= 2:
        raise ValueError("MP3: invalid table index")
    hdr = bytes(
        [
            0xFF,
            0xFB,  # MPEG-1, Layer III, no CRC
            (br_idx << 4) | (sr_idx << 2),  # no padding
            0xC0 if mono else 0x00,
        ]
    )
    bitrate = BITRATES_V1_L3[br_idx] * 1000
    rate = SAMPLE_RATES[3][sr_idx]
    length = 144 * bitrate // rate
    frame = hdr + bytes(length - 4)
    return bytes(out) + frame * n_frames


def decode_mp3_audio(payload: bytes) -> dict:
    """Audio decode is a plug point: MP3 is entropy-coded (Huffman +
    MDCT); headers parse via probe_mp3."""
    probe_mp3(payload)  # validate the container first
    raise NotImplementedError(
        "MP3 audio is entropy-coded (Huffman + MDCT) — a plug point "
        "like Vorbis/Opus; frame metadata parses via probe_mp3"
    )
