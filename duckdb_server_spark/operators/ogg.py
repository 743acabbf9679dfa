"""Ogg container (RFC 3533) — page framing, CRC, demux, and the two
public codec mappings the engine can serve end-to-end:

* **Ogg FLAC** (xiph.org/flac/ogg_mapping.html): the BOS packet is
  ``0x7F 'FLAC' major minor n_headers(16BE)`` followed by the native
  ``fLaC`` signature + STREAMINFO; every later packet is one native
  FLAC frame — so decode reassembles a native stream and reuses
  :mod:`duckdb_server_spark.operators.flac`'s verified Rice decoder.
* **Vorbis** (Vorbis I spec §4.2.1): the identification header is a
  plain packed struct (``0x01 'vorbis'`` version/channels/rate/
  bitrates/blocksizes/framing) parsed for metadata; Vorbis AUDIO
  decode (MDCT + codebook entropy coding) stays a declared plug point
  exactly like MP3/Opus — fail closed, never garbage samples.

Reference scope: the reference server (main.go:199) moves audio
columns as opaque BLOBs only; this module is beyond-reference
capability for the multimodal-column pipeline. All structures are from
the public RFC 3533 / Vorbis I / Ogg-FLAC mapping documents.

Scale shape: pages carry explicit lengths, so demux is a linear walk
with zero copies until packet reassembly; everything runs inside
mapInPandas per document — embarrassingly parallel, payloads never
cross the driver.
"""

from __future__ import annotations

import struct

# --- CRC-32/Ogg: poly 0x04c11db7, init 0, no reflection, no final XOR ----

_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if _r & 0x80000000 \
            else (_r << 1) & 0xFFFFFFFF
    _CRC_TABLE.append(_r)


def crc_ogg(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) & 0xFF) ^ b]
    return crc


# --- page writer ---------------------------------------------------------


def _lacing(packet_len: int) -> bytes:
    """RFC 3533 §4: n//255 full segments then the remainder; a packet
    that is an exact multiple of 255 ends with an explicit 0 lace."""
    return bytes([255] * (packet_len // 255) + [packet_len % 255])


def write_page(
    serial: int,
    seq: int,
    packets: list[bytes],
    granule: int = 0,
    bos: bool = False,
    eos: bool = False,
    continued: bool = False,
    open_end: bool = False,
) -> bytes:
    """One Ogg page holding ``packets`` whole — except that with
    ``open_end`` the LAST packet spills onto the next page, so its
    lacing is all-255 with no terminator (its length must then be an
    exact multiple of 255; the next page sets ``continued``)."""
    lacing = b"".join(_lacing(len(p)) for p in packets[:-1]) if packets \
        else b""
    if packets:
        tail = len(packets[-1])
        if open_end:
            if tail % 255:
                raise ValueError("Ogg: open-ended packet chunk must be a "
                                 "multiple of 255 bytes")
            lacing += bytes([255] * (tail // 255))
        else:
            lacing += _lacing(tail)
    if len(lacing) > 255:
        raise ValueError("Ogg: page exceeds 255 lacing segments")
    flags = (0x01 if continued else 0) | (0x02 if bos else 0) | \
        (0x04 if eos else 0)
    header = (
        b"OggS" + bytes([0, flags])
        + struct.pack("<q", granule)
        + struct.pack("<I", serial)
        + struct.pack("<I", seq)
        + b"\x00\x00\x00\x00"  # CRC placeholder
        + bytes([len(lacing)]) + lacing
    )
    body = b"".join(packets)
    crc = crc_ogg(header + body)
    return header[:22] + struct.pack("<I", crc) + header[26:] + body


def write_stream(serial: int, packets: list[bytes],
                 granules: list[int]) -> bytes:
    """A logical Ogg stream: BOS page for the first packet, one page
    per following packet (EOS on the last), splitting any packet that
    needs more than 255 lacing values across continued pages."""
    if len(packets) != len(granules):
        raise ValueError("Ogg: one granule position per packet")
    out, seq = [], 0
    last = len(packets) - 1
    chunk_cap = 254 * 255  # ≤254 full laces + the terminator lace
    for i, (pkt, gran) in enumerate(zip(packets, granules)):
        chunks = [pkt[o: o + chunk_cap]
                  for o in range(0, len(pkt), chunk_cap)] or [b""]
        for j, chunk in enumerate(chunks):
            final_chunk = j == len(chunks) - 1
            out.append(write_page(
                serial, seq, [chunk],
                # a page whose packet continues has granule -1
                granule=gran if final_chunk else -1,
                bos=(i == 0 and j == 0),
                eos=(i == last and final_chunk),
                continued=(j > 0),
                open_end=not final_chunk,
            ))
            seq += 1
    return b"".join(out)


# --- demux ---------------------------------------------------------------


def read_pages(payload: bytes) -> list[dict]:
    """Parse every page, verifying capture pattern and CRC."""
    pages, pos = [], 0
    while pos < len(payload):
        if payload[pos: pos + 4] != b"OggS":
            raise ValueError("Ogg: bad capture pattern")
        if payload[pos + 4] != 0:
            raise ValueError("Ogg: unknown stream structure version")
        flags = payload[pos + 5]
        granule = struct.unpack("<q", payload[pos + 6: pos + 14])[0]
        serial, seq, crc = struct.unpack("<III", payload[pos + 14: pos + 26])
        nseg = payload[pos + 26]
        lacing = payload[pos + 27: pos + 27 + nseg]
        if len(lacing) != nseg:
            raise ValueError("Ogg: truncated lacing table")
        body_len = sum(lacing)
        start = pos + 27 + nseg
        body = payload[start: start + body_len]
        if len(body) != body_len:
            raise ValueError("Ogg: truncated page body")
        page = payload[pos: start + body_len]
        expect = page[:22] + b"\x00\x00\x00\x00" + page[26:]
        if crc_ogg(expect) != crc:
            raise ValueError("Ogg: page CRC mismatch")
        pages.append({
            "flags": flags, "granule": granule, "serial": serial,
            "seq": seq, "lacing": bytes(lacing), "body": body,
        })
        pos = start + body_len
    return pages


def demux_ogg(payload: bytes) -> dict:
    """Payload → {serial: {"packets": [...], "granule": last_granule}}
    with continued packets reassembled across page boundaries."""
    streams: dict[int, dict] = {}
    for page in read_pages(payload):
        st = streams.setdefault(
            page["serial"],
            {"packets": [], "granule": 0, "partial": b"", "open": False},
        )
        if page["flags"] & 0x02 and (st["packets"] or st["open"]):
            raise ValueError("Ogg: BOS flag on a non-first page")
        if bool(page["flags"] & 0x01) != bool(st["partial"]):
            raise ValueError("Ogg: continued-packet flag mismatch")
        st["open"] = True
        body, off = page["body"], 0
        for lace in page["lacing"]:
            st["partial"] += body[off: off + lace]
            off += lace
            if lace < 255:  # packet boundary
                st["packets"].append(st["partial"])
                st["partial"] = b""
        if page["granule"] >= 0:
            st["granule"] = page["granule"]
    for st in streams.values():
        if st["partial"]:
            raise ValueError("Ogg: stream ends mid-packet")
        del st["partial"], st["open"]
    return streams


# --- Ogg FLAC mapping -----------------------------------------------------


def encode_ogg_flac(samples: list[int], sample_rate: int = 8000,
                    serial: int = 0x0D5C) -> bytes:
    """Mono 16-bit samples → Ogg-encapsulated FLAC (the public
    Ogg-FLAC mapping): BOS packet = 0x7F'FLAC' 1.0 + 0 trailing
    headers + native fLaC signature + STREAMINFO; second packet = the
    native frame; EOS page granule = total samples."""
    from duckdb_server_spark.operators.flac import encode_flac

    native = encode_flac(samples, sample_rate)
    # split signature+STREAMINFO from the frame via the block length
    meta_len = int.from_bytes(native[5:8], "big")
    split = 8 + meta_len
    header = b"\x7fFLAC" + bytes([1, 0]) + (0).to_bytes(2, "big") \
        + native[:split]
    frame = native[split:]
    return write_stream(serial, [header, frame], [0, len(samples)])


def decode_ogg_flac(packets: list[bytes]) -> dict:
    """Reassemble the native FLAC stream from Ogg-FLAC packets and
    decode through the verified Rice decoder."""
    from duckdb_server_spark.operators.flac import decode_flac

    head = packets[0]
    if head[:5] != b"\x7fFLAC":
        raise ValueError("Ogg: not an Ogg-FLAC stream")
    if head[5] != 1:
        raise NotImplementedError("Ogg-FLAC: unknown mapping major version")
    n_headers = int.from_bytes(head[7:9], "big")
    native = head[9:]
    if native[:4] != b"fLaC":
        raise ValueError("Ogg-FLAC: missing native signature")
    # skip declared VORBIS_COMMENT/padding header packets (metadata only)
    audio = packets[1 + n_headers:]
    return decode_flac(native + b"".join(audio))


# --- Vorbis identification header (metadata; audio is a plug point) ------


def encode_vorbis_id(channels: int, sample_rate: int,
                     bitrate_nominal: int = 0,
                     bs0_log2: int = 8, bs1_log2: int = 8) -> bytes:
    """Vorbis I §4.2.2 identification header (packed little-endian).
    ``bs0_log2``/``bs1_log2`` (round 13): the short/long blocksize
    exponents — unequal values declare a window-switching stream."""
    return (
        b"\x01vorbis"
        + struct.pack("<I", 0)              # vorbis_version
        + bytes([channels])
        + struct.pack("<I", sample_rate)
        + struct.pack("<iii", 0, bitrate_nominal, 0)
        + bytes([(bs1_log2 << 4) | bs0_log2])
        + bytes([1])                        # framing bit
    )


def parse_vorbis_id(packet: bytes) -> dict:
    if packet[:7] != b"\x01vorbis":
        raise ValueError("Ogg: not a Vorbis identification header")
    version = struct.unpack("<I", packet[7:11])[0]
    if version != 0:
        raise NotImplementedError("Vorbis: unknown stream version")
    channels = packet[11]
    sample_rate = struct.unpack("<I", packet[12:16])[0]
    br_max, br_nom, br_min = struct.unpack("<iii", packet[16:28])
    bs = packet[28]
    if not packet[29] & 0x01:
        raise ValueError("Vorbis: framing bit unset")
    return {
        "codec": "vorbis", "channels": channels,
        "sample_rate": sample_rate, "bitrate_nominal": br_nom,
        "blocksize_0": 1 << (bs & 0x0F), "blocksize_1": 1 << (bs >> 4),
    }


def probe_ogg(payload: bytes) -> dict:
    """Container metadata for any single-stream Ogg file: codec id,
    header fields, and the duration granule — without decoding audio."""
    streams = demux_ogg(payload)
    if len(streams) != 1:
        raise NotImplementedError("Ogg: multiplexed streams")
    (serial, st), = streams.items()
    first = st["packets"][0]
    if first[:5] == b"\x7fFLAC":
        from duckdb_server_spark.operators.flac import decode_flac  # noqa: F401
        meta = {"codec": "flac", "channels": 1, "sample_rate":
                _flac_rate(first), "bitrate_nominal": 0,
                "blocksize_0": 0, "blocksize_1": 0}
    elif first[:7] == b"\x01vorbis":
        meta = parse_vorbis_id(first)
    else:
        raise NotImplementedError("Ogg: unknown codec mapping")
    meta.update(serial=serial, n_packets=len(st["packets"]),
                granule_total=st["granule"])
    return meta


def _flac_rate(head: bytes) -> int:
    # STREAMINFO sample rate: 20 bits at byte offset 10 of the block body
    body = head[9 + 8:]  # skip mapping prefix, fLaC, block header
    return (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)


def decode_ogg_audio(payload: bytes) -> dict:
    """Audio decode for Ogg containers: FLAC mapping decodes fully;
    entropy-coded Vorbis fails closed (plug point, never garbage)."""
    streams = demux_ogg(payload)
    if len(streams) != 1:
        raise NotImplementedError("Ogg: multiplexed streams")
    (st,) = streams.values()
    first = st["packets"][0]
    if first[:5] == b"\x7fFLAC":
        return decode_ogg_flac(st["packets"])
    if first[:7] == b"\x01vorbis":
        # round 11: the floor1 + residue-2 entropy layer decodes for
        # real (operators/vorbis.py); PCM (inverse-dB table + IMDCT)
        # stays the declared plug point inside that module
        from duckdb_server_spark.operators.vorbis import decode_ogg_vorbis

        return decode_ogg_vorbis(payload)
    raise NotImplementedError("Ogg: unknown codec mapping")
