"""Pure-stdlib FLAC codec (subset) — the entropy-coded LOSSLESS audio
format, completing the audio family behind the multimodal dispatch:
PCM (wav.py), companded G.711 (g711.py), stateful-lossy IMA ADPCM
(adpcm.py), and now a real entropy coder. Because FLAC is lossless, the
decode of an encode is the identity — which is what makes the
differential oracle trivial even though the bitstream is Rice-coded.

Scope (both directions, MSB-first bit I/O):
- container: "fLaC" magic + mandatory STREAMINFO metadata block;
- one frame per stream (fixed blocking), frame header with block-size /
  sample-rate / sample-size codes, UTF-8-coded frame number, CRC-8;
- subframes: CONSTANT, VERBATIM, and FIXED predictors (orders 0-2),
  chosen per input by residual magnitude;
- residuals: partitioned Rice coding (method 0, single partition),
  including the escape (parameter 0b11111 → raw 5-bit-sized residuals);
- frame footer CRC-16.

Mono, 16-bit. Stereo decorrelation and LPC subframes are out of scope
(rejected loudly): FIXED + Rice is the core entropy machinery and what
the fixture exercises end to end.
"""

from __future__ import annotations

import struct


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitWriterMSB:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int) -> None:
        for i in range(bits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = self.n = 0

    def unary(self, q: int) -> None:
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self) -> None:
        while self.n:
            self.write(0, 1)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.out)


class _BitReaderMSB:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            if self.byte >= len(self.data):
                raise ValueError("FLAC: bitstream truncated")
            v = (v << 1) | ((self.data[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _fixed_residual(samples: list[int], order: int) -> list[int]:
    r = list(samples)
    for _ in range(order):
        r = [r[i] - r[i - 1] for i in range(1, len(r))]
    return r


def _rice_cost(res: list[int], p: int) -> int:
    return sum((_zigzag(v) >> p) + 1 + p for v in res)


def encode_flac(samples: list[int], sample_rate: int = 8000) -> bytes:
    """Mono 16-bit samples → FLAC bytes (one frame)."""
    n = len(samples)
    if n == 0:
        raise ValueError("FLAC: empty input")
    # the single-frame subset writes block sizes through 16-bit fields and
    # the rate through a 20-bit field; out-of-range values would be
    # silently masked by the bit writer into a corrupt stream
    if n > 0xFFFF:
        raise ValueError("FLAC: single-frame subset holds at most 65535 samples")
    if sample_rate >= 1 << 20:
        raise ValueError("FLAC: sample rate exceeds the 20-bit STREAMINFO field")
    # --- STREAMINFO ---
    si = _BitWriterMSB()
    si.write(n, 16)          # min block size
    si.write(n, 16)          # max block size
    si.write(0, 24)          # min frame size (unknown)
    si.write(0, 24)          # max frame size (unknown)
    si.write(sample_rate, 20)
    si.write(0, 3)           # channels - 1
    si.write(15, 5)          # bits per sample - 1
    si.write(n, 36)          # total samples
    streaminfo = si.bytes() + bytes(16)  # md5 unset
    header = b"fLaC" + bytes([0x80, 0, 0, len(streaminfo)]) + streaminfo

    # --- frame header ---
    fh = _BitWriterMSB()
    fh.write(0b11111111111110, 14)
    fh.write(0, 1)           # reserved
    fh.write(0, 1)           # fixed blocking
    fh.write(0b0111, 4)      # block size: 16-bit at end of header
    fh.write(0b0000, 4)      # sample rate: from STREAMINFO
    fh.write(0, 4)           # channel assignment: mono
    fh.write(0b100, 3)       # sample size: 16 bits
    fh.write(0, 1)           # reserved
    fh.write(0, 8)           # frame number 0, UTF-8
    fh.write(n - 1, 16)      # block size - 1
    head = fh.bytes()
    head += bytes([_crc8(head)])

    # --- subframe: pick CONSTANT / best FIXED order / VERBATIM ---
    sf = _BitWriterMSB()
    if all(s == samples[0] for s in samples):
        sf.write(0, 1)
        sf.write(0b000000, 6)  # CONSTANT
        sf.write(0, 1)         # no wasted bits
        sf.write(samples[0] & 0xFFFF, 16)
    else:
        best_order, best_cost, best_res = 0, None, None
        for order in range(0, 3):
            if order >= n:
                break
            res = _fixed_residual(samples, order)
            p = _best_rice_param(res)
            cost = _rice_cost(res, p) if p is not None else None
            if cost is None:
                continue
            if best_cost is None or cost < best_cost:
                best_order, best_cost, best_res = order, cost, res
        verbatim_cost = 16 * n
        if best_cost is None or best_cost + 16 * best_order >= verbatim_cost:
            sf.write(0, 1)
            sf.write(0b000001, 6)  # VERBATIM
            sf.write(0, 1)
            for s in samples:
                sf.write(s & 0xFFFF, 16)
        else:
            sf.write(0, 1)
            sf.write(0b001000 | best_order, 6)  # FIXED
            sf.write(0, 1)
            for s in samples[:best_order]:      # warm-up
                sf.write(s & 0xFFFF, 16)
            _write_rice(sf, best_res)
    sf.align()
    body = head + sf.bytes()
    body += struct.pack(">H", _crc16(body))
    return header + body


def _best_rice_param(res: list[int]) -> int | None:
    best, best_cost = None, None
    for p in range(0, 30):
        cost = _rice_cost(res, p)
        if best_cost is None or cost < best_cost:
            best, best_cost = p, cost
        if p > 18 and cost > best_cost:
            break
    return best


def _write_rice(w: _BitWriterMSB, res: list[int]) -> None:
    """Residual block: method 0 (4-bit Rice parameters), partition
    order 0 — one partition. Parameter 0b1111 escapes to raw."""
    p = _best_rice_param(res)
    w.write(0, 2)   # coding method 0
    w.write(0, 4)   # partition order 0
    raw_bits = max((max(_zigzag(v).bit_length(), 1) + 1) for v in res)
    if p is not None and p < 15 and _rice_cost(res, p) < len(res) * raw_bits:
        w.write(p, 4)
        for v in res:
            u = _zigzag(v)
            w.unary(u >> p)
            if p:
                w.write(u & ((1 << p) - 1), p)
    else:
        w.write(0b1111, 4)          # escape
        w.write(raw_bits, 5)
        mask = (1 << raw_bits) - 1
        for v in res:
            w.write(v & mask, raw_bits)


def decode_flac(payload: bytes) -> dict:
    """FLAC bytes → dict(samples, sample_rate, channels, bits)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    sample_rate = total = None
    bits = 16
    while True:
        hdr = payload[pos : pos + 4]
        last = bool(hdr[0] & 0x80)
        btype = hdr[0] & 0x7F
        size = int.from_bytes(hdr[1:4], "big")
        body = payload[pos + 4 : pos + 4 + size]
        if btype == 0:  # STREAMINFO
            br = _BitReaderMSB(body)
            br.read(16); br.read(16); br.read(24); br.read(24)
            sample_rate = br.read(20)
            channels = br.read(3) + 1
            bits = br.read(5) + 1
            total = br.read(36)
            if channels != 1 or bits != 16:
                raise NotImplementedError("FLAC: mono 16-bit subset")
        pos += 4 + size
        if last:
            break
    if sample_rate is None:
        raise ValueError("FLAC: no STREAMINFO")
    # --- frame ---
    frame_start = pos
    br = _BitReaderMSB(payload, pos)
    if br.read(14) != 0b11111111111110:
        raise ValueError("FLAC: bad frame sync")
    br.read(1)
    br.read(1)
    bs_code = br.read(4)
    sr_code = br.read(4)
    ch_assign = br.read(4)
    ss_code = br.read(3)
    br.read(1)
    first = br.read(8)  # UTF-8 frame number (single byte for frame 0)
    if first & 0x80:
        raise NotImplementedError("FLAC: multi-byte frame numbers")
    if ch_assign != 0:
        raise NotImplementedError("FLAC: mono subset")
    if bs_code == 0b0110:
        block = br.read(8) + 1
    elif bs_code == 0b0111:
        block = br.read(16) + 1
    else:
        raise NotImplementedError("FLAC: coded block sizes")
    if sr_code not in (0, ):
        raise NotImplementedError("FLAC: inline sample rates")
    hdr_len = br.byte - frame_start + (1 if br.bit else 0)
    crc8 = br.read(8)
    if _crc8(payload[frame_start : frame_start + hdr_len]) != crc8:
        raise ValueError("FLAC: frame header CRC mismatch")
    # --- subframe ---
    if br.read(1) != 0:
        raise ValueError("FLAC: bad subframe padding bit")
    stype = br.read(6)
    if br.read(1) != 0:
        raise NotImplementedError("FLAC: wasted bits")

    def s16(u: int) -> int:
        return u - 0x10000 if u & 0x8000 else u

    if stype == 0b000000:  # CONSTANT
        samples = [s16(br.read(16))] * block
    elif stype == 0b000001:  # VERBATIM
        samples = [s16(br.read(16)) for _ in range(block)]
    elif 0b001000 <= stype <= 0b001100:  # FIXED
        order = stype & 0x07
        warm = [s16(br.read(16)) for _ in range(order)]
        res = _read_rice(br, block - order)
        samples = list(warm)
        for r in res:
            if order == 0:
                samples.append(r)
            elif order == 1:
                samples.append(r + samples[-1])
            elif order == 2:
                samples.append(r + 2 * samples[-1] - samples[-2])
            else:
                raise NotImplementedError("FLAC: fixed order > 2")
    else:
        raise NotImplementedError("FLAC: LPC subframes")
    br.align()
    crc16 = br.read(16)
    frame_bytes = payload[frame_start : br.byte - 2]
    if _crc16(frame_bytes) != crc16:
        raise ValueError("FLAC: frame CRC mismatch")
    return {
        "samples": samples[:block],
        "sample_rate": sample_rate,
        "channels": 1,
        "bits": bits,
    }


def _read_rice(br: _BitReaderMSB, count: int) -> list[int]:
    if br.read(2) != 0:
        raise NotImplementedError("FLAC: 5-bit Rice method")
    if br.read(4) != 0:
        raise NotImplementedError("FLAC: partitioned residuals")
    p = br.read(4)
    out = []
    if p == 0b1111:  # escape: raw residuals
        raw_bits = br.read(5)
        for _ in range(count):
            u = br.read(raw_bits)
            if u & (1 << (raw_bits - 1)):
                u -= 1 << raw_bits
            out.append(u)
        return out
    for _ in range(count):
        q = br.unary()
        u = (q << p) | (br.read(p) if p else 0)
        out.append(_unzigzag(u))
    return out
