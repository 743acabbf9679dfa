"""Pure-stdlib baseline JPEG (SOF0) codec — the second real decoder
behind the multimodal column plumbing (operators/multimodal.py), built
on the PNG-codec playbook (operators/png.py): no codec library, just the
public interchange format spec (ITU-T T.81).

Scope: 8-bit grayscale, single component, no subsampling, dimensions
multiples of 8 — the baseline-sequential core. Both directions:

- :func:`encode_jpeg_gray` — real pipeline: level shift → float 8×8
  DCT-II → quantize (round half away from zero) → zigzag → DC
  differential + AC run-length → canonical Huffman → marker segments
  (SOI/DQT/SOF0/DHT/SOS/EOI) with 0xFF byte stuffing.
- :func:`encode_jpeg_from_coeffs` — same bitstream writer fed directly
  with quantized coefficient blocks (what the quantizer would emit), for
  constructing streams with exactly-known coefficients.
- :func:`decode_jpeg` — full parse: markers, quantization tables (read
  from DQT), Huffman tables (rebuilt canonically from DHT bits/values —
  nothing hardcoded), entropy decode (byte unstuffing, EOB/ZRL,
  magnitude/sign extension), dequantize, and IDCT with
  floor(x + 0.5) rounding and 0..255 clamp.

The Huffman tables the encoder writes are generated canonical codes (12
DC categories at length 4; all 162 AC symbols at length 8 — Kraft-valid,
all-ones code unused), not the Annex K defaults: the decoder reads
whatever DHT declares, exactly as a spec decoder must.

Worker-side only: these run inside mapInPandas bodies over Arrow
batches; payloads never visit the driver.
"""

from __future__ import annotations

import math
import struct

# zigzag index: zigzag position → (row-major) natural position
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# cos((2x+1)·u·π/16) basis, u rows × x cols
_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)] for u in range(8)
]
_C = [1.0 / math.sqrt(2.0)] + [1.0] * 7


try:  # numpy fast path: M.T @ X @ M is ~50× the nested-loop form; the
    # codec's exactness arguments (constant-tile DC, integer coefficient
    # roundtrip) hold for any summation order and are pinned in tests
    import numpy as _np

    _M = _np.array(
        [[_C[u] * _COS[u][x] for x in range(8)] for u in range(8)]
    )  # _M[u, x] = c(u)·cos((2x+1)uπ/16)
except Exception:  # pragma: no cover - numpy is baked into this env
    _np = None


def _dct_block(px: list[int]) -> list[float]:
    """8×8 DCT-II of level-shifted pixels (row-major list of 64)."""
    if _np is not None:
        X = _np.asarray(px, dtype=_np.float64).reshape(8, 8)
        return list((0.25 * (_M @ X @ _M.T)).ravel())
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += px[y * 8 + x] * _COS[v][x] * _COS[u][y]
            out[u * 8 + v] = 0.25 * _C[u] * _C[v] * s
    return out


def idct_block(coeffs: list[int | float]) -> list[float]:
    """8×8 inverse DCT of dequantized coefficients (row-major), before
    level shift — public so tests can compare against an independent
    matrix-form implementation."""
    if _np is not None:
        C = _np.asarray(coeffs, dtype=_np.float64).reshape(8, 8)
        return list((0.25 * (_M.T @ C @ _M)).ravel())
    out = [0.0] * 64
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += (
                        _C[u] * _C[v] * coeffs[u * 8 + v]
                        * _COS[v][x] * _COS[u][y]
                    )
            out[y * 8 + x] = 0.25 * s
    return out


def _round_half_away(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


# -- canonical Huffman -------------------------------------------------------


def _canonical_codes(bits: list[int], vals: list[bytes | list[int]]):
    """(bits[16], huffval) → {symbol: (code, length)} per JPEG's canonical
    code construction (T.81 Annex C)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


# Generated canonical tables (see module docstring): DC categories 0..11
# all at length 4; AC symbols EOB, (run 0-15 × size 1-10), ZRL all at
# length 8 (162 codes ≤ 256, all-ones unused → Kraft-valid).
DC_BITS = [0, 0, 0, 12] + [0] * 12
DC_VALS = list(range(12))
AC_VALS = [0x00] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
] + [0xF0]
AC_BITS = [0] * 7 + [len(AC_VALS)] + [0] * 8


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.out)


def _category(v: int) -> int:
    return abs(v).bit_length()


def _encode_blocks(blocks: list[list[int]]) -> bytes:
    """Quantized coefficient blocks (natural row-major order) → entropy
    data: DC differential + AC (run, size) Huffman with EOB/ZRL."""
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    w = _BitWriter()
    prev_dc = 0
    for blk in blocks:
        zz = [blk[ZIGZAG[i]] for i in range(64)]
        diff = zz[0] - prev_dc
        prev_dc = zz[0]
        s = _category(diff)
        code, length = dc_codes[s]
        w.write(code, length)
        if s:
            w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        for i in range(1, 64):
            v = zz[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]  # ZRL: 16 zeros
                w.write(code, length)
                run -= 16
            s = _category(v)
            code, length = ac_codes[(run << 4) | s]
            w.write(code, length)
            w.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if run:
            code, length = ac_codes[0x00]  # EOB
            w.write(code, length)
    return w.flush()


def _segments(width: int, height: int, quant: list[int]) -> bytes:
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    dqt = seg(0xFFDB, bytes([0x00]) + bytes(quant[ZIGZAG[i]] for i in range(64)))
    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]),
    )
    dht_dc = seg(0xFFC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    dht_ac = seg(0xFFC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
    sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return dqt + sof + dht_dc + dht_ac + sos


def encode_jpeg_from_coeffs(
    coeff_blocks: list[list[int]],
    width: int,
    height: int,
    quant: list[int] | None = None,
) -> bytes:
    """Quantized coefficient blocks (row-major 64 ints each, raster block
    order) → baseline JPEG bytes."""
    if width % 8 or height % 8:
        raise ValueError("baseline codec requires dimensions multiple of 8")
    if len(coeff_blocks) != (width // 8) * (height // 8):
        raise ValueError("block count does not match dimensions")
    quant = quant or [1] * 64
    return (
        b"\xff\xd8"
        + _segments(width, height, quant)
        + _encode_blocks(coeff_blocks)
        + b"\xff\xd9"
    )


def encode_jpeg_gray(
    pixels: bytes,
    width: int,
    height: int,
    quant: list[int] | None = None,
) -> bytes:
    """Raw 8-bit grayscale pixels → baseline JPEG via the real pipeline
    (level shift → DCT → quantize)."""
    if width % 8 or height % 8:
        raise ValueError("baseline codec requires dimensions multiple of 8")
    if len(pixels) != width * height:
        raise ValueError(f"expected {width * height} pixel bytes")
    quant = quant or [1] * 64
    blocks = []
    for by in range(height // 8):
        for bx in range(width // 8):
            px = [
                pixels[(by * 8 + y) * width + bx * 8 + x] - 128
                for y in range(8)
                for x in range(8)
            ]
            coeffs = _dct_block(px)
            blocks.append(
                [_round_half_away(coeffs[i] / quant[i]) for i in range(64)]
            )
    return encode_jpeg_from_coeffs(blocks, width, height, quant)


# -- decoder ----------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("entropy stream exhausted")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker in entropy stream")
                self.pos += 1  # unstuff
            self.acc = (self.acc << 8) | byte
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v


def _decode_symbol(r: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | r.read(1)
        length += 1
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """Magnitude bits → signed value (T.81 F.2.2.1 EXTEND)."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(data: bytes) -> dict:
    """Baseline JPEG bytes → dict(width, height, coeff_blocks, pixels).

    ``coeff_blocks`` are the DEQUANTIZED coefficient blocks (row-major,
    raster block order) — exposed so entropy-coding roundtrips can be
    verified independently of the IDCT; ``pixels`` is the reconstructed
    grayscale image (floor(x+0.5) rounding, clamped 0..255)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant_tables: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    width = height = None
    dc_id = ac_id = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # TEM/RSTn: no payload
            continue
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        payload = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                p += 1
                if pq:
                    raise ValueError("16-bit quant tables not supported")
                zz = list(payload[p : p + 64])
                p += 64
                nat = [0] * 64
                for i in range(64):
                    nat[ZIGZAG[i]] = zz[i]
                quant_tables[tq] = nat
        elif marker == 0xC0:  # SOF0
            precision, height, width, nf = struct.unpack(">BHHB", payload[:6])
            if precision != 8 or nf != 1:
                raise ValueError("only 8-bit single-component baseline")
            if payload[7] != 0x11:
                raise ValueError("subsampling not supported")
            quant_id = payload[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                p += 17 + n
                codes = _canonical_codes(bits, vals)
                huff[(tc, th)] = {
                    (code, length): sym for sym, (code, length) in codes.items()
                }
        elif marker == 0xDA:  # SOS: entropy data follows
            dc_id, ac_id = payload[2] >> 4, payload[2] & 0x0F
            entropy_start = pos
            # entropy data runs to the next non-RST marker
            p = pos
            while p < len(data) - 1:
                if data[p] == 0xFF and data[p + 1] not in (0x00, *range(0xD0, 0xD8)):
                    break
                p += 1
            entropy = data[entropy_start:p]
            pos = p
        # other markers (APPn, COM, DRI…) are skipped by the length field
    if width is None:
        raise ValueError("no SOF0 frame found")
    quant = quant_tables[quant_id]
    dc_table, ac_table = huff[(0, dc_id)], huff[(1, ac_id)]
    r = _BitReader(entropy)
    nblocks = (width // 8) * (height // 8)
    blocks: list[list[int]] = []
    prev_dc = 0
    for _ in range(nblocks):
        zz = [0] * 64
        s = _decode_symbol(r, dc_table)
        diff = _extend(r.read(s), s) if s else 0
        prev_dc += diff
        zz[0] = prev_dc
        i = 1
        while i < 64:
            sym = _decode_symbol(r, ac_table)
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                i += 16
                continue
            run, s = sym >> 4, sym & 0x0F
            i += run
            if i > 63:
                raise ValueError("AC run past end of block")
            zz[i] = _extend(r.read(s), s)
            i += 1
        nat = [0] * 64
        for i in range(64):
            nat[ZIGZAG[i]] = zz[i] * quant[ZIGZAG[i]]
        blocks.append(nat)
    # IDCT + level shift + clamp
    pixels = bytearray(width * height)
    bi = 0
    for by in range(height // 8):
        for bx in range(width // 8):
            recon = idct_block(blocks[bi])
            bi += 1
            for y in range(8):
                for x in range(8):
                    v = int(math.floor(recon[y * 8 + x] + 128.0 + 0.5))
                    pixels[(by * 8 + y) * width + bx * 8 + x] = min(255, max(0, v))
    return {
        "width": width,
        "height": height,
        "coeff_blocks": blocks,
        "pixels": bytes(pixels),
    }
