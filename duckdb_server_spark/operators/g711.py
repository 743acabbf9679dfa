"""Pure-stdlib ITU-T G.711 μ-law / A-law codecs — the first REAL
compressed-audio formats behind the multimodal dispatch
(operators/multimodal.py), extending the PCM path (operators/wav.py).

G.711 (ITU-T, 1972/1988) is the canonical telephony companding pair:
8-bit logarithmic codes over 14-bit (μ-law) / 13-bit (A-law) linear
PCM, 2:1 compression. Both laws are pure integer quantizers — sign +
3-bit exponent (segment) + 4-bit mantissa — so the decode of an encode
is an exactly-defined integer function of the input sample. That is
what makes a format-blind differential oracle possible: DuckDB can
replay the quantization with CASE/shift arithmetic and must hash-match
the real decoder bit for bit.

WAV carries these as format tags 7 (μ-law) and 6 (A-law); the wav.py
chunk walk dispatches here for those tags.
"""

from __future__ import annotations

_MU_BIAS = 0x84  # 132
_MU_CLIP = 32635


def mulaw_encode_sample(s: int) -> int:
    """Linear 16-bit sample → 8-bit μ-law code (G.711 table 2a/2b)."""
    sign = 0x80 if s < 0 else 0
    mag = min(-s if s < 0 else s, _MU_CLIP) + _MU_BIAS
    e = 7
    for exp in range(8):
        if mag < (0x100 << exp):
            e = exp
            break
    m = (mag >> (e + 3)) & 0x0F
    return ~(sign | (e << 4) | m) & 0xFF


def mulaw_decode_sample(code: int) -> int:
    """8-bit μ-law code → linear sample (exact inverse quantizer)."""
    code = ~code & 0xFF
    sign = code & 0x80
    e = (code >> 4) & 0x07
    m = code & 0x0F
    mag = (((m << 3) + _MU_BIAS) << e) - _MU_BIAS
    return -mag if sign else mag


def alaw_encode_sample(s: int) -> int:
    """Linear 16-bit sample → 8-bit A-law code (G.711 table 1a/1b).
    A-law operates on 13-bit magnitudes: the low 3 bits are dropped."""
    sign = 0x00 if s < 0 else 0x80
    mag = min((-s if s < 0 else s) >> 3, 0xFFF)
    if mag < 0x20:
        code = mag >> 1
    else:
        e = 7
        for exp in range(1, 8):
            if mag < (0x20 << exp):
                e = exp
                break
        m = (mag >> e) & 0x0F
        code = (e << 4) | m
    return (sign | code) ^ 0x55


def alaw_decode_sample(code: int) -> int:
    """8-bit A-law code → linear sample (exact inverse quantizer)."""
    code ^= 0x55
    sign = code & 0x80
    e = (code >> 4) & 0x07
    m = code & 0x0F
    if e == 0:
        mag = (m << 4) + 8
    else:
        mag = ((m << 4) + 0x108) << (e - 1)
    return mag if sign else -mag


def mulaw_quantize(s: int) -> int:
    """decode(encode(s)) as one integer function — what the SQL oracle
    replays. Kept separate so tests can pin codec == quantizer."""
    return mulaw_decode_sample(mulaw_encode_sample(s))


def alaw_quantize(s: int) -> int:
    return alaw_decode_sample(alaw_encode_sample(s))


def g711_encode(samples: list[int], law: str) -> bytes:
    enc = mulaw_encode_sample if law == "mulaw" else alaw_encode_sample
    return bytes(enc(s) for s in samples)


def g711_decode(data: bytes, law: str) -> list[int]:
    dec = mulaw_decode_sample if law == "mulaw" else alaw_decode_sample
    return [dec(c) for c in data]


def mulaw_quantize_sql(col: str) -> str:
    """DuckDB SQL expression computing ``mulaw_quantize(col)`` from pure
    integer arithmetic — the format-blind oracle side. The exponent is
    an 8-arm CASE over the biased magnitude's segment boundaries (no
    floats anywhere)."""
    mag = f"(least(abs({col}), {_MU_CLIP}) + {_MU_BIAS})"
    e = (
        "(CASE "
        + " ".join(
            f"WHEN {mag} < {0x100 << exp} THEN {exp}" for exp in range(8)
        )
        + " ELSE 7 END)"
    )
    q = f"(((((({mag} >> ({e} + 3)) & 15) << 3) + {_MU_BIAS}) << {e}) - {_MU_BIAS})"
    return f"(CASE WHEN {col} < 0 THEN -{q} ELSE {q} END)"


def alaw_quantize_sql(col: str) -> str:
    """DuckDB SQL expression computing ``alaw_quantize(col)``."""
    mag = f"least(abs({col}) >> 3, 4095)"
    e = (
        "(CASE "
        + " ".join(
            f"WHEN {mag} < {0x20 << exp} THEN {exp}" for exp in range(1, 8)
        )
        + " ELSE 7 END)"
    )
    # e==0 (mag < 0x20): decoded = ((mag >> 1) << 4) + 8
    # e>=1: m = (mag >> e) & 15; decoded = ((m << 4) + 264) << (e - 1)
    q = (
        f"(CASE WHEN {mag} < 32 THEN (({mag} >> 1) << 4) + 8 "
        f"ELSE (((({mag} >> {e}) & 15) << 4) + 264) << ({e} - 1) END)"
    )
    return f"(CASE WHEN {col} < 0 THEN -{q} ELSE {q} END)"
