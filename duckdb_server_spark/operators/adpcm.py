"""Pure-stdlib IMA ADPCM codec (DVI4 / WAV format tag 0x11) — the
stateful compressed-audio format behind the multimodal dispatch,
complementing G.711 (operators/g711.py): where G.711 is a stateless
per-sample quantizer, IMA ADPCM carries (predictor, step-index) STATE
across samples at 4 bits per sample — the recurrence every mainstream
lossy audio codec builds on.

The algorithm is the public IMA/DVI specification (step table of 89
entries, 3-bit magnitude quantization of the prediction residual,
index adaptation): both directions share one state update, so the
decode of an encode is a deterministic state machine over the input
samples — which is what lets a SQL oracle replay it exactly with a
recursive CTE (see catalog/beyond.py::b33d).

Block layout (single block, the WAV tag-0x11 shape): predictor int16
(= sample 0), step index uint8, reserved uint8, then packed nibbles
(low nibble first) for the remaining samples.
"""

from __future__ import annotations

import struct

STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
# index adjustment by the 3 magnitude bits of the nibble
INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _step_state(pred: int, idx: int, nibble: int) -> tuple[int, int]:
    """The shared encoder/decoder state update: apply one 4-bit code."""
    step = STEP_TABLE[idx]
    delta = nibble & 0x07
    diffq = step >> 3
    if delta & 4:
        diffq += step
    if delta & 2:
        diffq += step >> 1
    if delta & 1:
        diffq += step >> 2
    pred = _clamp16(pred - diffq if nibble & 0x08 else pred + diffq)
    idx = min(88, max(0, idx + INDEX_TABLE[delta]))
    return pred, idx


def encode_nibbles(samples: list[int]) -> tuple[int, list[int]]:
    """Linear samples → (predictor₀, nibbles for samples[1:])."""
    pred, idx = samples[0], 0
    nibbles = []
    for s in samples[1:]:
        step = STEP_TABLE[idx]
        diff = s - pred
        nibble = 0x08 if diff < 0 else 0x00
        diff = -diff if diff < 0 else diff
        if diff >= step:
            nibble |= 4
            diff -= step
        if diff >= step >> 1:
            nibble |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            nibble |= 1
        nibbles.append(nibble)
        pred, idx = _step_state(pred, idx, nibble)
    return samples[0], nibbles


def decode_nibbles(pred0: int, nibbles: list[int]) -> list[int]:
    """(predictor₀, nibbles) → linear samples (len(nibbles) + 1)."""
    out = [pred0]
    pred, idx = pred0, 0
    for n in nibbles:
        pred, idx = _step_state(pred, idx, n)
        out.append(pred)
    return out


def encode_adpcm_block(samples: list[int]) -> bytes:
    """One IMA block: 4-byte header + packed nibbles (low first)."""
    pred0, nibbles = encode_nibbles(samples)
    if len(nibbles) % 2:
        nibbles = nibbles + [0]
    packed = bytes(
        (nibbles[i] | (nibbles[i + 1] << 4)) for i in range(0, len(nibbles), 2)
    )
    return struct.pack("<hBB", pred0, 0, 0) + packed


def decode_adpcm_block(block: bytes, n_samples: int) -> list[int]:
    pred0, idx0, _rsv = struct.unpack_from("<hBB", block)
    if idx0 != 0:
        # our encoder always starts at index 0; honoring a stored index
        # is the same state machine with a different seed
        pass
    nibbles = []
    for byte in block[4:]:
        nibbles.append(byte & 0x0F)
        nibbles.append(byte >> 4)
    out = [pred0]
    pred, idx = pred0, idx0
    for n in nibbles[: n_samples - 1]:
        pred, idx = _step_state(pred, idx, n)
        out.append(pred)
    return out
