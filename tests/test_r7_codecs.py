"""Round-7 codec units: GIF (LZW + interlace), MP4 (ISO BMFF sample
tables), G.711 μ-law/A-law. Pure-python — no Spark session needed; the
distributed end-to-end proof lives in the declared queries
b30c/b32c/b33c and their differential oracles."""

from __future__ import annotations

import random

import pytest


# --- GIF -------------------------------------------------------------------


def test_gif_roundtrip_random():
    from duckdb_server_spark.operators.gif import decode_gif, encode_gif

    rng = random.Random(7)
    for trial in range(40):
        w, h = rng.randint(1, 40), rng.randint(1, 40)
        px = bytes(rng.randrange(256) for _ in range(w * h))
        d = decode_gif(encode_gif(px, w, h, interlace=bool(trial % 2)))
        assert (d["width"], d["height"]) == (w, h)
        assert d["pixels"] == px


def test_gif_lzw_table_overflow_reset():
    # 40k random pixels force the code table past 4095 → clear-code
    # reset path on both sides.
    from duckdb_server_spark.operators.gif import decode_gif, encode_gif

    rng = random.Random(11)
    w, h = 200, 200
    px = bytes(rng.randrange(256) for _ in range(w * h))
    assert decode_gif(encode_gif(px, w, h))["pixels"] == px


def test_gif_compressible_runs_interlaced():
    # long runs grow deep LZW prefixes (exercises KwKwK); interlaced.
    from duckdb_server_spark.operators.gif import decode_gif, encode_gif

    px = bytes([7]) * 20000 + bytes(range(256)) * 60 + bytes([3]) * 4640
    assert decode_gif(encode_gif(px, 200, 200, interlace=True))["pixels"] == px


def test_gif_skips_extension_blocks():
    from duckdb_server_spark.operators.gif import decode_gif, encode_gif

    g = encode_gif(bytes(range(64)), 8, 8)
    # splice a graphics-control extension after the color table
    # (header 13 + 768 palette bytes)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = g[: 13 + 768] + gce + g[13 + 768 :]
    assert decode_gif(spliced)["pixels"] == bytes(range(64))


def test_decode_image_dispatches_gif():
    from duckdb_server_spark.operators.gif import encode_gif
    from duckdb_server_spark.operators.multimodal import decode_image

    img = decode_image(encode_gif(bytes([9]) * 16, 4, 4))
    assert img["pixels"] == bytes([9]) * 16


# --- MP4 -------------------------------------------------------------------


def test_mp4_sample_table_roundtrip():
    from duckdb_server_spark.operators.mp4 import (
        decode_mp4_frame,
        encode_mp4_mjpeg,
        probe_mp4,
    )

    rng = random.Random(3)
    for n in (1, 2, 3, 7, 12):
        frames = [
            bytes(rng.randrange(256) for _ in range(rng.randint(5, 400)))
            for _ in range(n)
        ]
        p = encode_mp4_mjpeg(frames, 8, 8)
        info = probe_mp4(p)
        assert info["declared_frames"] == n
        assert (info["width"], info["height"]) == (8, 8)
        for i in range(n):
            assert decode_mp4_frame(p, i, info) == frames[i]


def test_mp4_stsc_tail_chunk():
    # 7 samples at 2-per-chunk → 4 chunks, last holds 1 → two stsc runs.
    from duckdb_server_spark.operators.mp4 import encode_mp4_mjpeg, probe_mp4

    frames = [bytes([i]) * (10 + i) for i in range(7)]
    info = probe_mp4(encode_mp4_mjpeg(frames, 8, 8))
    assert [s[1] for s in info["samples"]] == [10 + i for i in range(7)]


def test_mp4_rejects_garbage():
    from duckdb_server_spark.operators.mp4 import probe_mp4

    with pytest.raises(ValueError):
        probe_mp4(b"\x00" * 64)


# --- G.711 -----------------------------------------------------------------


def test_g711_codec_equals_quantizer_exhaustive():
    from duckdb_server_spark.operators import g711

    for s in range(-32768, 32768, 7):  # dense stride; SQL test is exhaustive
        assert g711.mulaw_decode_sample(
            g711.mulaw_encode_sample(s)
        ) == g711.mulaw_quantize(s)
        assert g711.alaw_decode_sample(
            g711.alaw_encode_sample(s)
        ) == g711.alaw_quantize(s)
        assert 0 <= g711.mulaw_encode_sample(s) <= 255
        assert 0 <= g711.alaw_encode_sample(s) <= 255


def test_g711_sql_replay_exhaustive():
    """The SQL quantizer expression must equal the codec for EVERY
    16-bit sample value — this is what licenses the b33c oracle."""
    import duckdb

    from duckdb_server_spark.operators import g711

    con = duckdb.connect()
    con.execute("CREATE TABLE v AS SELECT range AS s FROM range(-32768, 32768)")
    mu = con.execute(
        f"SELECT s, {g711.mulaw_quantize_sql('s')} AS q FROM v ORDER BY s"
    ).fetchall()
    al = con.execute(
        f"SELECT s, {g711.alaw_quantize_sql('s')} AS q FROM v ORDER BY s"
    ).fetchall()
    assert all(q == g711.mulaw_quantize(s) for s, q in mu)
    assert all(q == g711.alaw_quantize(s) for s, q in al)


def test_g711_wav_roundtrip():
    from duckdb_server_spark.operators import g711
    from duckdb_server_spark.operators.wav import decode_wav, encode_wav

    samples = [0, 1, -1, 100, -100, 5000, -5000, 32767, -32768]
    for law in ("mulaw", "alaw"):
        wav = encode_wav(samples, 8000, 1, codec=law)
        out = decode_wav(wav)
        q = g711.mulaw_quantize if law == "mulaw" else g711.alaw_quantize
        assert out["samples"] == [q(s) for s in samples]
        assert out["bits"] == 8
        assert out["sample_rate"] == 8000


def test_wav_pcm_path_unchanged():
    from duckdb_server_spark.operators.wav import decode_wav, encode_wav

    samples = [0, 5, -5, 300, -300]
    assert decode_wav(encode_wav(samples))["samples"] == samples


# --- WebP (VP8L) -----------------------------------------------------------


def test_webp_roundtrip_random_and_structured():
    from duckdb_server_spark.operators.webp import (
        decode_webp,
        encode_webp_gray,
    )

    rng = random.Random(5)
    for trial in range(60):
        w, h = rng.randint(1, 40), rng.randint(1, 40)
        kind = trial % 4
        if kind == 0:
            px = bytes(rng.randrange(256) for _ in range(w * h))
        elif kind == 1:  # constant → single-symbol (0-bit) green code
            px = bytes([rng.randrange(256)]) * (w * h)
        elif kind == 2:  # row repeats → long LZ77 backrefs
            base = bytes(rng.randrange(256) for _ in range(max(1, w)))
            px = (base * (h + 1))[: w * h]
        else:
            px = bytes((i * 7) % 256 for i in range(w * h))
        d = decode_webp(encode_webp_gray(px, w, h))
        assert (d["width"], d["height"]) == (w, h)
        assert d["pixels"] == px


def test_webp_deep_huffman_and_refs():
    from duckdb_server_spark.operators.webp import (
        decode_webp,
        encode_webp_gray,
    )

    px = (bytes(range(256)) * 100)[: 200 * 100]
    assert decode_webp(encode_webp_gray(px, 200, 100))["pixels"] == px


def test_webp_dispatches_lossy_vp8():
    # since operators/vp8.py, a "VP8 " chunk dispatches to the real
    # key-frame decoder (which validates the frame) instead of raising
    # NotImplementedError; VP8X extended files remain the plug point
    from duckdb_server_spark.operators.webp import decode_webp

    fake = b"RIFF" + b"\x10\x00\x00\x00" + b"WEBP" + b"VP8 " + b"\x00" * 8
    with pytest.raises(ValueError):
        decode_webp(fake)  # truncated frame → clean parse error
    fakex = b"RIFF" + b"\x10\x00\x00\x00" + b"WEBP" + b"VP8X" + b"\x00" * 8
    with pytest.raises(NotImplementedError):
        decode_webp(fakex)


def test_decode_image_dispatches_webp():
    from duckdb_server_spark.operators.multimodal import decode_image
    from duckdb_server_spark.operators.webp import encode_webp_gray

    img = decode_image(encode_webp_gray(bytes([9]) * 16, 4, 4))
    assert img["pixels"] == bytes([9]) * 16


# --- IMA ADPCM ---------------------------------------------------------------


def test_adpcm_state_machine_determinism():
    from duckdb_server_spark.operators.adpcm import (
        decode_adpcm_block,
        decode_nibbles,
        encode_adpcm_block,
        encode_nibbles,
    )

    rng = random.Random(3)
    for _ in range(60):
        n = rng.randint(1, 200)
        samples = [rng.randint(-32768, 32767) for _ in range(n)]
        p0, nibs = encode_nibbles(samples)
        dec = decode_nibbles(p0, nibs)
        assert len(dec) == n and dec[0] == samples[0]
        assert decode_adpcm_block(encode_adpcm_block(samples), n) == dec


def test_adpcm_tracks_smooth_signal():
    import math

    from duckdb_server_spark.operators.adpcm import (
        decode_nibbles,
        encode_nibbles,
    )

    samples = [int(8000 * math.sin(k / 5)) for k in range(200)]
    p0, nibs = encode_nibbles(samples)
    dec = decode_nibbles(p0, nibs)
    # after the adaptive index warms up, tracking error is step-bounded
    tail_err = max(abs(a - b) for a, b in zip(samples[50:], dec[50:]))
    assert tail_err < 600


def test_adpcm_wav_roundtrip():
    from duckdb_server_spark.operators.adpcm import (
        decode_nibbles,
        encode_nibbles,
    )
    from duckdb_server_spark.operators.wav import decode_wav, encode_wav

    samples = [0, 100, -100, 5000, -5000, 300, 301, 299, 32767, -32768, 7]
    out = decode_wav(encode_wav(samples, 8000, 1, codec="adpcm"))
    p0, nibs = encode_nibbles(samples)
    assert out["samples"] == decode_nibbles(p0, nibs)
    assert out["bits"] == 4 and out["sample_rate"] == 8000


def test_adpcm_clamps_at_int16_bounds():
    from duckdb_server_spark.operators.adpcm import (
        decode_nibbles,
        encode_nibbles,
    )

    # a hard step to the opposite rail forces the clamp once the index
    # has adapted to maximum step size
    samples = [32767] + [-32768] * 40 + [32767] * 40
    p0, nibs = encode_nibbles(samples)
    dec = decode_nibbles(p0, nibs)
    assert all(-32768 <= v <= 32767 for v in dec)
    assert min(dec) == -32768 and max(dec) == 32767


# --- FLAC --------------------------------------------------------------------


def test_flac_lossless_roundtrip():
    import math

    from duckdb_server_spark.operators.flac import decode_flac, encode_flac

    rng = random.Random(9)
    for trial in range(60):
        kind = trial % 4
        n = rng.randint(1, 300)
        if kind == 0:  # noise → verbatim or rice-escape path
            samples = [rng.randint(-32768, 32767) for _ in range(n)]
        elif kind == 1:  # constant subframe
            samples = [rng.randint(-50, 50)] * n
        elif kind == 2:  # linear ramps → fixed predictors
            base = rng.randint(-1000, 1000)
            samples = [base + i * rng.randrange(-3, 4) for i in range(n)]
        else:  # smooth + dither → rice coding proper
            samples = [
                int(3000 * math.sin(i / 7)) + rng.randint(-5, 5)
                for i in range(n)
            ]
        d = decode_flac(encode_flac(samples))
        assert d["samples"] == samples
        assert d["bits"] == 16 and d["channels"] == 1


def test_flac_actually_compresses():
    import math

    from duckdb_server_spark.operators.flac import encode_flac

    smooth = [int(8000 * math.sin(i / 9)) for i in range(1000)]
    assert len(encode_flac(smooth)) < 2000  # 16-bit raw would be 2000 B


def test_flac_crc_detects_corruption():
    from duckdb_server_spark.operators.flac import decode_flac, encode_flac

    f = bytearray(encode_flac([10, 20, 30, 25, 15]))
    f[-10] ^= 0x40  # flip a bit inside the frame
    with pytest.raises(ValueError):
        decode_flac(bytes(f))


def test_decode_audio_dispatches_flac():
    from duckdb_server_spark.operators.flac import encode_flac
    from duckdb_server_spark.operators.multimodal import decode_audio

    out = decode_audio(encode_flac([5, -5, 7]))
    assert out["samples"] == [5, -5, 7]
