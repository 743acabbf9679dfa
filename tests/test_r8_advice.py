"""Regression pins for the round-7 ADVICE items.

Scenarios (ADVICE r7, line refs as of round 7):
1. ``webp._build_lengths`` spinning forever when most symbols share one
   over-limit depth (Fibonacci-skewed code-length-code shape), and the
   post-Kraft clamp re-violating the Kraft inequality.
2. ``_rewrite_division`` / ``_rewrite_try_mod`` (and ``_rewrite_power``
   via the shared walkers) moving a postfix ``::`` cast from the operand
   to the whole result: ``a / b::INT`` must divide by ``CAST(b AS INT)``.
3. ``flac.encode_flac`` silently masking block-size/rate fields over
   their bit widths instead of raising.
4. ``gif.decode_gif`` crashing (or reading garbage) on pixel indices
   beyond a short local color table instead of a clean parse error.
5. ``_rewrite_subscripts`` classifying ANY masked token as a string
   literal, so ``"arr_col"[2]`` (quoted identifier, array column)
   dispatched to substr() instead of element_at().
"""

from __future__ import annotations

from collections import Counter

import pytest

from duckdb_server_spark.dialect import (
    _rewrite_division,
    _rewrite_power,
    _rewrite_try_mod,
    register_dialect_functions,
    run_sql,
    serving_dialect,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sql_session(spark):
    from duckdb_server_spark.session import register_views

    register_dialect_functions(spark)
    register_views(spark, SF_DIR, ("orders", "nation", "region"))
    return spark


def _both(spark, duck, sql: str):
    # DuckDB-first serving mode: byte-identical SQL, DuckDB semantics
    with serving_dialect(True):
        ours = sorted(tuple(r) for r in run_sql(spark, sql).collect())
    theirs = sorted(tuple(r) for r in duck.execute(sql).fetchall())
    return ours, theirs


# --- 1. length-limited Huffman construction -------------------------------


def test_build_lengths_fibonacci_skew_terminates():
    from duckdb_server_spark.operators.webp import _build_lengths

    fib = [1, 1]
    while len(fib) < 19:
        fib.append(fib[-1] + fib[-2])
    lens = _build_lengths(Counter(dict(enumerate(fib))), 19, max_len=7)
    used = [l for l in lens if l]
    assert len(used) == 19
    assert max(used) <= 7
    assert sum(2.0**-l for l in used) <= 1.0


def test_build_lengths_kraft_valid_fuzz():
    import random

    from duckdb_server_spark.operators.webp import _build_lengths

    rng = random.Random(80)
    for _ in range(200):
        n = rng.randint(2, 280)
        ml = rng.choice([7, 15])
        if n > (1 << ml):
            continue
        freqs = Counter(
            {
                s: 10 ** rng.randint(0, 6)
                for s in rng.sample(range(n), rng.randint(2, n))
            }
        )
        lens = _build_lengths(freqs, n, max_len=ml)
        used = [l for l in lens if l]
        assert max(used) <= ml
        assert sum(2.0**-l for l in used) <= 1.0
        assert all(lens[s] > 0 for s in freqs)


def test_webp_roundtrip_skewed_image():
    # an image whose residual histogram is heavily skewed exercises the
    # length-limit path end-to-end (encode must terminate and decode back)
    from duckdb_server_spark.operators.webp import decode_webp, encode_webp_gray

    w, h = 40, 30
    pix = bytes((x * x * 7 + y * 13) % 256 if x % 9 else 200 for y in range(h) for x in range(w))
    blob = encode_webp_gray(pix, w, h)
    out = decode_webp(blob)
    assert out["width"] == w and out["height"] == h
    assert out["pixels"] == pix


# --- 2. postfix :: cast binds tighter than / % ^ --------------------------


def test_division_cast_precedence_unit():
    assert _rewrite_division("a / b::INT") == "try_divide(CAST(a AS DOUBLE), b::INT)"
    assert _rewrite_division("a::INT / b") == "try_divide(CAST(a::INT AS DOUBLE), b)"
    assert (
        _rewrite_division("a / b :: DECIMAL(10,2)")
        == "try_divide(CAST(a AS DOUBLE), b :: DECIMAL(10,2))"
    )
    assert _rewrite_try_mod("a % b::INT") == "try_mod(a, b::INT)"
    assert _rewrite_try_mod("a::INT % b") == "try_mod(a::INT, b)"
    assert _rewrite_power("a ^ b::INT") == "power(a, b::INT)"
    assert _rewrite_power("a::INT ^ b") == "power(a::INT, b)"


def test_division_cast_precedence_differential(sql_session, duck):
    # DuckDB: 7 / 2::INT = 3.5 (divisor cast, double division) — the old
    # rewrite produced CAST(3.5 AS INT) = 3, a silent value+type change
    sql = (
        "SELECT 7 / 2::INT AS q, 7 % 3::INT AS r, 2 ^ 3::INT AS p, "
        "o_orderkey / 4::INT AS ok FROM orders ORDER BY o_orderkey LIMIT 5"
    )
    ours, theirs = _both(sql_session, duck, sql)
    assert ours == theirs
    assert ours[0][0] == pytest.approx(3.5)


# --- 3. FLAC subset range guards ------------------------------------------


def test_flac_rejects_oversize_input():
    from duckdb_server_spark.operators.flac import decode_flac, encode_flac

    with pytest.raises(ValueError, match="65535"):
        encode_flac([0] * 65536)
    with pytest.raises(ValueError, match="sample rate"):
        encode_flac([0, 1, 2], sample_rate=1 << 20)
    # boundary values still round-trip
    blob = encode_flac([1, -1, 32767, -32768], sample_rate=(1 << 20) - 1)
    out = decode_flac(blob)
    assert out["samples"] == [1, -1, 32767, -32768]


# --- 4. GIF pixel index outside the color table ---------------------------


def test_gif_short_color_table_clean_error():
    from duckdb_server_spark.operators.gif import decode_gif, encode_gif

    # craft a valid 4-pixel GIF, then shrink its global color table to 2
    # entries (size field 0) while the LZW stream still emits indices up
    # to 255 — decode must fail with a parse error, not IndexError
    blob = bytearray(encode_gif(bytes([0, 85, 170, 255]), 2, 2))
    assert blob[10] & 0x80  # global color table present
    n_entries = 2 << (blob[10] & 0x07)
    assert n_entries == 256
    # drop all but the first 2 entries and fix the size field
    blob[10] = (blob[10] & 0xF8) | 0x00
    del blob[13 + 2 * 3 : 13 + n_entries * 3]
    with pytest.raises(ValueError, match="color table"):
        decode_gif(bytes(blob))


# --- 5. quoted-identifier subscript on an array column --------------------


def test_quoted_identifier_array_subscript(sql_session, duck):
    sql = (
        'SELECT "arr"[2] AS second FROM '
        "(SELECT [o_orderkey, o_orderkey + 1] AS arr FROM orders "
        "ORDER BY o_orderkey LIMIT 3) t"
    )
    ours, theirs = _both(sql_session, duck, sql)
    assert ours == theirs


def test_quoted_string_literal_subscript_still_string(sql_session, duck):
    sql = "SELECT 'abcdef'[2] AS c2, 'abcdef'[2:4] AS s24"
    ours, theirs = _both(sql_session, duck, sql)
    assert ours == theirs
