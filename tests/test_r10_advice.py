"""Round-10 ADVICE fixes, each with a live differential or fail-closed test:

* hash() of SMALLINT/TINYINT columns — DuckDB hashes every sub-32-bit
  integer at its 32-bit unsigned promotion (probed live:
  hash(CAST(-7 AS SMALLINT)) == hash(CAST(-7 AS INTEGER))); the shim
  previously masked at the storage width, so any NEGATIVE value in a
  SMALLINT/TINYINT column silently diverged.
* hash() of decimal literals — DuckDB's literal precision counts the
  WRITTEN digits (leading zeros included): hash(-0.000000001) is
  DECIMAL(10,9) → int64 storage → 64-bit mask. The shim previously
  chose the width from zero-stripped significant digits. Precision > 18
  (int128 storage) fails closed.
* dot-call decimal receivers — SELECT 1.5.round() is a Parser Error in
  DuckDB; the rewrite must not accept it as round(1.5).
* EXIF ASCII tags — writer rejects non-ASCII (TIFF 6.0 7-bit contract)
  instead of silently UTF-8-encoding what the reader can't decode.
* gzip optional-header walks — truncated FEXTRA / unterminated FNAME /
  oversized xlen surface the module's fail-closed ValueError family,
  not struct.error or a bare bytes.index ValueError.
"""

from __future__ import annotations

import pytest

from duckdb_server_spark.dialect import (
    register_dialect_functions,
    run_sql,
    serving_dialect,
)


@pytest.fixture(scope="module")
def sql10(spark, sf_dir):
    from duckdb_server_spark.session import register_views

    register_dialect_functions(spark)
    register_views(spark, sf_dir, ("nation",))
    return spark


def _match(spark, duck, sql: str):
    theirs = duck.execute(sql).fetchall()
    with serving_dialect(True):
        ours = [tuple(r) for r in run_sql(spark, sql).collect()]
    a = sorted([str(x) for x in r] for r in ours)
    b = sorted([str(x) for x in r] for r in theirs)
    assert a == b, f"{sql!r}: {ours[:3]} != {theirs[:3]}"


# --- hash() of sub-32-bit integer columns ------------------------------------


def test_hash_negative_smallint_tinyint_columns(sql10, duck):
    view = (
        "SELECT CAST(n_nationkey - 12 AS SMALLINT) AS s,"
        " CAST(n_nationkey - 12 AS TINYINT) AS t,"
        " CAST(n_nationkey - 12 AS INTEGER) AS i FROM nation"
    )
    sql10.sql(f"CREATE OR REPLACE TEMP VIEW r10ints AS {view}")
    duck.execute(f"CREATE OR REPLACE VIEW r10ints AS {view}")
    _match(sql10, duck,
           "SELECT s, hash(s) AS hs, hash(t) AS ht, hash(i) AS hi"
           " FROM r10ints")


def test_hash_smallint_equals_integer_promotion(duck):
    a, b = duck.execute(
        "SELECT hash(CAST(-7 AS SMALLINT)), hash(CAST(-7 AS INTEGER))"
    ).fetchone()
    assert a == b  # the premise the width table now encodes


# --- hash() of decimal literals ----------------------------------------------


@pytest.mark.parametrize(
    "sql",
    [
        # >9 written digits but 1 significant digit → int64 storage
        "SELECT hash(-0.000000001) AS h",
        "SELECT hash(0.0000000001) AS h",
        # trailing zeros count toward precision
        "SELECT hash(-1.50) AS h",
        # no integer part: precision = scale
        "SELECT hash(-.5) AS h, hash(-.000000001) AS h9, "
        "hash(-.0000000001) AS h10",
        # leading integer zeros count as written
        "SELECT hash(-00.5) AS h, hash(-000123.45) AS h8",
        # int16-storage decimals still hash at the 32-bit promotion
        "SELECT hash(-0.5) AS h, hash(-1.) AS h1",
        # the int64 tier boundary
        "SELECT hash(-123456789.123456789) AS h18",
        "SELECT hash(-12345.6789) AS h9b",
    ],
)
def test_hash_decimal_literal_widths(sql10, duck, sql):
    _match(sql10, duck, sql)


def test_hash_decimal_int128_fails_closed(sql10):
    with serving_dialect(True):
        with pytest.raises(Exception, match="hash"):
            run_sql(sql10, "SELECT hash(-0.1234567890123456789)").collect()


# --- dot-call decimal receivers ----------------------------------------------


def test_dot_call_decimal_literal_stays_error(sql10, duck):
    for bad in ("SELECT 1.5.round()", "SELECT .5.round()",
                "SELECT -2.25.abs()"):
        with pytest.raises(Exception):
            duck.execute(bad)
        with serving_dialect(True):
            with pytest.raises(Exception):
                run_sql(sql10, bad).collect()


def test_dot_call_parenthesized_decimal_still_works(sql10, duck):
    # CAST both sides to DOUBLE: DuckDB keeps DECIMAL out of round()
    _match(sql10, duck, "SELECT CAST((1.5).round() AS DOUBLE) AS r")


# --- EXIF ASCII tag codec agreement -------------------------------------------


def test_exif_writer_rejects_non_ascii():
    from duckdb_server_spark.operators.exif import build_exif_app1

    with pytest.raises(ValueError, match="7-bit"):
        build_exif_app1("Appareil—photo", "X", 1,
                        "2024:01:01 00:00:00", 8, 8)


def test_exif_ascii_roundtrip_still_works():
    from duckdb_server_spark.operators.exif import (
        build_exif_app1,
        parse_exif,
    )

    app1 = build_exif_app1("ACME", "Shooter 9000", 1,
                           "2024:01:01 00:00:00", 8, 8)
    tags = parse_exif(b"\xff\xd8" + app1)
    assert tags["make"] == "ACME" and tags["model"] == "Shooter 9000"


# --- gzip malformed-header fail-closed ----------------------------------------


def test_gzip_truncated_fextra_length():
    from duckdb_server_spark.operators.gzipio import read_members

    # FLG=FEXTRA but the member ends before the 2-byte XLEN field
    hdr = bytes([0x1F, 0x8B, 8, 4, 0, 0, 0, 0, 0, 255])
    with pytest.raises(ValueError, match="gzip: truncated header"):
        read_members(hdr + b"\x01")


def test_gzip_oversized_xlen():
    from duckdb_server_spark.operators.gzipio import read_members

    hdr = bytes([0x1F, 0x8B, 8, 4, 0, 0, 0, 0, 0, 255])
    # xlen=1000 pushes past the end of the payload
    with pytest.raises(ValueError, match="gzip: truncated header"):
        read_members(hdr + (1000).to_bytes(2, "little") + b"\x00" * 8)


def test_gzip_unterminated_fname():
    from duckdb_server_spark.operators.gzipio import read_members

    hdr = bytes([0x1F, 0x8B, 8, 8, 0, 0, 0, 0, 0, 255])
    with pytest.raises(ValueError, match="unterminated FNAME"):
        read_members(hdr + b"noterm")


def test_gzip_short_tail():
    from duckdb_server_spark.operators.gzipio import (
        read_members,
        write_member,
    )

    good = write_member(b"payload", name="a.txt")
    with pytest.raises(ValueError, match="gzip: truncated header"):
        read_members(good + b"\x1f\x8b")  # 2-byte trailing fragment


def test_gzip_good_members_still_read():
    from duckdb_server_spark.operators.gzipio import (
        decompress_all,
        write_member,
    )

    blob = write_member(b"one", name="1") + write_member(b"two")
    assert decompress_all(blob) == b"onetwo"
