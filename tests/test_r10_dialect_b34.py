"""Dialect probe battery 34 — datetime/strftime corners, byte-level
string semantics, numeric special values, probed against live DuckDB.

Found and fixed this round (silent wrong answers unless noted):

* ``dayofweek()`` / ``weekday()`` — DuckDB is Sunday=0..Saturday=6;
  Spark's builtin is Sunday=1 (off by one on EVERY row).
* ``levenshtein()`` — DuckDB counts UTF-8 BYTES ('sätting' costs 5,
  not 4); Spark counts characters. Routed through a byte-level shim.
* 3-arg ``regexp_replace`` — DuckDB replaces only the FIRST match
  without the 'g' flag; Spark always replaces all (the engine's old
  comment even claimed the 3-arg form was "Spark-compatible").
* strftime ``%w``/``%u`` weekday numbers, ``%n`` nanoseconds,
  ``%x``/``%X``/``%c`` locale forms (DuckDB pins ISO renderings).
* ``printf`` conversions — Java's Formatter rejects Decimal for
  %d/%x/%f; arguments now cast per conversion.
* log/ln/log2/log10 of non-positive and sqrt of negative RAISE like
  DuckDB (were NaN/NULL — the lenient direction the contract forbids).
* ``CAST(INTERVAL n unit AS VARCHAR)`` folds to DuckDB's rendering
  ('90 minutes' → '01:30:00', '14 months' → '1 year 2 months').

Documented divergences pinned below (not fixed):
* upper/lower use the JVM's full Unicode case mapping; DuckDB's is the
  1:1 simple mapping (ß→ẞ, İ→i). Data-dependent, not detectable at
  rewrite time; affects only the handful of full≠simple code points.
* round/floor/ceil on DECIMAL keep DECIMAL in DuckDB; the engine's
  bit-exact rounding shim returns DOUBLE (values agree).
"""

from __future__ import annotations

import pytest

from duckdb_server_spark.dialect import (
    register_dialect_functions,
    run_sql,
    serving_dialect,
)


@pytest.fixture(scope="module")
def sql34(spark, sf_dir):
    from duckdb_server_spark.session import register_views

    register_dialect_functions(spark)
    register_views(spark, sf_dir, ("nation", "orders"))
    return spark


def _match(spark, duck, sql: str):
    theirs = duck.execute(sql).fetchall()
    with serving_dialect(True):
        ours = [tuple(r) for r in run_sql(spark, sql).collect()]
    a = sorted([str(x) for x in r] for r in ours)
    b = sorted([str(x) for x in r] for r in theirs)
    assert a == b, f"{sql!r}: {ours[:3]} != {theirs[:3]}"


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT strftime(DATE '2024-03-09', '%j %U %W %w %u') AS x",
        "SELECT strftime(TIMESTAMP '2024-03-09 07:05:09.123456',"
        " '%f %g %n') AS x",
        "SELECT strftime(TIMESTAMP '2024-03-09 07:05:09', '%x %X') AS x,"
        " strftime(TIMESTAMP '2024-03-09 07:05:09', '%c') AS c",
        "SELECT dayofweek(DATE '2024-03-10') AS su,"
        " dayofweek(DATE '2024-03-09') AS sa,"
        " weekday(DATE '2024-03-11') AS mo",
        "SELECT dayofweek(o_orderdate) AS d, count(*) AS n FROM orders"
        " GROUP BY 1 ORDER BY 1",
        "SELECT isodow(DATE '2024-03-10') AS i7,"
        " isodow(DATE '2024-03-11') AS i1",
    ],
)
def test_datetime_corners(sql34, duck, sql):
    _match(sql34, duck, sql)


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT levenshtein('kitten', 'sätting') AS lv,"
        " levenshtein('kitten', 'sitting') AS ascii_lv,"
        " editdist3('ü', 'u') AS e",
        "SELECT levenshtein(n_name, 'NATION') AS lv FROM nation"
        " ORDER BY n_nationkey LIMIT 5",
        "SELECT regexp_replace('aaa', 'a', 'b') AS first_only,"
        " regexp_replace('aaa', 'a', 'b', 'g') AS all_matches",
        "SELECT regexp_replace('xAxa', 'a', '[]', 'i') AS ci_first",
        "SELECT regexp_replace('a1b2', '(\\d)', '<\\1>') AS backref",
        "SELECT printf('%d|%5.2f|%x|%s', 42, 3.14159, 255, 'ok') AS p",
        "SELECT printf('%05.1f', o_totalprice) AS p FROM orders"
        " ORDER BY o_orderkey LIMIT 3",
    ],
)
def test_string_semantics(sql34, duck, sql):
    _match(sql34, duck, sql)


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT CAST(INTERVAL 90 MINUTE AS VARCHAR) AS a,"
        " CAST(INTERVAL 3 DAY AS VARCHAR) AS b",
        "SELECT CAST(INTERVAL 14 MONTH AS VARCHAR) AS a,"
        " CAST(INTERVAL 2 WEEK AS VARCHAR) AS b",
        "SELECT CAST(INTERVAL 1500 MILLISECOND AS VARCHAR) AS a,"
        " CAST(INTERVAL 25 HOUR AS VARCHAR) AS b,"
        " CAST(INTERVAL 0 DAY AS VARCHAR) AS z",
    ],
)
def test_interval_varchar_rendering(sql34, duck, sql):
    _match(sql34, duck, sql)


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT CAST('inf' AS DOUBLE) AS p, CAST('-inf' AS DOUBLE) AS n,"
        " isnan(CAST('nan' AS DOUBLE)) AS i",
        "SELECT CAST('nan' AS DOUBLE) = CAST('nan' AS DOUBLE) AS eq",
        "SELECT max(x) AS mx FROM (SELECT CAST('nan' AS DOUBLE) AS x"
        " UNION ALL SELECT 5.0)",
        "SELECT 7 % 3 AS a, -7 % 3 AS b, 10 // 3 AS c, -10 // 3 AS d",
    ],
)
def test_numeric_special_values(sql34, duck, sql):
    _match(sql34, duck, sql)


@pytest.mark.parametrize(
    "expr, msg",
    [
        ("ln(0)", "logarithm of zero"),
        ("log2(0)", "logarithm of zero"),
        ("log10(-3)", "logarithm of a negative"),
        ("log(0)", "logarithm"),
        ("sqrt(-1)", "square root of a negative"),
    ],
)
def test_domain_errors_raise_like_duckdb(sql34, duck, expr, msg):
    with pytest.raises(Exception):
        duck.execute(f"SELECT {expr}")
    with serving_dialect(True):
        with pytest.raises(Exception, match=msg):
            run_sql(sql34, f"SELECT {expr}").collect()


def test_domain_ok_values_still_exact(sql34, duck):
    _match(sql34, duck,
           "SELECT ln(2.5) AS a, log2(8) AS b, log10(100) AS c,"
           " sqrt(2.0) AS d, cbrt(-8) AS e")


# --- documented divergences (pinned so a behavior change is visible) ----------


def test_documented_case_mapping_divergence(sql34, duck):
    """DuckDB applies the 1:1 simple case mapping; the JVM applies the
    full mapping. Pinned, not fixed: data-dependent, affects only
    code points where full != simple (ß, İ, ligatures)."""
    assert duck.execute("SELECT upper('straße')").fetchone()[0] == "STRAẞE"
    with serving_dialect(True):
        got = run_sql(sql34, "SELECT upper('straße') AS u").collect()[0].u
    assert got == "STRASSE"  # full mapping — the JVM side of the pin


def test_documented_decimal_round_type(sql34, duck):
    """round() of a DECIMAL stays DECIMAL in DuckDB; the engine's
    bit-exact rounding shim returns DOUBLE. VALUES agree (pinned via
    an explicit cast both sides)."""
    _match(sql34, duck,
           "SELECT CAST(round(-0.5) AS DOUBLE) AS r,"
           " CAST(round(2.5) AS DOUBLE) AS r2,"
           " CAST(floor(-0.5) AS DOUBLE) AS f")
