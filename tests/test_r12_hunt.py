"""Round-12 fuzz-hunt pins (the battery-39 follow-on sweep over list
slicing, date_part fields, regexp/split/substring corners, and decimal
rounding — 175 differential probes against live DuckDB 1.0).

Silent wrong answers FOUND AND FIXED this round (each was a value
divergence, not an error):

* ``list_slice`` / ``arr[a:b]`` with NEGATIVE or ZERO start — the old
  lowering normalized only the END bound, so [1..5][-3:-2] returned
  [3,4,5] instead of [3,4] (dialect_rewrites/exprs.py _slice_window);
  strings shared the bug ('hello'[-3:-2]);
* negative slice STEPS hard-errored where DuckDB walks backwards
  ([1..7][7:1:-1] reverses) — _step_slice_expr;
* 2-arg ``regexp_extract`` — DuckDB's default capture group is 0 (the
  FULL match), Spark's is 1;
* ``split_part`` — index 0 and NULL anywhere return '' (Spark raises /
  returns NULL), and an empty delimiter splits per character;
* ``substring(s, 0, n)`` — start 0 is a real empty position, the
  window clips to n-1 characters;
* ``round`` on a DECIMAL literal — DuckDB rounds in decimal (HALF_UP,
  stays DECIMAL: round(2.5) = '3'); the serving path's double shim
  was retyping it;
* ``date_part``/``extract`` fields Spark lacks: isoyear, isodow,
  dayofyear, julian (with day fraction), era, decade, century,
  millennium.
"""

from __future__ import annotations

import pytest

from duckdb_server_spark.dialect import (
    register_dialect_functions,
    run_sql,
    serving_dialect,
)


@pytest.fixture(scope="module")
def sql12(spark, duck):
    register_dialect_functions(spark)
    return spark


def _match(spark, duck, sql: str):
    theirs = duck.execute(sql).fetchall()
    with serving_dialect(True):
        ours = [tuple(r) for r in run_sql(spark, sql).collect()]
    a = sorted([str(x) for x in r] for r in ours)
    b = sorted([str(x) for x in r] for r in theirs)
    assert a == b, f"{sql!r}: {ours[:4]} != {theirs[:4]}"


@pytest.mark.parametrize("sql", [
    # negative / zero starts, inverted windows, clamping
    "SELECT list_slice([1,2,3,4,5], -3, -2) AS v",
    "SELECT list_slice([1,2,3,4,5], -3, 1) AS v",
    "SELECT list_slice([1,2,3,4,5], -3, 3) AS v",
    "SELECT list_slice([1,2,3,4,5], -1, -2) AS v",
    "SELECT list_slice([1,2,3,4,5], 0, 3) AS v",
    "SELECT list_slice([1,2,3,4,5], 0, 0) AS v",
    "SELECT list_slice([1,2,3,4,5], -10, 3) AS v",
    "SELECT list_slice([1,2,3,4,5], -10, -7) AS v",
    "SELECT list_slice([1,2,3,4,5], 2, 100) AS v",
    "SELECT list_slice([1,2,3,4,5], -3, 100) AS v",
    "SELECT list_slice([1,2,3,4,5], NULL, 3) AS v",
    # bracket form shares the normalization
    "SELECT ([1,2,3,4,5])[-3:-2] AS v",
    "SELECT ([1,2,3,4,5])[0:3] AS v",
    "SELECT ([1,2,3,4,5])[-3:] AS v",
    "SELECT ([1,2,3,4,5])[:100] AS v",
    "SELECT ([1,2,3,4,5])[-1:2] AS v",
    # strings slice with the same window (parenthesized base too)
    "SELECT ('hello')[-3:-2] AS v",
    "SELECT ('hello')[0:3] AS v",
    "SELECT ('hello')[2:] AS v",
    "SELECT list_slice('hello', -3, -2) AS v",
    "SELECT list_slice('hello', 0, 3) AS v",
    # negative steps walk backwards; illegal directions are empty
    "SELECT list_slice([1,2,3,4,5,6,7], 7, 1, -1) AS v",
    "SELECT list_slice([1,2,3,4,5,6,7], 5, 2, -2) AS v",
    "SELECT list_slice([1,2,3,4,5], -1, -5, -2) AS v",
    "SELECT list_slice([1,2,3,4,5], 100, 0, -2) AS v",
    "SELECT list_slice([1,2,3,4,5], 2, 5, -1) AS v",
    "SELECT list_slice([1,2,3,4,5], -3, 5, 2) AS v",
    "SELECT list_slice([1,2,3,4,5], 0, 5, 2) AS v",
])
def test_slice_window_semantics(sql12, duck, sql):
    _match(sql12, duck, sql)


@pytest.mark.parametrize("sql", [
    "SELECT regexp_extract('aXbXc', 'X(.)X?') AS v",
    "SELECT regexp_extract('abc', '(x)?(a)') AS v",
    "SELECT regexp_extract('abc', 'z?') AS v",
    "SELECT regexp_extract('abc123', '([a-z]+)(\\d+)', 2) AS v",
    "SELECT regexp_extract(NULL, 'a') AS v",
])
def test_regexp_extract_default_group(sql12, duck, sql):
    _match(sql12, duck, sql)


@pytest.mark.parametrize("sql", [
    "SELECT split_part('a,b,c', ',', 0) AS v",
    "SELECT split_part('a,b,c', ',', -1) AS v",
    "SELECT split_part('abc', '', 2) AS v",
    "SELECT split_part('abc', '', -1) AS v",
    "SELECT split_part('abc', '', 9) AS v",
    "SELECT split_part('a,b', ',', NULL) AS v",
    "SELECT split_part(NULL, ',', 1) AS v",
    "SELECT split_part('a,b', NULL, 1) AS v",
])
def test_split_part_corners(sql12, duck, sql):
    _match(sql12, duck, sql)


@pytest.mark.parametrize("sql", [
    "SELECT substring('hello', 0, 3) AS v",
    "SELECT substring('hello', 0, 0) AS v",
    "SELECT substring('hello', 0, 1) AS v",
    "SELECT substring('hello', -2, 3) AS v",
    "SELECT substring('hello', -5, 3) AS v",
])
def test_substring_zero_start(sql12, duck, sql):
    _match(sql12, duck, sql)


@pytest.mark.parametrize("sql", [
    "SELECT round(2.5) AS a, round(3.5) AS b, round(-2.5) AS c",
    "SELECT round(2.345, 2) AS v",
    "SELECT round(2.5::DOUBLE) AS a, round(3.5::DOUBLE) AS b",
])
def test_round_decimal_literals(sql12, duck, sql):
    _match(sql12, duck, sql)


@pytest.mark.parametrize("field,probe", [
    ("isoyear", "DATE '2005-01-01'"),
    ("isoyear", "DATE '2001-01-01'"),
    ("isodow", "DATE '2001-01-01'"),
    ("isodow", "DATE '1999-12-31'"),
    ("dayofyear", "DATE '1999-12-31'"),
    ("dayofyear", "TIMESTAMP '2001-02-01 12:00:00'"),
    ("julian", "DATE '2001-01-01'"),
    ("julian", "TIMESTAMP '2001-01-01 12:00:00'"),
    ("era", "DATE '2001-01-01'"),
    ("decade", "DATE '1999-12-31'"),
    ("decade", "DATE '0001-01-01'"),
    ("century", "DATE '2000-12-31'"),
    ("century", "DATE '2001-01-01'"),
    ("millennium", "DATE '2000-01-01'"),
    ("millennium", "DATE '2001-01-01'"),
])
def test_date_part_extra_fields(sql12, duck, field, probe):
    _match(sql12, duck, f"SELECT date_part('{field}', {probe}) AS v")
    _match(sql12, duck, f"SELECT extract({field} FROM {probe}) AS v")


@pytest.mark.parametrize("sql", [
    # surfaces probed clean in the same sweep — pinned against drift
    "SELECT -7 // -4 AS q, -7 % -4 AS r",
    "SELECT 9 // -2 AS q, 9 % -2 AS r",
    "SELECT lpad('abc', -2, 'xy') AS a, rpad('abc', 0, '') AS b",
    "SELECT repeat('ñé', 3) AS v",
    "SELECT translate('abcba', 'ab', 'x') AS v",
    "SELECT strpos('hello', '') AS v",
    "SELECT left('abc', -1) AS a, right('abc', -2) AS b",
    "SELECT concat_ws('-', 'a', NULL, 'b') AS v",
    "SELECT map {'a': 1}['z'] AS v",
    "SELECT gcd(-12, 18) AS a, lcm(4, -6) AS b",
    "SELECT bit_count(-1::BIGINT) AS v",
    "SELECT regexp_replace('aaa', '', 'X', 'g') AS v",
])
def test_probed_clean_surfaces_pinned(sql12, duck, sql):
    _match(sql12, duck, sql)
