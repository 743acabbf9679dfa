"""Dialect probe battery 36 — decimal arithmetic scales, temporal
casts, and string-window edges probed against live DuckDB. One fix:
``substr`` with a NEGATIVE length extends BACKWARDS from the (possibly
negative) start position, clamped at 1 (substr('hello', 4, -2) =
'el'; substr('hello', 3, -99) = 'he') — Spark returned ''. Literal
negative lengths rewrite exactly; positive-literal lengths (the hot
path) stay native. Two lenient-direction differences pinned: the
engine accepts 'YES'-style boolean casts and single-digit-hour
timestamps that DuckDB rejects (extra acceptance, never a wrong value
for input DuckDB serves)."""

from __future__ import annotations

import pytest

from duckdb_server_spark.dialect import (
    register_dialect_functions,
    run_sql,
    serving_dialect,
)


@pytest.fixture(scope="module")
def sql36(spark, sf_dir):
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
        "SELECT substr('hello', 2, -1) AS a, substr('hello', 4, -2) AS b",
        "SELECT substr('hello', 3, -99) AS c, substr('hello', -2, -2) AS d",
        "SELECT substr('hello', 2, 3) AS pos, substr('hello', -3) AS tail",
        "SELECT substr(n_name, 4, -2) AS w FROM nation"
        " ORDER BY n_nationkey LIMIT 5",
    ],
)
def test_negative_substr_length(sql36, duck, sql):
    _match(sql36, duck, sql)


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT 1.5 + 2.25 AS a, 1.5 * 2.25 AS b,"
        " CAST(10 AS DECIMAL(10,2)) / 4 AS c",
        "SELECT 0.1 + 0.2 = 0.3 AS exact_decimal",
        "SELECT CAST(1 AS DECIMAL(5,2)) - CAST(0.001 AS DECIMAL(5,3)) AS d",
        "SELECT round(CAST(2.675 AS DECIMAL(10,3)), 2) AS r",
        "SELECT 7 / 2 AS a, CAST(7 AS BIGINT) / CAST(2 AS BIGINT) AS b",
        "SELECT CASE WHEN true THEN 1 ELSE 2.5 END AS a",
    ],
)
def test_decimal_arithmetic_scales(sql36, duck, sql):
    _match(sql36, duck, sql)


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT CAST('2024-3-9' AS DATE) AS a,"
        " CAST(' 2024-03-09 ' AS DATE) AS c",
        "SELECT try_cast('not a date' AS DATE) AS d",
        "SELECT CAST('2024-03-09T07:05:09' AS TIMESTAMP) AS e",
        "SELECT CAST(DATE '2024-03-09' AS VARCHAR) AS a,"
        " CAST(TIMESTAMP '2024-03-09 07:05:09.5' AS VARCHAR) AS b",
        "SELECT CAST(true AS INT) AS d, CAST(true AS VARCHAR) AS e",
        "SELECT CAST('t' AS BOOLEAN) AS a, CAST(0 AS BOOLEAN) AS c",
    ],
)
def test_temporal_and_boolean_casts(sql36, duck, sql):
    _match(sql36, duck, sql)


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT 1 IN (1, NULL) AS a, 2 IN (1, NULL) AS b,"
        " NULL IN (1) AS c, 2 NOT IN (1, NULL) AS d",
        "SELECT lpad('abc', 2, 'x') AS a, rpad('abc', 2, 'x') AS b",
        "SELECT 'abc' < 'abd' AS a, 'Z' < 'a' AS b, '10' < '9' AS c",
        "SELECT count(*) AS n FROM orders HAVING count(*) > 0",
        "SELECT n_nationkey FROM nation ORDER BY 1 LIMIT 2 + 3",
        "SELECT upper(o_orderstatus) AS s, count(*) AS n FROM orders"
        " GROUP BY s ORDER BY s",
    ],
)
def test_surrounding_corners(sql36, duck, sql):
    _match(sql36, duck, sql)
