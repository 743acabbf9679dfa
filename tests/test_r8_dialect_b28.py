"""Dialect probe battery 28 — scalar-tail sweep fixes: isodow(),
strlen()'s BYTE-length semantics (was a silent wrong answer on
non-ASCII text: the old alias mapped it to the character count),
grapheme slicing, current_schemas(), the md5_number little-endian
halves, and DuckDB's \\xHH-escaped BLOB → VARCHAR rendering (escape
everything outside 32..126 plus the backslash itself, uppercase hex).
Differential against live DuckDB.
"""

from __future__ import annotations

import pytest

from duckdb_server_spark.dialect import (
    execute_statement,
    register_dialect_functions,
    run_sql,
    serving_dialect,
)


@pytest.fixture(scope="module")
def sql_session(spark):
    register_dialect_functions(spark)
    return spark


def _match(spark, duck, sql: str):
    theirs = duck.execute(sql).fetchall()
    with serving_dialect(True):
        ours = [tuple(r) for r in run_sql(spark, sql).collect()]
    # stringify cells: DECIMAL(20,0) vs python int etc.
    a = [[str(x) for x in r] for r in ours]
    b = [[str(x) for x in r] for r in theirs]
    assert a == b, f"{sql!r}: {ours[:2]} != {theirs[:2]}"


@pytest.mark.parametrize(
    "sql",
    [
        # ISO day-of-week function form (extract-form already served)
        "SELECT isodow(DATE '2020-01-05') AS su, isodow(DATE '2020-01-06')"
        " AS mo, isodow(DATE '2020-01-10') AS fr",
        # strlen = BYTES; length = characters — they differ on 'é'
        "SELECT strlen('héllo') AS b, length('héllo') AS c,"
        " strlen('abc') AS a",
        # grapheme slicing (composed text: = codepoint slicing)
        "SELECT left_grapheme('héllo', 2) AS l,"
        " right_grapheme('héllo', 2) AS r",
        # search-path introspection
        "SELECT current_schemas(true) AS t, current_schemas(false) AS f",
        # md5 digest halves as little-endian unsigned ints
        "SELECT md5_number_lower('abc') AS lo, md5_number_upper('abc')"
        " AS hi, md5_number_lower('') AS lo0",
        # decode() is the strict-UTF-8 conversion
        "SELECT decode('ab'::BLOB) AS d",
    ],
)
def test_scalar_tails_b28(sql_session, duck, sql):
    _match(sql_session, duck, sql)


def test_blob_varchar_rendering(sql_session, duck):
    for st in (
        "CREATE TABLE b28_b AS SELECT unhex('41FF005C207E') AS raw",
    ):
        duck.execute(st)
        execute_statement(sql_session, st)
    _match(
        sql_session, duck,
        "SELECT CAST(raw AS VARCHAR) AS v, raw::VARCHAR AS w FROM b28_b",
    )
    for st in ("DROP TABLE b28_b",):
        duck.execute(st)
        execute_statement(sql_session, st)


@pytest.mark.parametrize(
    "sql",
    [
        # list-quantile form: one sorted collect, one pick per p
        "SELECT quantile_disc(o_totalprice, [0.25, 0.5, 0.9]) AS q,"
        " quantile_disc(o_totalprice, 0.5) AS m FROM orders",
        # non-NULL element count and the list_pack constructor
        "SELECT list_count([1, NULL, 2]) AS lc,"
        " list_count(CAST([] AS INT[])) AS lz, list_pack(1, 2, 3) AS lp",
        # engine-RNG seeding: a session no-op returning NULL on both
        "SELECT setseed(0.42) AS s",
    ],
)
def test_aggregate_tails_b28(sql_session, duck, sql):
    from duckdb_server_spark.session import register_views

    register_views(sql_session, "/root/testdata/sf0.001", ("orders",))
    _match(sql_session, duck, sql)


@pytest.mark.parametrize(
    "sql",
    [
        # ^@ is starts-with; ^ stays exponentiation next to it
        "SELECT 'abc' ^@ 'ab' AS sw, 'abc' ^@ 'bc' AS nf,"
        " upper('ab') ^@ 'AB' AS fx, 2 ^ 3 AS p, 2 ** 3 AS p2",
    ],
)
def test_startswith_operator_b28(sql_session, duck, sql):
    _match(sql_session, duck, sql)


@pytest.mark.parametrize(
    "sql",
    [
        # week-number strftime tokens splice as expressions (no legal
        # java.time week pattern in Spark 3+): %U Sunday-based, %W
        # Monday-based, %V ISO week, %G ISO year
        "SELECT strftime(TIMESTAMP '2020-02-05 13:14:15',"
        " '%Y-%m W%W U%U V%V G%G') AS f",
        "SELECT strftime(DATE '2021-01-03', '%U|%W|%V|%G') AS su,"
        " strftime(DATE '2021-01-04', '%U|%W|%V|%G') AS mo,"
        " strftime(DATE '2024-12-31', '%U|%W|%V|%G') AS ny",
    ],
)
def test_strftime_week_tokens_b28(sql_session, duck, sql):
    _match(sql_session, duck, sql)


def test_fractional_casts_round_like_duckdb(sql_session, duck):
    """DuckDB ROUNDS numeric→integer casts where Spark truncates:
    DOUBLE/FLOAT half-to-even, DECIMAL (and numeric literals) half away
    from zero — both probed on live 1.0 and served for bare-column and
    literal operands through the catalog kinds."""
    for st in (
        "CREATE TABLE b28_n AS SELECT 2.5::DOUBLE AS d1, 3.5::DOUBLE"
        " AS d2, 1.7::DOUBLE AS d3, 2.50::DECIMAL(6,2) AS c1,"
        " -2.5::DECIMAL(6,2) AS c2",
    ):
        duck.execute(st)
        execute_statement(sql_session, st)
    for sql in (
        "SELECT CAST(d1 AS INT) AS a, CAST(d2 AS INT) AS b,"
        " CAST(d3 AS BIGINT) AS c, d1::INT AS d FROM b28_n",
        "SELECT CAST(c1 AS INT) AS a, CAST(c2 AS INT) AS b,"
        " c1::BIGINT AS c FROM b28_n",
        "SELECT CAST(1.5 AS INT) AS a, CAST(2.5 AS INT) AS b,"
        " CAST(-2.5 AS INT) AS c, 1.7::INT AS d",
    ):
        _match(sql_session, duck, sql)
    for st in ("DROP TABLE b28_n",):
        duck.execute(st)
        execute_statement(sql_session, st)
