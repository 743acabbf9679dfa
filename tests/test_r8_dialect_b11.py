"""Dialect probe battery 11 — JSON arrow operators, typeof spellings,
width-aware bit_count, list argument orders, and the misc-function tail.
Differential against live DuckDB.
"""

from __future__ import annotations

import pytest

from duckdb_server_spark.dialect import (
    register_dialect_functions,
    run_sql,
    serving_dialect,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sql_session(spark):
    from duckdb_server_spark.session import register_views

    register_dialect_functions(spark)
    register_views(spark, SF_DIR, ("nation", "orders"))
    return spark


def _match(spark, duck, sql: str):
    with serving_dialect(True):
        ours = sorted(tuple(r) for r in run_sql(spark, sql).collect())
    theirs = sorted(duck.execute(sql).fetchall())
    assert ours == theirs, f"{sql!r}: {ours[:2]} != {theirs[:2]}"


# --- JSON arrow operators --------------------------------------------------


@pytest.mark.parametrize(
    "sql",
    [
        # '->' keeps JSON text (strings stay quoted); '->>' unquotes
        """SELECT '{"a": "str"}' -> 'a' AS v1, '{"a": "str"}' ->> 'a' AS v2""",
        """SELECT '{"a": 1}'::VARCHAR->'a' AS v""",
        """SELECT '{"a": 1, "b": 2}' -> '$.b' AS v""",
        """SELECT '{"a": {"b": 7}}' ->> '$.a.b' AS v""",
        """SELECT '[10,20,30]' -> 1 AS v""",
        """SELECT ('{"k": ' || '5}') ->> 'k' AS v""",
        # bare-key function forms
        """SELECT json_extract('{"a": "s"}', 'a') AS v""",
        """SELECT json_extract_string('{"a": "s"}', '$.a') AS v""",
    ],
)
def test_json_arrows(sql_session, duck, sql):
    _match(sql_session, duck, sql)


def test_json_arrow_leaves_lambdas_alone(sql_session, duck):
    _match(sql_session, duck, "SELECT list_transform([1,2], x -> 'lit') AS l")
    _match(sql_session, duck, "SELECT list_transform([1,2], x -> x + 1) AS l")
    _match(
        sql_session,
        duck,
        "SELECT list_filter([1,2,3], y -> y > 1) AS l",
    )


# --- typeof spellings ------------------------------------------------------


def test_typeof_duckdb_spellings(sql_session, duck):
    _match(
        sql_session,
        duck,
        "SELECT typeof(1) AS a, typeof(1.5) AS b, typeof('x') AS c, "
        "typeof(true) AS d",
    )
    _match(
        sql_session,
        duck,
        "SELECT typeof([1,2]) AS a, typeof(DATE '2024-01-01') AS b",
    )


# --- bit_count within the value's type width ------------------------------


def test_bit_count_type_width(sql_session, duck):
    _match(
        sql_session,
        duck,
        "SELECT bit_count(CAST(-1 AS TINYINT)) AS a, "
        "bit_count(CAST(-1 AS SMALLINT)) AS b, "
        "bit_count(-1) AS c, bit_count(5) AS d",
    )


# --- list argument orders --------------------------------------------------


def test_list_prepend_push_orders(sql_session, duck):
    _match(
        sql_session,
        duck,
        "SELECT list_prepend(0, [1,2]) AS p, list_append([1,2], 3) AS a",
    )
    _match(
        sql_session,
        duck,
        "SELECT array_push_back([1], 2) AS b, array_push_front([2], 1) AS f",
    )


# --- misc function tail ----------------------------------------------------


def test_misc_function_tail(sql_session, duck):
    _match(sql_session, duck, "SELECT version() LIKE 'v%' AS v")
    _match(sql_session, duck, "SELECT gen_random_uuid() IS NOT NULL AS u")
    _match(sql_session, duck, "SELECT txid_current() >= 0 AS t")
    _match(sql_session, duck, "SELECT gcd(12, 18) AS g, lcm(4, 6) AS l")
    _match(
        sql_session,
        duck,
        "SELECT least_common_multiple(21, 6) AS l, "
        "greatest_common_divisor(48, 36) AS g",
    )
    _match(sql_session, duck, "SELECT gcd(0, 5) AS g, lcm(0, 5) AS l")


# --- battery 12 additions: PIVOT IN, chr codepoints, bar, * REPLACE order --


def test_pivot_explicit_in_list(sql_session, duck):
    for sql in (
        "PIVOT orders ON o_orderstatus IN ('O', 'F') USING sum(o_totalprice)",
        "PIVOT orders ON o_orderstatus IN ('O', 'F') USING count(*) "
        "GROUP BY o_orderpriority",
    ):
        _match(sql_session, duck, sql)


def test_chr_unicode_codepoints(sql_session, duck):
    # Spark's chr is mod-256 Latin-1; DuckDB takes a full code point
    _match(
        sql_session,
        duck,
        "SELECT chr(8364) AS c, chr(65) AS a, chr(128169) AS p",
    )


@pytest.mark.parametrize(
    "call",
    [
        "bar(3, 0, 10, 10)",
        "bar(3.33, 0, 10, 10)",
        "bar(0, 0, 10, 10)",
        "bar(10, 0, 10, 10)",
        "bar(7.29, 0, 10, 8)",
        "bar(5, 0, 10)",  # default width 80
        "bar(0.62, 0, 10, 10)",
    ],
)
def test_bar_chart_function(sql_session, duck, call):
    # truncated eighth-block partials + DuckDB's byte-width padding
    _match(sql_session, duck, f"SELECT {call} AS b")


def test_star_replace_keeps_column_positions(sql_session, duck):
    sql = (
        "SELECT * REPLACE (n_nationkey * 10 AS n_nationkey) FROM nation "
        "ORDER BY n_nationkey LIMIT 2"
    )
    with serving_dialect(True):
        df = run_sql(sql_session, sql)
    dcols = [d[0] for d in duck.execute(sql).description]
    assert df.columns == dcols  # replaced column stays at its position
    _match(sql_session, duck, sql)


# --- battery 13: json_structure/json_quote, struct unnest ------------------


@pytest.mark.parametrize(
    "sql",
    [
        """SELECT json_structure('{"a": [1,2], "b": "x"}') AS s""",
        """SELECT json_structure('[1.5, 2]') AS s""",
        """SELECT json_structure('[-1, 2]') AS s""",
        """SELECT json_structure('{"n": null}') AS s""",
        """SELECT json_structure('[{"a":1},{"a":2.5}]') AS s""",
        """SELECT json_quote('he"llo') AS q""",
        """SELECT json_quote(5) AS q""",
        """SELECT unnest({'a': 1, 'b': 'x'})""",
    ],
)
def test_json_structure_quote_struct_unnest(sql_session, duck, sql):
    _match(sql_session, duck, sql)
