"""Dialect probe battery 17 — path-parsing functions, the prefix ``@``
absolute-value operator (Postgres generic-operator precedence: looser
than arithmetic, tighter than comparisons), struct_insert, BIT-string
ops over '0'/'1' text, literal make_time / 1-arg make_timestamp, and
DuckDB's map-subscript LIST-of-matches shape ([] for a missing key —
the previous map_extract rewrite returned [NULL]). Differential against
live DuckDB.
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
    register_views(spark, SF_DIR, ("orders",))
    return spark


def _norm(rows):
    # structs render as Row on the Spark side, dict on DuckDB's; compare
    # through a canonical string form
    def conv(x):
        if hasattr(x, "asDict"):
            return dict(x.asDict())
        if isinstance(x, tuple):
            return list(x)
        return x

    return sorted(tuple(str(conv(c)) for c in r) for r in rows)


def _match(spark, duck, sql: str):
    with serving_dialect(True):
        ours = _norm(tuple(r) for r in run_sql(spark, sql).collect())
    theirs = _norm(duck.execute(sql).fetchall())
    assert ours == theirs, f"{sql!r}: {ours[:2]} != {theirs[:2]}"


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT parse_filename('/a/b/c.txt') AS a,"
        " parse_filename('/a/b/c.txt', true) AS b,"
        " parse_filename('c.txt') AS c, parse_filename('/a/b/', true) AS d,"
        " parse_filename('.bashrc', true) AS e,"
        " parse_filename('a.tar.gz', true) AS f",
        r"SELECT parse_filename('a\b\c.txt') AS w1,"
        r" parse_dirpath('a\b\c.txt') AS w2",
        "SELECT parse_dirpath('/a/b/c.txt') AS a, parse_dirpath('/c.txt') AS b,"
        " parse_dirpath('c.txt') AS c, parse_dirpath('/a/b/') AS d,"
        " parse_dirpath('') AS e",
        "SELECT parse_path('/a/b/c.txt') AS a, parse_path('rel/x.txt') AS b,"
        " parse_path('') AS c, parse_path('/') AS d, parse_path('a//b') AS e",
        "SELECT parse_filename('/a/b/c.txt', true, 'forward_slash') AS f,"
        " parse_filename('x.txt', 'system') AS g",
    ],
)
def test_parse_path_family_b17(sql_session, duck, sql):
    _match(sql_session, duck, sql)


@pytest.mark.parametrize(
    "sql",
    [
        # @ binds looser than arithmetic: @ -2 - 3 is abs(-5) = 5
        "SELECT @(-3.5) AS a, @ 4 AS b, @(-7) + 1 AS c, @ -2 - 3 AS d,"
        " 1 + @ -5 AS e, @ @ -3 AS f",
        # ... and tighter than comparisons
        "SELECT @ -2 = 2 AS a, @(-7) > 5 AS b",
        "SELECT @ o_totalprice AS t FROM orders ORDER BY o_orderkey LIMIT 5",
    ],
)
def test_at_abs_operator_b17(sql_session, duck, sql):
    _match(sql_session, duck, sql)


@pytest.mark.parametrize(
    "sql",
    [
        # DuckDB map[key] yields the LIST of matches: [] when missing,
        # [NULL] for a present NULL value, [] for a NULL key
        "SELECT MAP {'a':1}['a'] AS hit, MAP {'a':1}['b'] AS miss,"
        " (MAP {'a':NULL})['a'] AS nv, (MAP {'a':1})[NULL] AS nk",
        "SELECT (MAP {'a':1})['a'][1] AS unwrapped",
        "SELECT map_extract(MAP {'a':1}, 'b') AS missing,"
        " map_extract(MAP {'a':1}, 'a') AS hit",
        "SELECT element_at(MAP {'a':1}, 'b') AS e",
    ],
)
def test_map_subscript_list_shape_b17(sql_session, duck, sql):
    _match(sql_session, duck, sql)


def test_map_column_subscript_through_kinds_b17(sql_session, duck):
    # a MAP-typed catalog column dispatches the subscript through
    # _column_kinds, not just literal detection
    sql_session.createDataFrame(
        [({"x": 7},)], "m map<string,int>"
    ).createOrReplaceTempView("mt_b17")
    with serving_dialect(True):
        rows = run_sql(
            sql_session, "SELECT m['x'] AS v, m['y'] AS miss FROM mt_b17"
        ).collect()
    assert rows[0].v == [7] and rows[0].miss == []


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT struct_insert(s, b := 2, c := 'x') AS r"
        " FROM (SELECT {'a': 1} AS s)",
    ],
)
def test_struct_insert_b17(sql_session, duck, sql):
    _match(sql_session, duck, sql)


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT bitstring('0101', 8) AS b",
        "SELECT get_bit(BIT '0101', 1) AS g, get_bit(BIT '0101', 0) AS g0",
        "SELECT set_bit(BIT '0101', 1, 0) AS s, set_bit(BIT '0101', 3, 0) AS t",
        "SELECT bit_position(BIT '01', BIT '110101') AS p,"
        " bit_position(BIT '11', BIT '0101') AS np",
        "SELECT '010'::BIT AS c",
    ],
)
def test_bit_strings_b17(sql_session, duck, sql):
    _match(sql_session, duck, sql)


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT make_time(1, 2, 3.5) AS t",
        "SELECT make_timestamp(1700000000000000) AS ts",
        "SELECT make_timestamp(2020, 1, 2, 3, 4, 5.5) AS ts6",
    ],
)
def test_make_time_timestamp_b17(sql_session, duck, sql):
    _match(sql_session, duck, sql)


def test_make_time_on_columns_live_since_r14(sql_session):
    # round 8 pinned this fail-closed (Spark's TIME type was gated
    # off: non-literal make_time could not be represented); round 14
    # enables spark.sql.timeType.enabled, so column arguments now
    # evaluate for real instead of raising
    sql_session.conf.set("spark.sql.timeType.enabled", "true")
    with serving_dialect(True):
        rows = run_sql(
            sql_session,
            "SELECT o_orderkey, "
            "make_time(CAST(o_orderkey AS INT) % 24, 0, 0) AS t"
            " FROM orders ORDER BY o_orderkey LIMIT 3",
        ).collect()
    import datetime

    for r in rows:
        assert r.t == datetime.time(r.o_orderkey % 24, 0, 0)
