"""Dialect probe battery 30 (VERDICT r8 item 6) — PREPARE/EXECUTE with
positional binds, COLUMNS(* EXCLUDE)/lambda forms, TIME-type arithmetic
edges (DATE + TIME composition, TIMESTAMP::TIME, epoch-of-TIME), struct
``.*`` expansion, nested MATERIALIZED hints, struct_insert on struct
literals, the parse_path filename family, bin/to_binary on strings
(Spark's native to_binary would silently hex-DECODE — a wrong-answer
class), formatReadableDecimalSize, and RFC-3986 url_encode/url_decode
(DuckDB ≥1.1 semantics: space is %20, + is literal — probed against the
container's DuckDB 1.0 where possible, value-pinned where the function
postdates it). Differential against live DuckDB.

Known deviation kept (documented): list_zip stays numeric-only
(ARRAY<DOUBLE> pairs for the ``p[1] * p[2]`` subscript pattern used
throughout the embedding oracles); heterogeneous zips fail closed with
a cast error rather than returning DuckDB's unnamed-struct pairs.
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
    with serving_dialect(True):
        execute_statement(
            spark,
            "CREATE OR REPLACE TEMP VIEW b30t AS "
            "SELECT r.range AS i, 'v' || r.range AS s FROM range(5) r",
        )
    return spark


@pytest.fixture(scope="module")
def duck30(duck):
    duck.execute(
        "CREATE OR REPLACE VIEW b30t AS "
        "SELECT range AS i, 'v' || range AS s FROM range(5)"
    )
    return duck


def _match(spark, duck, sql: str):
    theirs = duck.execute(sql).fetchall()
    with serving_dialect(True):
        ours = [tuple(r) for r in run_sql(spark, sql).collect()]
    a = sorted([str(x) for x in r] for r in ours)
    b = sorted([str(x) for x in r] for r in theirs)
    assert a == b, f"{sql!r}: {ours[:2]} != {theirs[:2]}"


# --- PREPARE / EXECUTE / DEALLOCATE ----------------------------------------


def test_prepare_positional_dollar(sql_session, duck30):
    script = [
        "PREPARE b30q1 AS SELECT i, s FROM b30t WHERE i > $1",
        "PREPARE b30q2 AS SELECT $1 + $2 AS tot",
        "PREPARE b30q3 AS SELECT i FROM b30t WHERE s = ?",
    ]
    for st in script:
        duck30.execute(st)
        execute_statement(sql_session, st)
    for ex in (
        "EXECUTE b30q1(2)",
        "EXECUTE b30q2(3, 4)",
        "EXECUTE b30q3('v3')",
    ):
        theirs = duck30.execute(ex).fetchall()
        with serving_dialect(True):
            ours = [
                tuple(r)
                for r in execute_statement(sql_session, ex).collect()
            ]
        assert sorted(map(repr, ours)) == sorted(map(repr, theirs)), ex
    for st in ("DEALLOCATE b30q1", "DEALLOCATE b30q2", "DEALLOCATE b30q3"):
        duck30.execute(st)
        execute_statement(sql_session, st)


# --- COLUMNS forms ----------------------------------------------------------


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT COLUMNS(c -> c LIKE 'i%') FROM b30t ORDER BY i LIMIT 2",
        "SELECT min(COLUMNS(* EXCLUDE (s))) AS m FROM b30t",
        "SELECT COLUMNS(* EXCLUDE (s)) + 1 FROM b30t ORDER BY i LIMIT 2",
        "SELECT COLUMNS('s|i') FROM b30t ORDER BY i LIMIT 2",
        "SELECT max(COLUMNS(*)) FROM b30t",
    ],
)
def test_columns_forms(sql_session, duck30, sql):
    _match(sql_session, duck30, sql)


# --- TIME arithmetic edges --------------------------------------------------


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT CAST(DATE '2024-03-01' + TIME '05:06:07' AS VARCHAR) AS ts",
        "SELECT CAST(TIME '05:06:07' + DATE '2024-03-01' AS VARCHAR) AS ts",
        "SELECT CAST(DATE '2024-02-29' + TIME '23:59:59.999999' AS VARCHAR)"
        " AS ts",
        "SELECT CAST(TIME '11:30:00' + INTERVAL 45 MINUTE AS VARCHAR) AS t1",
        "SELECT CAST(TIME '23:30:00' + INTERVAL 2 HOUR AS VARCHAR) AS t2",
        "SELECT CAST(TIME '00:30:00' - INTERVAL 2 HOUR AS VARCHAR) AS t3",
        "SELECT CAST(TIMESTAMP '2024-03-01 11:22:33.25'::TIME AS VARCHAR)"
        " AS tt",
        "SELECT CAST(CAST(TIMESTAMP '2024-03-01 11:22:33' AS TIME)"
        " AS VARCHAR) AS tc",
        "SELECT extract(epoch FROM TIME '01:02:03.5') AS ep",
        "SELECT epoch(TIME '12:00:00') AS e2",
        "SELECT CAST(make_time(12, 34, 56.5) AS VARCHAR) AS mt",
    ],
)
def test_time_arithmetic(sql_session, duck30, sql):
    _match(sql_session, duck30, sql)


# --- struct .* expansion, struct_insert, nested MATERIALIZED ---------------


def test_struct_star_expansion(sql_session, duck30):
    _match(
        sql_session,
        duck30,
        "SELECT * FROM (SELECT st.* FROM "
        "(SELECT {'a': i, 'b': s} AS st FROM b30t) x) y "
        "ORDER BY a LIMIT 3",
    )


def test_struct_insert_literal_base(sql_session, duck30):
    # values compare positionally (dict vs Row repr differ; fields align)
    sql = (
        "SELECT struct_insert({'a': 1}, b := 2).a AS fa, "
        "struct_insert({'a': 1, 'c': 'x'}, d := 9).d AS fd, "
        "struct_insert({'a': 1}, b := 2, c := 'y').c AS fc"
    )
    _match(sql_session, duck30, sql)


def test_nested_materialized_hints(sql_session, duck30):
    _match(
        sql_session,
        duck30,
        "WITH c1 AS MATERIALIZED (SELECT i FROM b30t), "
        "c2 AS NOT MATERIALIZED (SELECT i + 1 AS j FROM c1) "
        "SELECT sum(j) AS sj FROM c2",
    )


# --- parse_path family ------------------------------------------------------


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT parse_dirname('/a/b/c.txt') AS a, parse_dirname('a/b/c') "
        "AS b, parse_dirname('file.txt') AS c, parse_dirname('/a//b/c') AS d",
        "SELECT parse_dirpath('/a/b/c.txt') AS a, parse_dirpath('rel/x.y')"
        " AS b, parse_dirpath('file.txt') AS c, parse_dirpath('/') AS d,"
        " parse_dirpath('/a') AS e",
        "SELECT parse_filename('/a/b/c.txt') AS a, parse_filename('a/') AS"
        " b, parse_filename('/a/b/c.txt', true) AS c,"
        " parse_filename('/a/b/archive.tar.gz', true) AS d,"
        " parse_filename('a\\b\\f.txt') AS e",
        "SELECT parse_path('/a/b/c.txt') AS a, parse_path('file.txt') AS b,"
        " parse_path('/') AS c, parse_path('a\\b/c') AS d",
    ],
)
def test_parse_path_family(sql_session, duck30, sql):
    _match(sql_session, duck30, sql)


# --- bin / to_binary / formatReadableDecimalSize ---------------------------


@pytest.mark.parametrize(
    "sql",
    [
        # string inputs: 8 bits per UTF-8 byte (multibyte included);
        # Spark's NATIVE to_binary would hex-decode 'ab' to 0xAB here
        "SELECT to_binary('ab') AS tb, bin('ab') AS bb, bin('é') AS be",
        "SELECT bin(5) AS b5, to_binary(5) AS t5, bin(255) AS b255",
        "SELECT formatReadableDecimalSize(999) AS a,"
        " formatReadableDecimalSize(1500) AS b,"
        " formatReadableDecimalSize(1000000) AS c,"
        " formatReadableDecimalSize(1234567890) AS d",
        "SELECT formatReadableSize(1048576) AS a, format_bytes(1536) AS b",
    ],
)
def test_binary_and_size_rendering(sql_session, duck30, sql):
    _match(sql_session, duck30, sql)


# --- url_encode / url_decode (DuckDB ≥1.1 semantics, value-pinned) ---------


def test_url_coding_rfc3986(sql_session):
    # container DuckDB is 1.0 (functions absent) — pin DuckDB 1.1's
    # documented RFC-3986 behavior: space -> %20, '+' stays literal
    with serving_dialect(True):
        row = run_sql(
            sql_session,
            "SELECT url_encode('a b&c+d') AS e, "
            "url_decode('a%20b%26c+d') AS d",
        ).collect()[0]
    assert row[0] == "a%20b%26c%2Bd"
    assert row[1] == "a b&c+d"
