"""Dialect probe battery 27 — VIRTUAL generated columns: the typed
``GENERATED ALWAYS AS (expr) VIRTUAL`` and shorthand ``y AS (expr)``
forms, positional inserts skipping them, recomputation on UPDATE (the
copy-on-write analog of DuckDB's compute-on-read), and write rejection.
Differential against live DuckDB.
"""

from __future__ import annotations

import pytest

from duckdb_server_spark.dialect import (
    execute_statement,
    register_dialect_functions,
)


@pytest.fixture(scope="module")
def sql_session(spark):
    register_dialect_functions(spark)
    return spark


def _both(spark, duck, st):
    drows = sorted(duck.execute(st).fetchall(), key=repr)
    df = execute_statement(spark, st)
    ours = (
        sorted((tuple(r) for r in df.collect()), key=repr)
        if df is not None
        else None
    )
    if ours is not None:
        assert ours == drows, f"{st!r}: {ours} != {drows}"


def test_generated_columns(sql_session, duck):
    for st in (
        "CREATE TABLE b27_g (x INT,"
        " y INT GENERATED ALWAYS AS (x + 1) VIRTUAL, z TEXT DEFAULT 'd')",
        "INSERT INTO b27_g (x) VALUES (1), (5)",
        "INSERT INTO b27_g VALUES (10, 'ten')",  # positional skips y
        "SELECT * FROM b27_g",
        # shorthand form, recompute after UPDATE
        "CREATE TABLE b27_s (x INT, y AS (x * 2))",
        "INSERT INTO b27_s (x) VALUES (3)",
        "UPDATE b27_s SET x = 7",
        "SELECT * FROM b27_s",
        # generated expr over strings
        "CREATE TABLE b27_t (name TEXT, shout AS (upper(name) || '!'))",
        "INSERT INTO b27_t (name) VALUES ('ok')",
        "SELECT * FROM b27_t",
    ):
        _both(sql_session, duck, st)
    for st in ("DROP TABLE b27_g", "DROP TABLE b27_s", "DROP TABLE b27_t"):
        duck.execute(st)
        execute_statement(sql_session, st)


def test_generated_column_writes_rejected(sql_session, duck):
    for st in ("CREATE TABLE b27_r (x INT, y AS (x + 1))",
               "INSERT INTO b27_r (x) VALUES (1)"):
        duck.execute(st)
        execute_statement(sql_session, st)
    for bad, frag in (
        ("UPDATE b27_r SET y = 9", "generated column"),
        ("INSERT INTO b27_r (x, y) VALUES (1, 2)", "generated column"),
        ("INSERT INTO b27_r BY NAME SELECT 5 AS y", "generated column"),
    ):
        with pytest.raises(Exception):
            duck.execute(bad)
        with pytest.raises(Exception, match=frag):
            execute_statement(sql_session, bad)
    for st in ("DROP TABLE b27_r",):
        duck.execute(st)
        execute_statement(sql_session, st)


def test_generated_with_upsert(sql_session, duck):
    for st in (
        "CREATE TABLE b27_u (k INT PRIMARY KEY, v INT,"
        " dbl AS (v * 2))",
        "INSERT INTO b27_u (k, v) VALUES (1, 10)",
        "INSERT INTO b27_u (k, v) VALUES (1, 50), (2, 20)"
        " ON CONFLICT (k) DO UPDATE SET v = excluded.v",
        "SELECT * FROM b27_u",
    ):
        _both(sql_session, duck, st)
    for st in ("DROP TABLE b27_u",):
        duck.execute(st)
        execute_statement(sql_session, st)
