"""Dialect probe battery 23 — plain CREATE TABLE (column constraints)
and the upsert family: INSERT OR REPLACE / OR IGNORE and ON CONFLICT
DO NOTHING / DO UPDATE SET (with excluded. references and the optional
guard WHERE). The SAME statement script runs verbatim on both engines:
per-statement Count rows must match, final table contents must match,
and constraint violations must raise on both with DuckDB's spellings.
Reference context: clients of markdessain/duckdb-server send verbatim
DuckDB init scripts (main.go:199,229), which carry exactly this DDL.
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


def _run_both(spark, duck, script, table):
    counts_ours, counts_duck = [], []
    for st in script:
        r = duck.execute(st)
        try:
            drows = r.fetchall()
        except Exception:
            drows = None
        df = execute_statement(spark, st)
        if df is not None and df.columns == ["Count"]:
            counts_ours.append(df.collect()[0][0])
            counts_duck.append(drows[0][0])
    ours = sorted(tuple(r) for r in spark.table(table).collect())
    theirs = sorted(duck.execute(f"SELECT * FROM {table}").fetchall())
    return counts_ours, counts_duck, ours, theirs


def _reject_both(spark, duck, stmt, fragment):
    with pytest.raises(Exception) as de:
        duck.execute(stmt)
    assert fragment in str(de.value)
    with pytest.raises(Exception) as oe:
        df = execute_statement(spark, stmt)
        if df is not None:
            df.collect()
    assert fragment in str(oe.value)


def test_upsert_script_differential(sql_session, duck):
    script = [
        "CREATE TABLE b23_up (a INT PRIMARY KEY, b TEXT DEFAULT 'dflt',"
        " c INT NOT NULL DEFAULT 0, CHECK (c >= 0))",
        "INSERT INTO b23_up VALUES (1,'x',5)",
        "INSERT INTO b23_up VALUES (1,'y',6) ON CONFLICT DO NOTHING",
        "INSERT INTO b23_up VALUES (1,'z',7),(2,'n',8)"
        " ON CONFLICT (a) DO UPDATE SET b = excluded.b",
        "INSERT INTO b23_up (a) VALUES (10)",  # defaults fill b and c
        "INSERT INTO b23_up VALUES (13, DEFAULT, DEFAULT)",
        "INSERT OR REPLACE INTO b23_up VALUES (2,'r',9),(3,'w',1)",
        "INSERT OR IGNORE INTO b23_up VALUES (3,'zzz',2),(4,'new',3)",
        # assignment may use both excluded. and the target's current row
        "INSERT INTO b23_up VALUES (4,'!',7) ON CONFLICT (a)"
        " DO UPDATE SET b = b23_up.b || excluded.b, c = c + excluded.c",
    ]
    co, cd, ours, theirs = _run_both(sql_session, duck, script, "b23_up")
    assert co == cd == [1, 0, 2, 1, 1, 2, 1, 1]
    assert ours == theirs
    execute_statement(sql_session, "DROP TABLE b23_up")
    duck.execute("DROP TABLE b23_up")


def test_upsert_guard_where(sql_session, duck):
    script = [
        "CREATE TABLE b23_g (a INT PRIMARY KEY, b INT)",
        "INSERT INTO b23_g VALUES (1, 10), (2, 60)",
        # guard true for a=2 only: one update + one insert = Count 2
        "INSERT INTO b23_g VALUES (1, 99), (2, 99), (3, 99)"
        " ON CONFLICT (a) DO UPDATE SET b = excluded.b WHERE b23_g.b > 50",
    ]
    co, cd, ours, theirs = _run_both(sql_session, duck, script, "b23_g")
    assert co == cd == [2, 2]
    assert ours == theirs == [(1, 10), (2, 99), (3, 99)]
    execute_statement(sql_session, "DROP TABLE b23_g")
    duck.execute("DROP TABLE b23_g")


def test_composite_key_or_replace(sql_session, duck):
    script = [
        "CREATE TABLE b23_cp (x INT, y INT, v TEXT, PRIMARY KEY (x, y))",
        "INSERT INTO b23_cp VALUES (1,1,'a'),(1,2,'b')",
        "INSERT OR REPLACE INTO b23_cp VALUES (1,2,'B2'),(2,1,'c')",
    ]
    co, cd, ours, theirs = _run_both(sql_session, duck, script, "b23_cp")
    assert co == cd == [2, 2]
    assert ours == theirs == [(1, 1, "a"), (1, 2, "B2"), (2, 1, "c")]
    execute_statement(sql_session, "DROP TABLE b23_cp")
    duck.execute("DROP TABLE b23_cp")


def test_constraint_violations_match(sql_session, duck):
    for st in (
        "CREATE TABLE b23_c (a INT PRIMARY KEY, b TEXT,"
        " c INT NOT NULL DEFAULT 0, CHECK (c >= 0))",
        "INSERT INTO b23_c VALUES (1,'x',5)",
    ):
        duck.execute(st)
        execute_statement(sql_session, st)
    _reject_both(
        sql_session, duck,
        "INSERT INTO b23_c VALUES (9,'v',NULL)",
        "NOT NULL constraint failed: b23_c.c",
    )
    _reject_both(
        sql_session, duck,
        "INSERT INTO b23_c VALUES (8,'v',-5)",
        "CHECK constraint failed: b23_c",
    )
    _reject_both(
        sql_session, duck,
        "INSERT INTO b23_c VALUES (1,'dup',3)",
        'Duplicate key "a: 1" violates primary key constraint',
    )
    # duplicate keys inside the upsert source are a constraint error
    _reject_both(
        sql_session, duck,
        "INSERT OR REPLACE INTO b23_c VALUES (5,'p',1),(5,'q',2)",
        "duplicate key",
    )
    execute_statement(sql_session, "DROP TABLE b23_c")
    duck.execute("DROP TABLE b23_c")


def test_on_conflict_without_key_rejected(sql_session, duck):
    for st in ("CREATE TABLE b23_nk (a INT, b TEXT)",):
        duck.execute(st)
        execute_statement(sql_session, st)
    _reject_both(
        sql_session, duck,
        "INSERT OR REPLACE INTO b23_nk VALUES (1,'x')",
        "no-op",
    )
    execute_statement(sql_session, "DROP TABLE b23_nk")
    duck.execute("DROP TABLE b23_nk")


def test_unique_column_conflict_target(sql_session, duck):
    script = [
        "CREATE TABLE b23_u (a INT PRIMARY KEY, e TEXT UNIQUE, n INT)",
        "INSERT INTO b23_u VALUES (1,'x@y',0)",
        "INSERT INTO b23_u VALUES (2,'x@y',5)"
        " ON CONFLICT (e) DO UPDATE SET n = excluded.n",
    ]
    co, cd, ours, theirs = _run_both(sql_session, duck, script, "b23_u")
    assert co == cd == [1, 1]
    assert ours == theirs == [(1, "x@y", 5)]
    execute_statement(sql_session, "DROP TABLE b23_u")
    duck.execute("DROP TABLE b23_u")


def test_create_table_types_roundtrip(sql_session, duck):
    """The declared-type surface: numeric widths, decimal, text, bool,
    date/timestamp, blob, and list columns all take inserts and read
    back identically on both engines."""
    script = [
        "CREATE TABLE b23_t (i8 TINYINT, i16 SMALLINT, i32 INTEGER,"
        " i64 BIGINT, f REAL, d DOUBLE, dec DECIMAL(10,2), s VARCHAR,"
        " b BOOLEAN, dt DATE, ts TIMESTAMP, raw BLOB, l INT[])",
        "INSERT INTO b23_t VALUES (1, 2, 3, 4, 1.5, 2.5, 12.34, 'txt',"
        " true, DATE '2024-02-29', TIMESTAMP '2024-02-29 12:30:00',"
        " '\\xAA'::BLOB, [1, 2, 3])",
    ]
    co, cd, ours, theirs = _run_both(sql_session, duck, script, "b23_t")
    assert co == cd == [1]
    (o,), (t,) = ours, theirs
    assert list(o)[:11] == list(t)[:11]
    assert bytes(o[11]) == bytes(t[11]) and list(o[12]) == list(t[12])
    execute_statement(sql_session, "DROP TABLE b23_t")
    duck.execute("DROP TABLE b23_t")


def test_if_not_exists_and_or_replace(sql_session, duck):
    for st in (
        "CREATE TABLE b23_e (a INT)",
        "CREATE TABLE IF NOT EXISTS b23_e (a INT, b INT)",  # kept as-is
        "INSERT INTO b23_e VALUES (7)",
        "CREATE OR REPLACE TABLE b23_e (z TEXT)",  # replaced, empty
    ):
        duck.execute(st)
        execute_statement(sql_session, st)
    ours = spark_rows = sorted(
        tuple(r) for r in sql_session.table("b23_e").collect()
    )
    theirs = sorted(duck.execute("SELECT * FROM b23_e").fetchall())
    assert ours == theirs == []
    assert [f.name for f in sql_session.table("b23_e").schema.fields] == ["z"]
    execute_statement(sql_session, "DROP TABLE b23_e")
    duck.execute("DROP TABLE b23_e")
