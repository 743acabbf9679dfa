"""Dialect probe battery 24 — sequences: CREATE/DROP SEQUENCE with
START / INCREMENT / MINVALUE / MAXVALUE / CYCLE, nextval() per-row
evaluation, currval()'s after-the-row's-nextvals value, direction-
dependent defaults, and the bounds error spellings. Differential
against live DuckDB with the SAME statements on both engines.

nextval substitutes to arithmetic over one row_number() window — the
honest cost of a global counter on any engine (DuckDB serializes it
behind a latch); it is an init-phase ID-generation tool, not a 100 TB
scan construct (ddl.py module docstring).
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


def _both(spark, duck, st, ordered=False):
    drows = duck.execute(st).fetchall()
    df = execute_statement(spark, st)
    ours = [tuple(r) for r in df.collect()] if df is not None else []
    if not ordered:
        ours, drows = sorted(ours), sorted(drows)
    assert ours == drows or drows == [], f"{st!r}: {ours} != {drows}"
    return ours


def test_sequence_basics(sql_session, duck):
    for st in ("CREATE SEQUENCE b24_s START 5 INCREMENT 2",):
        duck.execute(st)
        execute_statement(sql_session, st)
    # two nextvals in one row; currval sees the row's last nextval
    _both(sql_session, duck,
          "SELECT nextval('b24_s') AS v, nextval('b24_s') AS w,"
          " currval('b24_s') AS c")
    # per-row increment over a scan
    _both(sql_session, duck, "SELECT nextval('b24_s') AS v FROM range(3)")
    # standalone currval = last value handed out
    _both(sql_session, duck, "SELECT currval('b24_s') AS c")
    for st in ("DROP SEQUENCE b24_s",):
        duck.execute(st)
        execute_statement(sql_session, st)


def test_sequence_in_insert_values(sql_session, duck):
    script = [
        "CREATE SEQUENCE b24_ids",
        "CREATE TABLE b24_t (id BIGINT, t TEXT)",
        "INSERT INTO b24_t VALUES (nextval('b24_ids'), 'a'),"
        " (nextval('b24_ids'), 'b')",
        "INSERT INTO b24_t SELECT nextval('b24_ids'), 'r' || range"
        " FROM range(3)",
    ]
    for st in script:
        duck.execute(st)
        execute_statement(sql_session, st)
    _both(sql_session, duck, "SELECT * FROM b24_t ORDER BY id",
          ordered=True)
    for st in ("DROP TABLE b24_t", "DROP SEQUENCE b24_ids"):
        duck.execute(st)
        execute_statement(sql_session, st)


def test_sequence_direction_defaults(sql_session, duck):
    # descending: starts at MAXVALUE; ascending with MINVALUE starts there
    for st in ("CREATE SEQUENCE b24_d START 10 INCREMENT -3 MAXVALUE 10",
               "CREATE SEQUENCE b24_m MINVALUE 7"):
        duck.execute(st)
        execute_statement(sql_session, st)
    _both(sql_session, duck, "SELECT nextval('b24_d') AS v FROM range(3)")
    _both(sql_session, duck, "SELECT nextval('b24_m') AS v")
    for st in ("DROP SEQUENCE b24_d", "DROP SEQUENCE b24_m"):
        duck.execute(st)
        execute_statement(sql_session, st)


def test_sequence_cycle(sql_session, duck):
    for st in ("CREATE SEQUENCE b24_c MINVALUE 1 MAXVALUE 3 CYCLE",):
        duck.execute(st)
        execute_statement(sql_session, st)
    _both(sql_session, duck, "SELECT nextval('b24_c') AS v FROM range(7)")
    for st in ("DROP SEQUENCE b24_c",):
        duck.execute(st)
        execute_statement(sql_session, st)


def test_sequence_errors_match(sql_session, duck):
    with pytest.raises(Exception, match=r"START value \(0\) cannot"):
        duck.execute("CREATE SEQUENCE b24_bad START 0")
    with pytest.raises(Exception, match=r"START value \(0\) cannot"):
        execute_statement(sql_session, "CREATE SEQUENCE b24_bad START 0")
    for st in ("CREATE SEQUENCE b24_ovf START 1 MAXVALUE 2",
               "CREATE SEQUENCE b24_fresh"):
        duck.execute(st)
        execute_statement(sql_session, st)
    _both(sql_session, duck, "SELECT nextval('b24_ovf') AS v FROM range(2)")
    with pytest.raises(Exception, match="reached maximum value"):
        duck.execute("SELECT nextval('b24_ovf')").fetchall()
    with pytest.raises(Exception, match="reached maximum value"):
        execute_statement(
            sql_session, "SELECT nextval('b24_ovf')"
        ).collect()
    with pytest.raises(Exception, match="not yet defined in this session"):
        duck.execute("SELECT currval('b24_fresh')").fetchall()
    with pytest.raises(Exception, match="not yet defined in this session"):
        execute_statement(
            sql_session, "SELECT currval('b24_fresh')"
        ).collect()
    with pytest.raises(Exception, match="does not exist"):
        duck.execute("SELECT nextval('b24_nope')").fetchall()
    with pytest.raises(Exception, match="does not exist"):
        execute_statement(
            sql_session, "SELECT nextval('b24_nope')"
        ).collect()
    for st in ("DROP SEQUENCE b24_ovf", "DROP SEQUENCE b24_fresh"):
        duck.execute(st)
        execute_statement(sql_session, st)


def test_drop_sequence_semantics(sql_session, duck):
    for st in ("CREATE SEQUENCE b24_dr", "DROP SEQUENCE b24_dr",
               "DROP SEQUENCE IF EXISTS b24_dr"):
        duck.execute(st)
        execute_statement(sql_session, st)
    with pytest.raises(Exception, match="does not exist"):
        duck.execute("DROP SEQUENCE b24_dr")
    with pytest.raises(Exception, match="does not exist"):
        execute_statement(sql_session, "DROP SEQUENCE b24_dr")
    # IF NOT EXISTS keeps the original counter
    for st in ("CREATE SEQUENCE b24_k START 100",
               "CREATE SEQUENCE IF NOT EXISTS b24_k START 999"):
        duck.execute(st)
        execute_statement(sql_session, st)
    _both(sql_session, duck, "SELECT nextval('b24_k') AS v")
    for st in ("DROP SEQUENCE b24_k",):
        duck.execute(st)
        execute_statement(sql_session, st)
