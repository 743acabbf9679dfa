"""Admin-statement surface: BEGIN/COMMIT/ROLLBACK with REAL rollback
(an undo log over the copy-on-write view swaps — prior DataFrames pin
their analyzed plans, so restore is exact), ALTER TABLE column ops
(differential against DuckDB: same script both engines), CREATE/DROP
INDEX + VACUUM/ANALYZE/COMMENT ON as recorded no-ops, and EXPORT /
IMPORT DATABASE whose load.sql round-trips through BOTH this engine and
verbatim DuckDB.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from duckdb_server_spark.dialect import (
    dialect_state,
    execute_statement,
    register_dialect_functions,
)


@pytest.fixture(scope="module")
def sql_session(spark):
    register_dialect_functions(spark)
    return spark


def test_transaction_rollback_restores_everything(sql_session):
    ex = lambda s: execute_statement(sql_session, s)
    ex("CREATE TABLE txr_t AS SELECT 1 AS a, 'x' AS b")
    ex("BEGIN TRANSACTION")
    ex("INSERT INTO txr_t VALUES (2, 'y')")
    ex("UPDATE txr_t SET b = 'z' WHERE a = 1")
    ex("CREATE TABLE txr_new AS SELECT 9 AS n")
    ex("DELETE FROM txr_t WHERE a = 2")
    assert sorted(tuple(r) for r in sql_session.table("txr_t").collect()) == [
        (1, "z")
    ]
    ex("ROLLBACK")
    # pre-transaction state exactly restored; created relation dropped
    assert sorted(tuple(r) for r in sql_session.table("txr_t").collect()) == [
        (1, "x")
    ]
    assert not sql_session.catalog.tableExists("txr_new")
    ex("DROP TABLE txr_t")


def test_transaction_commit_keeps_and_errors_match_duckdb(sql_session, duck):
    ex = lambda s: execute_statement(sql_session, s)
    ex("CREATE TABLE txc_t AS SELECT 1 AS a")
    ex("BEGIN")
    ex("DELETE FROM txc_t")
    ex("COMMIT")
    assert sql_session.table("txc_t").count() == 0
    # COMMIT/ROLLBACK without a transaction error on both engines
    for st in ("COMMIT", "ROLLBACK"):
        with pytest.raises(Exception):
            duck.execute(st)
        with pytest.raises(ValueError, match="no transaction"):
            ex(st)
    # nested BEGIN errors on both engines
    duck.execute("BEGIN")
    with pytest.raises(Exception):
        duck.execute("BEGIN")
    duck.execute("ROLLBACK")
    ex("BEGIN")
    with pytest.raises(ValueError, match="within a transaction"):
        ex("BEGIN")
    ex("ROLLBACK")
    ex("DROP TABLE txc_t")


def test_alter_table_differential(sql_session, duck):
    script = [
        "CREATE TABLE alt_d AS SELECT r.range AS a, 'v' || r.range AS b"
        " FROM range(4) r",
        "ALTER TABLE alt_d ADD COLUMN c DOUBLE DEFAULT 2.5",
        "ALTER TABLE alt_d RENAME COLUMN a TO a2",
        "ALTER TABLE alt_d DROP COLUMN b",
        "ALTER TABLE alt_d ALTER COLUMN c TYPE VARCHAR",
    ]
    for st in script:
        duck.execute(st)
        execute_statement(sql_session, st)
    ours = sorted(tuple(r) for r in sql_session.table("alt_d").collect())
    theirs = sorted(duck.execute("SELECT * FROM alt_d").fetchall())
    assert ours == theirs
    assert sql_session.table("alt_d").columns == ["a2", "c"]
    execute_statement(sql_session, "ALTER TABLE alt_d RENAME TO alt_d2")
    assert sql_session.catalog.tableExists("alt_d2")
    assert not sql_session.catalog.tableExists("alt_d")
    execute_statement(sql_session, "DROP TABLE alt_d2")
    duck.execute("DROP TABLE alt_d")


def test_alter_unknown_targets_fail_closed(sql_session):
    ex = lambda s: execute_statement(sql_session, s)
    with pytest.raises(ValueError, match="does not exist"):
        ex("ALTER TABLE nope_t ADD COLUMN x INT")
    ex("ALTER TABLE IF EXISTS nope_t ADD COLUMN x INT")  # silent, like DuckDB
    ex("CREATE TABLE alt_e AS SELECT 1 AS a")
    with pytest.raises(ValueError, match="unknown column"):
        ex("ALTER TABLE alt_e DROP COLUMN zz")
    with pytest.raises(ValueError, match="unsupported ALTER"):
        ex("ALTER TABLE alt_e SET LOGGED")
    ex("DROP TABLE alt_e")


def test_index_comment_vacuum_no_ops(sql_session):
    ex = lambda s: execute_statement(sql_session, s)
    ex("CREATE TABLE idx_t AS SELECT 1 AS a")
    ex("CREATE INDEX idx_a ON idx_t (a)")
    st = dialect_state(sql_session)
    assert st.indexes["idx_a"] == "idx_t"
    ex("DROP INDEX idx_a")
    assert "idx_a" not in st.indexes
    ex("VACUUM")
    ex("ANALYZE")
    ex("COMMENT ON TABLE idx_t IS 'a table'")
    assert st.comments["table:idx_t"] == "a table"
    ex("DROP TABLE idx_t")


def test_export_import_database_cross_engine(sql_session, duck):
    ex = lambda s: execute_statement(sql_session, s)
    d = tempfile.mkdtemp(prefix="dss_exp_test_")
    try:
        ex("CREATE TABLE exp_t AS SELECT r.range AS i, 'v' || r.range AS s"
           " FROM range(5) r")
        ex(f"EXPORT DATABASE '{d}'")
        assert os.path.exists(os.path.join(d, "load.sql"))
        before = sorted(tuple(r) for r in sql_session.table("exp_t").collect())
        ex("DROP TABLE exp_t")
        ex(f"IMPORT DATABASE '{d}'")
        after = sorted(tuple(r) for r in sql_session.table("exp_t").collect())
        assert before == after
        # the SAME load.sql runs verbatim in DuckDB — on a FRESH
        # connection: the shared fixture registers corpus views whose
        # names collide with a full-session export (other tests' temp
        # views are legitimately part of the dump)
        import duckdb as _duckdb

        fresh = _duckdb.connect()
        fresh.execute(open(os.path.join(d, "load.sql")).read())
        theirs = sorted(fresh.execute("SELECT * FROM exp_t").fetchall())
        fresh.close()
        assert theirs == before
        ex("DROP TABLE exp_t")
    finally:
        shutil.rmtree(d, ignore_errors=True)
