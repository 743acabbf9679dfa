"""DML statements (UPDATE / DELETE / TRUNCATE, plus INSERT's Count
result) — differential against live DuckDB: the SAME statement script
runs on both engines, per-statement Count rows must match, and the final
table contents must be identical. Copy-on-write semantics over the
temp-view warehouse (the same model Delta/Iceberg use over immutable
parquet), init-phase only like INSERT.
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


def test_dml_script_differential(sql_session, duck):
    script = [
        "CREATE TABLE dml_a AS SELECT r.range AS i, 'v' || r.range AS s"
        " FROM range(10) r",
        "DELETE FROM dml_a WHERE i > 7",
        "UPDATE dml_a SET s = 'hi-' || i, i = i + 100 WHERE i % 2 = 0",
        "UPDATE dml_a SET i = i - 1",  # unconditional update
        "INSERT INTO dml_a VALUES (999, 'tail')",
        "DELETE FROM dml_a WHERE s = 'no-such-row'",  # Count 0
    ]
    co, cd, ours, theirs = _run_both(sql_session, duck, script, "dml_a")
    assert co == cd == [2, 4, 8, 1, 0]
    assert ours == theirs
    execute_statement(sql_session, "DROP TABLE dml_a")


def test_dml_null_predicate_keeps_rows(sql_session, duck):
    # a NULL WHERE result neither deletes nor updates, like DuckDB
    script = [
        "CREATE TABLE dml_n AS SELECT 1 AS i, CAST(NULL AS INT) AS x"
        " UNION ALL SELECT 2, 5",
        "DELETE FROM dml_n WHERE x > 3",  # NULL for row 1 -> kept
        "UPDATE dml_n SET i = -1 WHERE x < 999",  # NULL -> untouched
    ]
    co, cd, ours, theirs = _run_both(sql_session, duck, script, "dml_n")
    assert co == cd == [1, 0]  # NULL predicate: no delete, no update
    assert ours == theirs == [(1, None)]
    execute_statement(sql_session, "DROP TABLE dml_n")


def test_truncate_and_insert_count(sql_session, duck):
    script = [
        "CREATE TABLE dml_tr AS SELECT r.range AS i FROM range(6) r",
        "INSERT INTO dml_tr SELECT i + 10 FROM dml_tr",
    ]
    co, cd, ours, theirs = _run_both(sql_session, duck, script, "dml_tr")
    assert co == cd == [6]
    assert ours == theirs and len(ours) == 12
    # TRUNCATE (DuckDB 1.0 spells it DELETE FROM without WHERE)
    df = execute_statement(sql_session, "TRUNCATE dml_tr")
    assert df.collect()[0][0] == 12
    assert sql_session.table("dml_tr").count() == 0
    execute_statement(sql_session, "DROP TABLE dml_tr")


def test_update_unknown_column_fails_closed(sql_session):
    execute_statement(
        sql_session, "CREATE TABLE dml_u AS SELECT 1 AS a"
    )
    with pytest.raises(ValueError, match="unknown column"):
        execute_statement(sql_session, "UPDATE dml_u SET nope = 2")
    execute_statement(sql_session, "DROP TABLE dml_u")
