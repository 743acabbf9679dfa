"""Dialect probe battery 26 — the remaining DML breadth: INSERT INTO …
BY NAME (name-aligned source with DEFAULT fill), RETURNING projections
on INSERT / UPDATE / DELETE (DuckDB returns the affected rows instead
of the Count row), the join-update ``UPDATE … SET … FROM rel WHERE``
and join-delete ``DELETE … USING rel WHERE``. Differential against
live DuckDB: the SAME statements on both engines, counts + returned
rows + final contents compared.
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


def test_insert_by_name(sql_session, duck):
    for st in (
        "CREATE TABLE b26_n (a INT, b TEXT DEFAULT 'd', c INT DEFAULT 9)",
        "INSERT INTO b26_n BY NAME SELECT 'hello' AS b, 5 AS a",
        "INSERT INTO b26_n BY NAME SELECT 7 AS c",
        "INSERT INTO b26_n BY NAME SELECT 1 AS c, 2 AS a, 'z' AS b",
        "SELECT * FROM b26_n",
    ):
        _both(sql_session, duck, st)
    with pytest.raises(Exception):
        duck.execute("INSERT INTO b26_n BY NAME SELECT 1 AS zz")
    with pytest.raises(Exception, match="zz"):
        execute_statement(
            sql_session, "INSERT INTO b26_n BY NAME SELECT 1 AS zz"
        )
    for st in ("DROP TABLE b26_n",):
        duck.execute(st)
        execute_statement(sql_session, st)


def test_returning_clauses(sql_session, duck):
    for st in (
        "CREATE TABLE b26_r (a INT, b TEXT)",
        "INSERT INTO b26_r VALUES (1, 'x'), (2, 'y') RETURNING *",
        "INSERT INTO b26_r VALUES (3, 'z') RETURNING a * 10 AS big,"
        " upper(b) AS ub",
        # UPDATE returns the post-update image of matched rows
        "UPDATE b26_r SET b = b || '!' WHERE a >= 2 RETURNING a, b",
        # DELETE returns the deleted rows
        "DELETE FROM b26_r WHERE a = 1 RETURNING b",
        "SELECT * FROM b26_r",
    ):
        _both(sql_session, duck, st)
    for st in ("DROP TABLE b26_r",):
        duck.execute(st)
        execute_statement(sql_session, st)


def test_update_from_join(sql_session, duck):
    for st in (
        "CREATE TABLE b26_t (a INT, b TEXT, n INT)",
        "INSERT INTO b26_t VALUES (1,'x',0), (2,'y',0), (5,'q',0)",
        "CREATE TABLE b26_s (a INT, nb TEXT, add INT)",
        "INSERT INTO b26_s VALUES (1,'one',10), (5,'five',50)",
        # assignments may mix source columns and target arithmetic
        "UPDATE b26_t SET b = b26_s.nb, n = b26_t.n + b26_s.add"
        " FROM b26_s WHERE b26_t.a = b26_s.a",
        "SELECT * FROM b26_t",
        "UPDATE b26_t SET n = n + 1 FROM b26_s"
        " WHERE b26_t.a = b26_s.a AND b26_s.add > 20 RETURNING a, n",
        "SELECT * FROM b26_t",
    ):
        _both(sql_session, duck, st)
    # ambiguous multi-match fails closed on our side (Postgres/DuckDB
    # pick an arbitrary row; a deterministic engine shouldn't guess)
    duck.execute("INSERT INTO b26_s VALUES (1, 'dup', 99)")
    execute_statement(sql_session, "INSERT INTO b26_s VALUES (1,'dup',99)")
    with pytest.raises(Exception, match="multiple source rows"):
        execute_statement(
            sql_session,
            "UPDATE b26_t SET b = b26_s.nb FROM b26_s"
            " WHERE b26_t.a = b26_s.a",
        )
    for st in ("DROP TABLE b26_t", "DROP TABLE b26_s"):
        duck.execute(st)
        execute_statement(sql_session, st)


def test_delete_using(sql_session, duck):
    for st in (
        "CREATE TABLE b26_d (a INT, b TEXT)",
        "INSERT INTO b26_d VALUES (1,'x'), (2,'y'), (3,'z'), (5,'w')",
        "CREATE TABLE b26_k (a INT)",
        "INSERT INTO b26_k VALUES (1), (3), (9)",
        "DELETE FROM b26_d USING b26_k WHERE b26_d.a = b26_k.a",
        "SELECT * FROM b26_d",
        # USING with an extra residual predicate
        "INSERT INTO b26_d VALUES (9, 'gone'), (9, 'kept')",
        "DELETE FROM b26_d USING b26_k"
        " WHERE b26_d.a = b26_k.a AND b26_d.b = 'gone'",
        "SELECT * FROM b26_d",
    ):
        _both(sql_session, duck, st)
    for st in ("DROP TABLE b26_d", "DROP TABLE b26_k"):
        duck.execute(st)
        execute_statement(sql_session, st)


def test_dml_keywords_inside_literals_not_split(sql_session, duck):
    """RETURNING / USING / FROM / ON CONFLICT appearing inside string
    literals must not be mistaken for clause boundaries (all clause
    splitting runs on masked text)."""
    for st in (
        "CREATE TABLE b26_kw (a INT, b TEXT)",
        "INSERT INTO b26_kw VALUES (1, 'RETURNING x'),"
        " (2, 'ON CONFLICT DO NOTHING')",
        "UPDATE b26_kw SET b = ' USING y WHERE ' WHERE a = 1",
        "DELETE FROM b26_kw WHERE b = ' FROM z RETURNING q '",
        "SELECT * FROM b26_kw",
    ):
        _both(sql_session, duck, st)
    for st in ("DROP TABLE b26_kw",):
        duck.execute(st)
        execute_statement(sql_session, st)
