"""Dialect probe battery 25 — CREATE TYPE … AS ENUM: validated casts
(CAST / :: / TRY_CAST), insert-time membership checks, ordinal
semantics for bare enum columns (ORDER BY, min/max, enum-enum
comparisons), enum_range / enum_first / enum_last / enum_code, and
DuckDB's own quirk that a mixed enum-vs-string comparison degrades to
VARCHAR ordering. Differential against live DuckDB.
"""

from __future__ import annotations

import pytest

from duckdb_server_spark.dialect import (
    execute_statement,
    register_dialect_functions,
)


@pytest.fixture(scope="module")
def sql_session(spark, duck):
    register_dialect_functions(spark)
    for st in (
        "CREATE TYPE b25_mood AS ENUM ('sad', 'ok', 'happy')",
        "CREATE TABLE b25_e (m b25_mood, n b25_mood)",
        "INSERT INTO b25_e VALUES ('ok','happy'),('sad','ok'),"
        "('happy','happy')",
    ):
        duck.execute(st)
        execute_statement(spark, st)
    yield spark
    for st in ("DROP TABLE b25_e", "DROP TYPE b25_mood"):
        duck.execute(st)
        execute_statement(spark, st)


def _both(spark, duck, st, ordered=False):
    drows = duck.execute(st).fetchall()
    df = execute_statement(spark, st)
    ours = [tuple(r) for r in df.collect()] if df is not None else []
    if not ordered:
        ours, drows = sorted(ours), sorted(drows)
    assert ours == drows, f"{st!r}: {ours} != {drows}"


@pytest.mark.parametrize(
    "sql,ordered",
    [
        # ordinal ORDER BY, not VARCHAR order
        ("SELECT m FROM b25_e ORDER BY m", True),
        ("SELECT m FROM b25_e ORDER BY m DESC", True),
        # enum-enum comparison is ordinal
        ("SELECT m, n, m < n AS lt, m >= n AS ge FROM b25_e"
         " ORDER BY m, n", True),
        # min/max pick by ordinal
        ("SELECT min(m) AS lo, max(m) AS hi FROM b25_e", False),
        # mixed enum-vs-string degrades to VARCHAR comparison (DuckDB's
        # own behavior: 'ok' < 'happy' is false as strings)
        ("SELECT CAST('ok' AS b25_mood) < 'happy' AS v", False),
        # introspection functions
        ("SELECT enum_range(NULL::b25_mood) AS r,"
         " enum_first(NULL::b25_mood) AS f,"
         " enum_last(NULL::b25_mood) AS l", False),
        ("SELECT enum_code(CAST('happy' AS b25_mood)) AS c,"
         " enum_code('sad'::b25_mood) AS s", False),
        ("SELECT enum_code(m) AS c FROM b25_e ORDER BY m", True),
        # valid casts and NULL pass-through
        ("SELECT CAST('ok' AS b25_mood) AS v, 'happy'::b25_mood AS w,"
         " CAST(NULL AS b25_mood) AS z", False),
        ("SELECT TRY_CAST('nope' AS b25_mood) AS bad,"
         " TRY_CAST('sad' AS b25_mood) AS good", False),
        # enum column cast back to VARCHAR is the plain string
        ("SELECT CAST(m AS VARCHAR) AS s FROM b25_e", False),
        # GROUP BY on enum columns
        ("SELECT n, count(*) AS c FROM b25_e GROUP BY n ORDER BY n", True),
    ],
)
def test_enum_differential(sql_session, duck, sql, ordered):
    _both(sql_session, duck, sql, ordered)


def test_enum_rejections_match(sql_session, duck):
    for bad in ("INSERT INTO b25_e VALUES ('bogus','ok')",
                "SELECT CAST('nope' AS b25_mood) AS x"):
        with pytest.raises(Exception, match="Could not convert string"):
            duck.execute(bad).fetchall()
        with pytest.raises(Exception, match="Could not convert string"):
            df = execute_statement(sql_session, bad)
            if df is not None:
                df.collect()


def test_drop_type_semantics(sql_session, duck):
    for st in ("CREATE TYPE b25_tmp AS ENUM ('a','b')",
               "DROP TYPE b25_tmp", "DROP TYPE IF EXISTS b25_tmp"):
        duck.execute(st)
        execute_statement(sql_session, st)
    with pytest.raises(Exception, match="does not exist"):
        duck.execute("DROP TYPE b25_tmp")
    with pytest.raises(Exception, match="does not exist"):
        execute_statement(sql_session, "DROP TYPE b25_tmp")


@pytest.mark.parametrize(
    "sql,ordered",
    [
        # EVERY sort item gets ordinal treatment, not just the first
        ("SELECT m, n FROM b25_e ORDER BY m, n", True),
        ("SELECT m, n FROM b25_e ORDER BY n DESC, m ASC", True),
        # non-enum items and trailing LIMIT survive the clause parse
        ("SELECT m FROM b25_e ORDER BY m LIMIT 2", True),
    ],
)
def test_enum_multi_item_order_by(sql_session, duck, sql, ordered):
    _both(sql_session, duck, sql, ordered)
