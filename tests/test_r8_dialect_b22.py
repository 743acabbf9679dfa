"""Dialect probe battery 22 — two silent wrong answers and a rename
tail: DuckDB's ``concat()`` stringifies every argument and SKIPS NULLs
(Spark's returns NULL when any argument is NULL — every nullable concat
was wrong before), 1-arg ``string_agg``/``group_concat`` default to a
',' separator (Spark's listagg default is ''), plus regexp_matches
flags, list_value/array_value/list_reverse/array_cat/ucase/lcase
renames. Differential against live DuckDB.
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
    register_views(spark, SF_DIR, ("nation",))
    return spark


def _match(spark, duck, sql: str):
    with serving_dialect(True):
        ours = sorted(tuple(r) for r in run_sql(spark, sql).collect())
    theirs = sorted(duck.execute(sql).fetchall())
    assert ours == theirs, f"{sql!r}: {ours[:2]} != {theirs[:2]}"


@pytest.mark.parametrize(
    "sql",
    [
        # NULL-skipping, everything-stringifying concat
        "SELECT concat(1, 2.5, 'x', NULL) AS m, concat([1], [2,3]) AS c,"
        " concat(DATE '2020-01-01', ' ', 'x') AS d",
        "SELECT concat(n_name, NULL, '!') AS n FROM nation"
        " ORDER BY n_nationkey LIMIT 5",
        "SELECT concat(NULL, NULL) AS allnull, concat('only') AS one",
        # || keeps standard NULL propagation; concat_ws untouched
        "SELECT 'a' || NULL AS n, 'a' || 'b' AS ab, [1] || [2] AS lc",
        "SELECT concat_ws('-', 'a', NULL, 'b') AS cw",
    ],
)
def test_concat_null_skip_b22(sql_session, duck, sql):
    _match(sql_session, duck, sql)


@pytest.mark.parametrize(
    "sql",
    [
        # 1-arg default separator is ',' — and NULL elements are skipped
        "SELECT string_agg(x) AS s FROM (VALUES ('a'),(NULL),('b')) t(x)",
        "SELECT group_concat(n_name) AS g"
        " FROM (SELECT * FROM nation ORDER BY n_nationkey LIMIT 3)",
        "SELECT string_agg(n_name, '|') AS s2"
        " FROM (SELECT * FROM nation ORDER BY n_nationkey LIMIT 3)",
        "SELECT string_agg(n_name ORDER BY n_name) AS s3"
        " FROM (SELECT * FROM nation ORDER BY n_nationkey LIMIT 3)",
    ],
)
def test_string_agg_default_separator_b22(sql_session, duck, sql):
    _match(sql_session, duck, sql)


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT regexp_matches('abc', 'B', 'i') AS rm,"
        " regexp_matches('abc', 'B', 'c') AS rc,"
        " regexp_matches('abc', 'b') AS r2",
        "SELECT list_value(1, 2, 3) AS lv, list_value() AS empty",
        "SELECT array_reverse([1,2,3]) AS ar, list_reverse([1,2,3]) AS lr,"
        " array_cat([1], [2,3]) AS ac",
        "SELECT ucase('aB') AS u, lcase('Ab') AS l",
    ],
)
def test_rename_tail_b22(sql_session, duck, sql):
    _match(sql_session, duck, sql)
