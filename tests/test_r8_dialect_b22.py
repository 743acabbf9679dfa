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


def test_using_sample_forms_b22(sql_session, duck):
    """DuckDB sampling clauses serve (engine-RNG membership — rows-only
    by nature, the o08b precedent): exact ROWS counts, percent forms in
    a sane band, stable REPEATABLE seeds, and Spark-native TABLESAMPLE
    untouched."""
    from duckdb_server_spark.session import register_views

    register_views(sql_session, SF_DIR, ("orders",))
    total = sql_session.table("orders").count()

    def n(sql):
        with serving_dialect(True):
            return run_sql(sql_session, sql).collect()[0][0]

    assert n("SELECT count(*) FROM orders USING SAMPLE 50 ROWS") == 50
    assert n("SELECT count(*) FROM orders USING SAMPLE 25") == 25
    pct = n("SELECT count(*) FROM orders USING SAMPLE 10%")
    assert 0 < pct < total // 2
    assert (
        0
        < n("SELECT count(*) FROM orders TABLESAMPLE bernoulli(10%)")
        < total // 2
    )
    a = n(
        "SELECT sum(o_orderkey) FROM orders"
        " USING SAMPLE reservoir(10%) REPEATABLE (7)"
    )
    b = n(
        "SELECT sum(o_orderkey) FROM orders"
        " USING SAMPLE reservoir(10%) REPEATABLE (7)"
    )
    assert a == b
    # the DuckDB side accepts the same statements (membership differs)
    duck.execute(
        "CREATE VIEW IF NOT EXISTS orders AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/orders.parquet')"
    )
    assert (
        duck.execute(
            "SELECT count(*) FROM orders USING SAMPLE 50 ROWS"
        ).fetchall()[0][0]
        == 50
    )
