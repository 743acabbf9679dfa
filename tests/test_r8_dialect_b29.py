"""Dialect probe battery 29 — JSON tails + list/temporal leftovers:
json_type's DuckDB classification (incl. the UBIGINT/BIGINT/DOUBLE
numeric split and the 2-arg path form), json_contains' deep
containment (key-subset objects, element-subset arrays, anywhere in
the tree), json_array / json_object constructors serializing each
argument as its own type, 3-arg list_aggregate ('string_agg' with a
separator, 'histogram'), array_reverse_sort, and scalar temporal
range() (end-exclusive) / generate_series (inclusive) over TIMESTAMPs.
Differential against live DuckDB.
"""

from __future__ import annotations

import pytest

from duckdb_server_spark.dialect import (
    register_dialect_functions,
    run_sql,
    serving_dialect,
)


@pytest.fixture(scope="module")
def sql_session(spark):
    register_dialect_functions(spark)
    return spark


def _match(spark, duck, sql: str):
    theirs = duck.execute(sql).fetchall()
    with serving_dialect(True):
        ours = [tuple(r) for r in run_sql(spark, sql).collect()]
    a = [[str(x) for x in r] for r in ours]
    b = [[str(x) for x in r] for r in theirs]
    assert a == b, f"{sql!r}: {ours[:2]} != {theirs[:2]}"


@pytest.mark.parametrize(
    "sql",
    [
        # classification incl. numeric kinds
        """SELECT json_type('{"a":1}') AS o, json_type('[1]') AS a,"""
        """ json_type('"s"') AS v, json_type('1') AS u,"""
        """ json_type('-1') AS b, json_type('1.5') AS d,"""
        """ json_type('true') AS t, json_type('null') AS n""",
        """SELECT json_type('{"a":[1]}', '$.a') AS p""",
        # deep containment
        """SELECT json_contains('{"a":1,"b":2}', '1') AS c1,"""
        """ json_contains('[1,2,3]', '[1,3]') AS c2,"""
        """ json_contains('{"a":{"b":2}}', '{"b":2}') AS c3,"""
        """ json_contains('[1,2]', '5') AS c4""",
        # constructors keep each argument's own JSON type
        "SELECT json_array('[1,2]') AS ja, json_array(1, 'x', NULL) AS jm",
        "SELECT json_object('k', 7, 'j', 'x') AS jo",
        "SELECT json_array_length('[1,2,3]') AS l",
        # list tails
        "SELECT list_aggregate([1,2,2,3], 'string_agg', '|') AS sa,"
        " array_reverse_sort([3,1,2]) AS rs",
        # temporal scalar range / series
        "SELECT range(TIMESTAMP '2020-01-01', TIMESTAMP '2020-01-02',"
        " INTERVAL 6 HOUR) AS r",
        "SELECT generate_series(TIMESTAMP '2020-01-01',"
        " TIMESTAMP '2020-01-02', INTERVAL 12 HOUR) AS g",
    ],
)
def test_json_list_tails_b29(sql_session, duck, sql):
    _match(sql_session, duck, sql)


def test_list_histogram_b29(sql_session, duck):
    # DuckDB's python client renders MAP as {'key': [...], 'value': [...]};
    # compare the entry lists instead
    with serving_dialect(True):
        ours = run_sql(
            sql_session,
            "SELECT list_aggregate([1,2,2], 'histogram') AS h",
        ).collect()[0][0]
    theirs = duck.execute(
        "SELECT list_aggregate([1,2,2], 'histogram')"
    ).fetchone()[0]
    assert sorted(ours.items()) == sorted(
        zip(theirs["key"], theirs["value"])
    )


@pytest.mark.parametrize(
    "sql",
    [
        # date_add's INTERVAL form (collides with Spark's int-days one)
        "SELECT date_add(DATE '2020-01-31', INTERVAL 1 MONTH) AS da,"
        " date_add(DATE '2020-01-01', INTERVAL 36 HOUR) AS dh,"
        " date_add(DATE '2020-01-01', 5) AS plain",
        # UTC-pinned session: tz offsets are zero everywhere
        "SELECT timezone_hour(TIMESTAMPTZ '2020-01-01 00:00:00+00') AS h,"
        " timezone_minute(TIMESTAMP '2020-06-01 00:00:00') AS m",
        "SELECT today() = current_date AS same",
    ],
)
def test_temporal_tails_b29(sql_session, duck, sql):
    _match(sql_session, duck, sql)


def test_named_prepared_parameters_b29(sql_session, duck):
    """EXECUTE with DuckDB's named := arguments binds $name placeholders
    (positional ? and $1 forms unchanged)."""
    from duckdb_server_spark.dialect import execute_statement

    for st in ("PREPARE b29q AS SELECT $val + 1 AS v, $name AS n",):
        duck.execute(st)
        execute_statement(sql_session, st)
    sql = "EXECUTE b29q(val := 41, name := 'x')"
    theirs = duck.execute(sql).fetchall()
    ours = [tuple(r) for r in execute_statement(sql_session, sql).collect()]
    assert ours == theirs == [(42, "x")]
    for st in ("DEALLOCATE b29q",):
        duck.execute(st)
        execute_statement(sql_session, st)


@pytest.mark.parametrize(
    "sql",
    [
        # FROM-first subqueries (Spark parses only the top-level form)
        "SELECT count(*) AS n FROM (FROM documents WHERE doc_id < 10)",
        "SELECT d.lang FROM (FROM documents LIMIT 5) d ORDER BY d.lang",
        "FROM documents SELECT doc_id WHERE doc_id < 3 ORDER BY doc_id",
    ],
)
def test_from_first_b29(sql_session, duck, sql):
    from duckdb_server_spark.session import register_views

    register_views(sql_session, "/root/testdata/sf0.001", ("documents",))
    duck.execute(
        "CREATE OR REPLACE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    theirs = sorted(duck.execute(sql).fetchall(), key=repr)
    with serving_dialect(True):
        ours = sorted(
            (tuple(r) for r in run_sql(sql_session, sql).collect()),
            key=repr,
        )
    assert [[str(x) for x in r] for r in ours] == [
        [str(x) for x in r] for r in theirs
    ]


def test_schema_statements_b29(sql_session, duck):
    """CREATE SCHEMA names flatten onto the single temp-view namespace
    at relation positions; USE validates against known schemas; SET
    accepts the GLOBAL/TO spellings."""
    from duckdb_server_spark.dialect import execute_statement

    for st in (
        "SET GLOBAL threads TO 4",
        "CREATE SCHEMA b29sch",
        "CREATE TABLE b29sch.t1 (a INT, b TEXT DEFAULT 'd')",
        "INSERT INTO b29sch.t1 (a) VALUES (1), (2)",
        "UPDATE b29sch.t1 SET b = 'x' WHERE a = 1",
    ):
        duck.execute(st)
        execute_statement(sql_session, st)
    q = "SELECT * FROM b29sch.t1 ORDER BY a"
    assert [tuple(r) for r in execute_statement(sql_session, q).collect()] \
        == duck.execute(q).fetchall() == [(1, "x"), (2, "d")]
    for st in ("DROP TABLE b29sch.t1", "USE main", "DROP SCHEMA b29sch"):
        duck.execute(st)
        execute_statement(sql_session, st)
    import pytest as _pt

    with _pt.raises(Exception, match="does not exist"):
        execute_statement(sql_session, "DROP SCHEMA b29sch")
    with _pt.raises(Exception):
        execute_statement(sql_session, "USE nope_schema")
