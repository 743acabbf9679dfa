"""Dialect probe battery 14 — age()/to_* interval constructors, real
time_bucket origins, dynamic INTERVAL (expr) UNIT, named-group
regexp_extract, datepart lists, 2-arg array_length, single-entry MAP
literals, ROW()/list_apply aliases. Differential against live DuckDB.
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
    register_views(spark, SF_DIR, ("nation", "orders"))
    return spark


def _match(spark, duck, sql: str):
    with serving_dialect(True):
        ours = sorted(tuple(r) for r in run_sql(spark, sql).collect())
    theirs = sorted(duck.execute(sql).fetchall())
    assert ours == theirs, f"{sql!r}: {ours[:2]} != {theirs[:2]}"


# --- age(): component breakdown + client flattening ------------------------


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT age(DATE '2021-03-01', DATE '2020-01-15') AS a",
        "SELECT age(DATE '2020-03-31', DATE '2020-01-31') AS a",
        "SELECT age(DATE '2020-01-15', DATE '2021-03-01') AS a",  # negative
        "SELECT age(DATE '2020-05-01', DATE '2020-04-30') AS a",
        "SELECT age(DATE '2020-02-29', DATE '2019-03-01') AS a",
        "SELECT age(DATE '2019-05-02', DATE '2021-07-01') AS a",
        "SELECT age(TIMESTAMP '2020-02-01 01:00:00',"
        " TIMESTAMP '2020-01-31 23:30:00') AS a",
        "SELECT age(TIMESTAMP '2020-01-31 23:30:00',"
        " TIMESTAMP '2020-02-01 01:00:00') AS a",  # the swapped-borrow case
        "SELECT age(TIMESTAMP '2021-03-01 05:00:00',"
        " TIMESTAMP '2020-01-15 07:30:00') AS a",
        "SELECT age(TIMESTAMP '2020-03-01 00:00:01',"
        " TIMESTAMP '2020-02-29 23:59:59') AS a",
        "SELECT age(o_orderdate, DATE '1995-01-01') AS a"
        " FROM orders ORDER BY o_orderkey LIMIT 20",
    ],
)
def test_age(sql_session, duck, sql):
    _match(sql_session, duck, sql)


# --- to_* interval constructors (day-time forms collect as timedelta) ------


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT to_days(5) AS iv",
        "SELECT to_weeks(3) AS iv",
        "SELECT to_hours(30) AS iv",
        "SELECT to_minutes(90) AS iv",
        "SELECT to_seconds(3.5) AS iv",
        "SELECT to_milliseconds(1500) AS iv",
        "SELECT to_microseconds(2500000) AS iv",
        # year/month constructors are calendar-aware in composition
        "SELECT DATE '2020-01-31' + to_months(1) AS d",
        "SELECT DATE '2020-02-29' + to_years(1) AS d",
        "SELECT DATE '2020-06-15' - to_months(7) AS d",
        "SELECT o_orderdate + to_days(CAST(o_orderkey % 5 AS INT) + 3) AS d"
        " FROM orders ORDER BY o_orderkey LIMIT 20",
    ],
)
def test_to_interval_constructors(sql_session, duck, sql):
    _match(sql_session, duck, sql)


# --- time_bucket: DuckDB origins, month widths, typed outputs --------------


@pytest.mark.parametrize(
    "sql",
    [
        # 7-day buckets align to Mondays (origin 2000-01-03) — the case
        # the old epoch-floor rewrite got wrong
        "SELECT time_bucket(INTERVAL 7 DAY, DATE '2020-01-08') AS b",
        "SELECT time_bucket(INTERVAL 2 DAY, DATE '2020-01-09') AS b",
        "SELECT time_bucket(INTERVAL 2 DAY,"
        " TIMESTAMP '2020-01-09 10:00:00') AS b",
        "SELECT time_bucket(INTERVAL 15 MINUTE,"
        " TIMESTAMP '2020-01-01 10:37:00') AS b",
        "SELECT time_bucket(INTERVAL '90 seconds',"
        " TIMESTAMP '2020-01-01 00:04:10') AS b",
        "SELECT time_bucket(INTERVAL 15 MINUTE, DATE '2020-01-09') AS b",
        "SELECT time_bucket(INTERVAL 1 MONTH, DATE '2020-07-15') AS b",
        "SELECT time_bucket(INTERVAL 3 MONTH, DATE '2020-08-20') AS b",
        "SELECT time_bucket(INTERVAL 1 MONTH,"
        " TIMESTAMP '2020-07-15 03:00:00') AS b",
        "SELECT time_bucket(INTERVAL 2 DAY, DATE '2020-01-09',"
        " DATE '2020-01-01') AS b",
        "SELECT time_bucket(INTERVAL 7 DAY, o_orderdate) AS b, count(*) AS n"
        " FROM orders GROUP BY b ORDER BY b LIMIT 10",
    ],
)
def test_time_bucket(sql_session, duck, sql):
    _match(sql_session, duck, sql)


def test_time_bucket_unresolvable_fails_closed(sql_session):
    with serving_dialect(True), pytest.raises(Exception, match="time_bucket"):
        run_sql(
            sql_session,
            "SELECT time_bucket(INTERVAL 1 DAY, o_orderkey + 1) FROM orders",
        ).collect()


# --- dynamic INTERVAL (expr) unit ------------------------------------------


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT INTERVAL (2 + 3) DAY AS iv",
        "SELECT INTERVAL (90) MINUTE AS iv",
        "SELECT DATE '2020-01-31' + INTERVAL (1) MONTH AS d",
        "SELECT o_orderdate + INTERVAL (CAST(o_orderkey % 5 AS INT) + 1) DAY AS d"
        " FROM orders ORDER BY o_orderkey LIMIT 20",
    ],
)
def test_dynamic_interval(sql_session, duck, sql):
    _match(sql_session, duck, sql)


# --- struct-producing forms: project fields out ----------------------------


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT (regexp_extract('2024-01', '(\\d+)-(\\d+)', ['y','m'])).y"
        " AS y, (regexp_extract('2024-01', '(\\d+)-(\\d+)', ['y','m'])).m"
        " AS m",
        "SELECT (datepart(['year','month','day'], DATE '2020-03-09')).year"
        " AS y, (datepart(['year','month','day'], DATE '2020-03-09')).month"
        " AS m, (datepart(['year','month','day'], DATE '2020-03-09')).day"
        " AS d",
        "SELECT (datepart(['dow','isodow'], DATE '2020-03-09')).dow AS a,"
        " (datepart(['dow','isodow'], DATE '2020-03-09')).isodow AS b",
    ],
)
def test_struct_forms(sql_session, duck, sql):
    _match(sql_session, duck, sql)


# --- misc: map literals, aliases, array_length dim -------------------------


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT cardinality(MAP {'a': 1}) AS c",
        "SELECT map_keys(MAP {'a': 1}) AS k",
        "SELECT element_at(MAP {'a': 7}, 'a') AS v",
        "SELECT array_length([1,2,3], 1) AS al",
        "SELECT list_apply([1,2], x -> x + 1) AS la",
        "SELECT apply([3,4], x -> x * 2) AS ap",
        "SELECT list_filter([1,2,3,4], x -> x > 2) AS lf",
        "SELECT ROW(1, 'x') = ROW(1, 'x') AS eq",
        "SELECT mode(o_orderpriority) AS m FROM orders"
        " WHERE o_orderkey < 100",
    ],
)
def test_misc_b14(sql_session, duck, sql):
    _match(sql_session, duck, sql)
