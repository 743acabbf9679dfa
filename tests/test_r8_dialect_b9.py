"""Dialect probe battery 9 — aggregate/date/slice breadth. Differential
against live DuckDB. The headline fix: DuckDB's ``date_diff`` counts
unit BOUNDARY CROSSINGS (Jan-31→Feb-01 = 1 month), while Spark's
date_diff/timestampdiff count complete units elapsed — before this
battery the rewrite silently disagreed by one near any boundary.
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


# --- date_diff: boundary-crossing semantics -------------------------------

_DD_CASES = [
    ("month", "DATE '2023-01-15'", "DATE '2024-03-10'"),
    ("month", "DATE '2023-01-31'", "DATE '2023-02-01'"),  # the killer case
    ("year", "DATE '2023-12-31'", "DATE '2024-01-01'"),
    ("quarter", "DATE '2023-02-15'", "DATE '2023-10-02'"),
    ("week", "DATE '2024-01-06'", "DATE '2024-01-08'"),
    ("week", "DATE '2024-01-07'", "DATE '2024-01-08'"),
    ("day", "TIMESTAMP '2024-01-01 23:59:00'", "TIMESTAMP '2024-01-02 00:01:00'"),
    ("hour", "TIMESTAMP '2024-01-01 10:59:00'", "TIMESTAMP '2024-01-01 11:01:00'"),
    ("minute", "TIMESTAMP '2024-01-01 10:00:59'", "TIMESTAMP '2024-01-01 10:01:01'"),
    ("second", "TIMESTAMP '2024-01-01 10:00:00.9'", "TIMESTAMP '2024-01-01 10:00:01.1'"),
    ("month", "DATE '2024-03-10'", "DATE '2023-01-15'"),  # negative direction
    ("hour", "TIMESTAMP '2024-01-01 11:01:00'", "TIMESTAMP '2024-01-01 10:59:00'"),
    ("millisecond", "TIMESTAMP '2024-01-01 10:00:00.0009'",
     "TIMESTAMP '2024-01-01 10:00:00.0011'"),
    ("microsecond", "TIMESTAMP '2024-01-01 10:00:00'",
     "TIMESTAMP '2024-01-01 10:00:00.000005'"),
    ("decade", "DATE '1999-12-31'", "DATE '2000-01-01'"),
    ("century", "DATE '1999-12-31'", "DATE '2001-01-01'"),
    ("weeks", "DATE '2024-01-01'", "DATE '2024-03-18'"),  # plural unit
]


@pytest.mark.parametrize("unit,a,b", _DD_CASES)
def test_date_diff_counts_boundaries(sql_session, duck, unit, a, b):
    _match(sql_session, duck, f"SELECT date_diff('{unit}', {a}, {b}) AS d")


def test_date_diff_on_column_and_alias(sql_session, duck):
    _match(
        sql_session,
        duck,
        "SELECT o_orderkey, date_diff('month', DATE '1995-01-15', o_orderdate) AS d "
        "FROM orders ORDER BY o_orderkey LIMIT 5",
    )
    _match(
        sql_session,
        duck,
        "SELECT datediff('month', DATE '2023-01-31', DATE '2023-02-01') AS d",
    )


def test_date_sub_stays_elapsed_units(sql_session, duck):
    # DuckDB's date_sub IS the complete-units variant — must not change
    _match(
        sql_session,
        duck,
        "SELECT date_sub('month', DATE '2023-01-31', DATE '2023-02-01') AS d",
    )


# --- aggregates Spark lacks ------------------------------------------------


def test_entropy_aggregate(sql_session, duck):
    _match(
        sql_session,
        duck,
        "SELECT round(entropy(o_orderpriority), 6) AS e FROM orders",
    )
    _match(
        sql_session,
        duck,
        "SELECT o_orderstatus, round(entropy(o_orderpriority), 6) AS e "
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
    )


def test_product_aggregate(sql_session, duck):
    _match(
        sql_session,
        duck,
        "SELECT product(x) AS p FROM (VALUES (2.0), (3.0), (4.0)) t(x)",
    )


# --- try_strptime / list_distinct -----------------------------------------


def test_try_strptime(sql_session, duck):
    _match(sql_session, duck, "SELECT try_strptime('2024-02-30', '%Y-%m-%d') AS t")
    _match(sql_session, duck, "SELECT try_strptime('2024-02-29', '%Y-%m-%d') AS t")


def test_list_distinct_drops_nulls(sql_session, duck):
    # DuckDB's element order is internal hash order — compare sorted
    _match(
        sql_session,
        duck,
        "SELECT list_sort(list_distinct([1,2,2,NULL,3])) AS d",
    )
    _match(
        sql_session,
        duck,
        "SELECT list_sort(list_distinct(['b','a','b',NULL])) AS d",
    )


# --- stepped slices --------------------------------------------------------


@pytest.mark.parametrize(
    "expr",
    [
        "([1,2,3,4,5])[1:5:2]",
        "([1,2,3,4,5])[2:5:2]",
        "([1,2,3,4,5])[:5:2]",
        "([1,2,3,4,5])[1:4:3]",
        "([10,20,30])[1:10:2]",  # end clamped to size
        "list_slice([1,2,3,4,5], 2, 4, 2)",
        "list_slice([1,2,3,4,5], 1, -1, 2)",  # -1 = last element
        "list_slice([1,2,3,4,5], 4, 2, 1)",  # empty window
    ],
)
def test_stepped_slices(sql_session, duck, expr):
    _match(sql_session, duck, f"SELECT {expr} AS s")


def test_plain_slices_unchanged(sql_session, duck):
    _match(sql_session, duck, "SELECT ([1,2,3])[1:2] AS s")
    _match(sql_session, duck, "SELECT list_slice([1,2,3,4], 2, 3) AS s")
    _match(sql_session, duck, "SELECT 'abcdef'[2:4] AS s")
