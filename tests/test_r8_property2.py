"""Hypothesis properties for the round-8 late rewrite surface
(batteries 17-21): the prefix @ operator at generic-operator
precedence, 1-based indexed lambdas, the FILTER shorthand, AT TIME
ZONE instant dispatch, and ordered sequential sums — each a generative
differential against live DuckDB, since masked-text rewrites fail by
silently corrupting neighboring SQL.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

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


def _both(spark, duck, sql: str):
    with serving_dialect(True):
        ours = sorted(tuple(r) for r in run_sql(spark, sql).collect())
    theirs = sorted(duck.execute(sql).fetchall())
    return ours, theirs


_S = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --- @ abs: generic-operator precedence over arbitrary arithmetic chains ---


@_S
@given(
    a=st.integers(min_value=-99, max_value=99),
    b=st.integers(min_value=-99, max_value=99),
    c=st.integers(min_value=1, max_value=9),
    op1=st.sampled_from(["+", "-", "*"]),
    op2=st.sampled_from(["+", "-", "*"]),
)
def test_at_abs_precedence_property(sql_session, duck, a, b, c, op1, op2):
    sql = f"SELECT @ ({a}) {op1} ({b}) {op2} {c} AS v, 1 + @ ({a}) {op1} {c} AS w"
    ours, theirs = _both(sql_session, duck, sql)
    assert ours == theirs, sql


# --- indexed lambdas: 1-based index over random lists and bodies -----------


@_S
@given(
    xs=st.lists(st.integers(min_value=-50, max_value=50), min_size=0, max_size=8),
    mul=st.integers(min_value=1, max_value=9),
)
def test_indexed_lambda_property(sql_session, duck, xs, mul):
    lit = "[" + ", ".join(map(str, xs)) + "]"
    sql = (
        f"SELECT list_transform({lit}, (x, i) -> x * {mul} + i) AS t,"
        f" list_filter({lit}, (x, i) -> i % 2 = 1) AS f"
    )
    ours, theirs = _both(sql_session, duck, sql)
    assert ours == theirs, sql


# --- FILTER shorthand ≡ FILTER (WHERE …) on random predicates --------------


@_S
@given(
    mod=st.integers(min_value=2, max_value=7),
    rem=st.integers(min_value=0, max_value=6),
)
def test_filter_shorthand_property(sql_session, duck, mod, rem):
    sql = (
        f"SELECT count(*) FILTER (o_orderkey % {mod} = {rem % mod}) AS a,"
        f" count(*) FILTER (WHERE o_orderkey % {mod} = {rem % mod}) AS b"
        " FROM orders"
    )
    ours, theirs = _both(sql_session, duck, sql)
    assert ours == theirs and ours[0][0] == ours[0][1], sql


# --- AT TIME ZONE: naive→instant round-trips through random offsets --------


@_S
@given(
    month=st.integers(min_value=1, max_value=12),
    day=st.integers(min_value=1, max_value=28),
    hour=st.integers(min_value=4, max_value=23),  # avoid fold/gap hours
    tz=st.sampled_from(
        ["America/New_York", "Asia/Tokyo", "Europe/Berlin", "UTC",
         "Australia/Sydney"]
    ),
)
def test_at_time_zone_property(sql_session, duck, month, day, hour, tz):
    ts = f"2021-{month:02d}-{day:02d} {hour:02d}:15:00"
    sql = (
        f"SELECT epoch_us(TIMESTAMP '{ts}' AT TIME ZONE '{tz}') AS a,"
        f" epoch_us(timezone('{tz}', TIMESTAMP '{ts}')) AS b"
    )
    ours, theirs = _both(sql_session, duck, sql)
    assert ours == theirs and ours[0][0] == ours[0][1], sql


# --- ordered sum: sequential fold equals DuckDB's for any key direction ----


@_S
@given(desc=st.booleans(), mod=st.integers(min_value=2, max_value=5))
def test_ordered_sum_property(sql_session, duck, desc, mod):
    d = "DESC" if desc else "ASC"
    sql = (
        f"SELECT o_orderkey % {mod} AS g,"
        f" sum(o_totalprice ORDER BY o_orderkey {d}) AS s"
        " FROM orders GROUP BY g ORDER BY g"
    )
    ours, theirs = _both(sql_session, duck, sql)
    assert ours == theirs, sql
