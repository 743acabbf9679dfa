"""Hypothesis properties for the round-10 nested-comparison rewrite —
the riskiest new dialect surface: DuckDB's left-to-right short-circuit
scan with NULL-pair UNKNOWN (battery 33) replayed under random list
contents, lengths, and NULL placements, for every comparison operator,
against live DuckDB. Random inputs are the cheapest adversary for the
scan/length/NULL interaction."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from duckdb_server_spark.dialect import (
    register_dialect_functions,
    run_sql,
    serving_dialect,
)


@pytest.fixture(scope="module")
def sql_session(spark):
    register_dialect_functions(spark)
    return spark


_S = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_elem = st.one_of(st.none(), st.integers(min_value=-3, max_value=3))
_lst = st.lists(_elem, min_size=0, max_size=4)


def _sql_list(vals) -> str:
    body = ", ".join("NULL" if v is None else str(v) for v in vals)
    return f"[{body}]"


@_S
@given(a=_lst, b=_lst, op=st.sampled_from(["=", "<>", "<", "<=", ">", ">="]))
def test_list_comparisons_match_duckdb(sql_session, duck, a, b, op):
    if not a and not b:
        a = [1]  # '[] op []' types as unknown-element lists in Spark
    sql = (
        f"SELECT CAST({_sql_list(a)} {op} {_sql_list(b)} AS VARCHAR) AS r"
    )
    theirs = duck.execute(sql).fetchone()[0]
    with serving_dialect(True):
        ours = run_sql(sql_session, sql).collect()[0].r
    assert ours == theirs, f"{sql}: engine {ours!r} != duck {theirs!r}"


@_S
@given(
    a=st.tuples(_elem, _elem),
    b=st.tuples(_elem, _elem),
    op=st.sampled_from(["=", "<>", "<", "<=", ">", ">="]),
)
def test_struct_comparisons_match_duckdb(sql_session, duck, a, b, op):
    def lit(t):
        f = "NULL" if t[0] is None else str(t[0])
        g = "NULL" if t[1] is None else str(t[1])
        return f"{{'f': {f}, 'g': {g}}}"

    sql = f"SELECT CAST({lit(a)} {op} {lit(b)} AS VARCHAR) AS r"
    theirs = duck.execute(sql).fetchone()[0]
    with serving_dialect(True):
        ours = run_sql(sql_session, sql).collect()[0].r
    assert ours == theirs, f"{sql}: engine {ours!r} != duck {theirs!r}"
