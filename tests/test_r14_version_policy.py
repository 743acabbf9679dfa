"""Round-14 version-policy sweep (VERDICT r13 item 8): the DuckDB
1.1-1.4 release notes were scanned for SEMANTIC changes to functions
this engine already implements. Two deltas exist, both recorded in
the dialect.py policy block:

* 1.2 flipped ``ieee_floating_point`` on by default (DOUBLE x/0.0 →
  ±inf/nan in the reference's 1.4.1; the 1.0 oracle yields NULL) —
  recorded in round 13.
* 1.2 made ``map[key]`` return the VALUE directly (breaking-change
  note) where 1.0 returns the LIST of matches — recorded this round.

Policy: the engine tracks its VERIFIABLE oracle (1.0); each pin below
documents the 1.0 behavior the engine serves and names the one-line
switch point for a future 1.2+ oracle.
"""

from __future__ import annotations

import pytest

from duckdb_server_spark.dialect import (
    register_dialect_functions,
    run_sql,
    serving_dialect,
)


@pytest.fixture(scope="module")
def sqlv(spark):
    register_dialect_functions(spark)
    return spark


def _one(spark, sql):
    with serving_dialect(True):
        return run_sql(spark, sql).collect()[0][0]


def test_map_subscript_returns_match_list_like_1_0(sqlv, duck):
    # 1.0 oracle: map[key] → LIST of matches; 1.2+ returns the value.
    # Engine follows the oracle (switch point: the _is_map_base branch
    # of exprs._rewrite_subscripts).
    d = duck.execute("SELECT MAP {'a': 1}['a']").fetchone()[0]
    assert d == [1]  # the container's oracle IS 1.0
    assert _one(sqlv, "SELECT MAP {'a': 1}['a'] AS v") == [1]
    assert _one(sqlv, "SELECT MAP {'a': 1}['z'] AS v") == []


def test_double_division_by_zero_null_like_1_0(sqlv, duck):
    # 1.2+ default ieee_floating_point makes x/0.0 → inf; 1.0 → NULL
    assert duck.execute("SELECT 1.5 / 0.0").fetchone()[0] is None
    assert _one(sqlv, "SELECT 1.5 / 0.0 AS v") is None
    assert _one(sqlv, "SELECT CAST(1 AS DOUBLE) / 0 AS v") is None


def test_python_lambda_syntax_accepted_forward(sqlv, duck):
    # 1.3+ syntax accepted; value semantics verified via the arrow
    # equivalent on the 1.0 oracle
    assert _one(
        sqlv, "SELECT list_transform([1, 2], lambda x: x * 10) AS v"
    ) == [10, 20]
    assert duck.execute(
        "SELECT list_transform([1, 2], x -> x * 10)"
    ).fetchone()[0] == [10, 20]
