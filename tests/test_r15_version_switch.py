"""Round-15 version-semantics switch (VERDICT r14 item 6): the two
documented 1.2+ semantic deltas — ieee_floating_point division and
map[key] direct-value extraction — flip behind
``SET duckdb_version_semantics='1.2'`` (any version ≥ 1.2). The
default stays the verifiable 1.0 oracle (pinned live in
tests/test_r14_version_policy.py and below); the 1.2+ position is
pinned against the DOCUMENTED public behavior (DuckDB 1.2 release
notes — no 1.2+ oracle exists in this container), so a future
1.4-oracle container validates the reference's exact semantics with a
single SET in the init script and no code change."""

from __future__ import annotations

import math

import pytest

from duckdb_server_spark.dialect import (
    register_dialect_functions,
    run_script,
    run_sql,
    serving_dialect,
)


@pytest.fixture()
def vspark(spark):
    register_dialect_functions(spark)
    yield spark
    # always restore the default policy for other tests (run_script —
    # SET routes through the statement layer, not run_sql)
    with serving_dialect(True):
        run_script(spark, "SET duckdb_version_semantics = '1.0'")


def _one(spark, script: str):
    with serving_dialect(True):
        return run_script(spark, script)[-1].collect()[0]


class TestDefault10Position:
    def test_division_by_zero_null(self, vspark):
        row = _one(vspark,
                   "SELECT 1.5 / 0 AS a, -2 / 0.0 AS b, 0.0 / 0 AS c")
        assert row == (None, None, None)

    def test_map_key_list_shape(self, vspark):
        row = _one(vspark,
                   "SELECT MAP([1, 2], ['a', 'b'])[2] AS hit, "
                   "MAP([1, 2], ['a', 'b'])[9] AS miss")
        assert row["hit"] == ["b"] and row["miss"] == []

    def test_explicit_10_same_as_default(self, vspark):
        row = _one(vspark,
                   "SET duckdb_version_semantics = '1.0'; "
                   "SELECT 7 / 0 AS a, MAP([1], [5])[1] AS m")
        assert row["a"] is None and row["m"] == [5]


class TestModern12Position:
    def test_division_by_zero_ieee(self, vspark):
        row = _one(vspark,
                   "SET duckdb_version_semantics = '1.4'; "
                   "SELECT 1.5 / 0 AS pinf, -2 / 0.0 AS ninf, "
                   "0.0 / 0 AS nan_, CAST(NULL AS DOUBLE) / 0 AS n")
        assert row["pinf"] == math.inf
        assert row["ninf"] == -math.inf
        assert math.isnan(row["nan_"])
        assert row["n"] is None

    def test_negative_zero_divisor_sign(self, vspark):
        # the LITERAL -0.0 is DECIMAL in both engines (no signed
        # zero → +0 divisor → +inf); a true signed-zero DOUBLE keeps
        # its sign through the power(r, -1) arm
        row = _one(vspark,
                   "SET duckdb_version_semantics = '1.2'; "
                   "SELECT 1 / (-0.0) AS a, "
                   "1 / CAST('-0.0' AS DOUBLE) AS b, "
                   "-1 / CAST('-0.0' AS DOUBLE) AS c")
        assert row["a"] == math.inf
        assert row["b"] == -math.inf
        assert row["c"] == math.inf

    def test_nonzero_division_unchanged(self, vspark):
        row = _one(vspark,
                   "SET duckdb_version_semantics = '1.4'; "
                   "SELECT 7 / 2 AS a, -7 / 2 AS b")
        assert row == (3.5, -3.5)

    def test_map_key_direct_value(self, vspark):
        row = _one(vspark,
                   "SET duckdb_version_semantics = '1.4'; "
                   "SELECT MAP([1, 2], ['a', 'b'])[2] AS hit, "
                   "MAP([1, 2], ['a', 'b'])[9] AS miss")
        assert row["hit"] == "b" and row["miss"] is None

    def test_switch_back_restores_oracle_shape(self, vspark):
        row = _one(vspark,
                   "SET duckdb_version_semantics = '1.4'; "
                   "SET duckdb_version_semantics = '1.0'; "
                   "SELECT 1 / 0 AS a, MAP([1], [5])[1] AS m")
        assert row["a"] is None and row["m"] == [5]

    def test_bad_version_value_rejected(self, vspark):
        with pytest.raises(Exception, match="duckdb_version_semantics"):
            _one(vspark,
                 "SET duckdb_version_semantics = 'banana'; "
                 "SELECT 1 / 0 AS a")
