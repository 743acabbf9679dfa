"""Round-14 ADVICE pins.

1. (medium) macros._rewrite_int_div: nested ``//`` inside a
   parenthesized divisor must be rewritten too — ``a // (b // c)``
   previously left the inner ``//`` raw, a Spark parse error.
2. (low) breadth._rewrite_collate IN branch: ``x COLLATE c IN
   (SELECT …)`` previously wrapped the whole subquery in the collation
   key (parse error). Probed on live DuckDB 1.0: the collation does
   NOT propagate into an IN-subquery — compares are bytewise — so the
   lowering strips the annotation; a column-aliased derived table
   defuses Spark's typed-literal parse of ``IN (SELECT 'a')``.
3. (low) mp3_decode_census docstring: mode-1 frames decode through
   the joint float path since round 13 — the ``fail-closed:
   joint-stereo`` status is unreachable and must not be documented.
"""

from __future__ import annotations

import duckdb
import pytest

from duckdb_server_spark.dialect import rewrite


def _both(spark, sql: str):
    dd = sorted(map(tuple, duckdb.sql(sql).fetchall()), key=repr)
    sp = sorted(map(tuple, spark.sql(rewrite(sql)).collect()), key=repr)
    assert sp == dd, f"{sql!r}: spark={sp} duckdb={dd}"
    return sp


class TestNestedIntDiv:
    def test_nested_in_parenthesized_divisor(self, spark):
        _both(spark, "SELECT 100 // (7 // 2) AS r")

    def test_doubly_nested(self, spark):
        _both(spark, "SELECT 1000 // (100 // (7 // 2)) AS r")

    def test_nested_left_operand(self, spark):
        _both(spark, "SELECT (100 // 7) // 2 AS r")

    def test_chained(self, spark):
        _both(spark, "SELECT 1000 // 7 // 2 AS r")

    def test_nested_zero_divisor_null(self, spark):
        # inner // by zero → NULL divisor → NULL result (DuckDB), not
        # an ANSI error (Spark without the nullif)
        _both(spark, "SELECT 100 // (7 // 9) AS r")

    def test_rewrite_text(self):
        out = rewrite("SELECT a // (b // c) FROM t")
        assert "//" not in out
        assert out.count("DIV") == 2


class TestCollateInSubquery:
    def test_nocase_in_subquery_is_bytewise(self, spark):
        # probed DuckDB 1.0: collation ignored in IN-subquery
        _both(spark, "SELECT 'A' COLLATE NOCASE IN (SELECT 'a') AS r")
        _both(spark, "SELECT 'a' COLLATE NOCASE IN (SELECT 'a') AS r")

    def test_not_in_subquery(self, spark):
        _both(spark,
              "SELECT 'a' COLLATE NOCASE NOT IN "
              "(SELECT col FROM (VALUES ('a'),(NULL)) v(col)) AS r")

    def test_predicate_position(self, spark):
        _both(spark,
              "SELECT x FROM (VALUES ('a'),('B')) t(x) "
              "WHERE x COLLATE NOCASE IN (SELECT 'B')")

    def test_scalar_list_still_keyed(self, spark):
        # the scalar IN-list branch keeps collation-keyed compares
        _both(spark, "SELECT 'a' COLLATE NOCASE IN ('A', NULL) AS r")
        _both(spark, "SELECT 'c' COLLATE NOCASE IN ('A', NULL) AS r")

    def test_rewrite_shape(self):
        out = rewrite("SELECT 'A' COLLATE NOCASE IN (SELECT 'a') AS r")
        assert "COLLATE" not in out
        assert "lower(SELECT" not in out  # the old broken wrap


class TestCensusDocstring:
    def test_joint_stereo_status_not_documented(self):
        from duckdb_server_spark.operators.mp3_l3 import mp3_decode_census

        doc = mp3_decode_census.__doc__
        assert '``"fail-closed:joint-stereo"`` —' not in doc
        assert "decode_l3_joint_float" in doc

    def test_mode1_frames_count_as_decoded(self):
        # the documented statuses stay reachable: a joint-stereo
        # fixture censuses as decoded, not fail-closed
        from duckdb_server_spark.operators.mp3_l3 import (
            mp3_decode_census,
            write_l3_stereo_fixture,
        )

        quads = [(1, 0, 1, 0, 0), (0, 1, 0, 1, 0)]
        blob = write_l3_stereo_fixture(
            [[quads, quads], [quads, quads]], mode=1, mode_extension=2)
        out = mp3_decode_census(blob)
        assert out["status"] == "decoded"
