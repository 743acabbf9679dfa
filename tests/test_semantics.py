"""Semantic-divergence hardening (SURVEY.md §7 phase 3): the places where
Spark and DuckDB defaults disagree, pinned by tests so the engine's
configuration keeps them aligned."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_server_spark.session import load_table, register_views


@pytest.fixture(scope="module", autouse=True)
def _views(spark, sf_dir):
    register_views(spark, sf_dir)


def test_division_by_zero_divergence_documented(spark, duck):
    """KNOWN DIVERGENCE: DuckDB 1.0 yields NULL for x/0; Spark under ANSI
    raises. ANSI stays on because it buys parity on casts/overflow (which
    DuckDB does error on); declared queries must guard denominators
    (nullif(d, 0)) — and with the guard both engines agree."""
    with pytest.raises(Exception, match="(?i)divide|division"):
        spark.sql("SELECT 1 / 0 AS x").collect()
    assert duck.execute("SELECT 1 / 0 AS x").fetchall()[0][0] is None
    # The guarded form agrees on both engines:
    s = spark.sql("SELECT 1 / nullif(0, 0) AS x").collect()[0].x
    d = duck.execute("SELECT 1 / nullif(0, 0) AS x").fetchall()[0][0]
    assert s is None and d is None


def test_integer_overflow_raises(spark):
    """ANSI mode: bigint overflow raises instead of wrapping."""
    with pytest.raises(Exception, match="(?i)overflow"):
        spark.sql(
            "SELECT CAST(9223372036854775807 AS BIGINT) + CAST(1 AS BIGINT)"
        ).collect()


def test_not_in_with_nulls(spark, duck):
    """NOT IN against a set containing NULL is empty — three-valued logic
    both engines must agree on (the J6 anti-join trap)."""
    sql = (
        "SELECT count(*) AS n FROM nation "
        "WHERE n_nationkey NOT IN (SELECT NULL::INT)"
    )
    # DuckDB syntax differs (::INT); give each engine its own spelling.
    srows = spark.sql(
        "SELECT count(*) AS n FROM nation "
        "WHERE n_nationkey NOT IN (SELECT CAST(NULL AS INT))"
    ).collect()
    drows = duck.execute(sql).fetchall()
    assert srows[0].n == drows[0][0] == 0


def test_null_sort_default_divergence(spark, duck):
    """ASC default: Spark puts NULLS FIRST, DuckDB NULLS LAST — the reason
    every declared query states null ordering explicitly (O2)."""
    s = spark.sql(
        "SELECT x FROM VALUES (1), (NULL), (2) AS t(x) ORDER BY x"
    ).collect()
    d = duck.execute(
        "SELECT x FROM (VALUES (1), (NULL), (2)) AS t(x) ORDER BY x"
    ).fetchall()
    assert s[0].x is None, "Spark default is NULLS FIRST"
    assert d[-1][0] is None, "DuckDB default is NULLS LAST"


def test_cast_double_to_int_rounds_differently(spark, duck):
    """Spark CAST(double AS BIGINT) truncates; DuckDB rounds. Declared
    queries floor() first — this test documents why."""
    s = spark.sql("SELECT CAST(2.7 AS BIGINT) AS v").collect()[0].v
    d = duck.execute("SELECT CAST(2.7 AS BIGINT) AS v").fetchall()[0][0]
    assert s == 2 and d == 3


def test_timestamp_ns_truncation_parity(spark, duck, sf_dir):
    """events.ts is parquet TIMESTAMP(NANOS): Spark reads int64 ns
    (nanosAsLong) normalized to µs by load_table; DuckDB casts ns→µs the
    same way — min/max must agree exactly."""
    ev = load_table(spark, sf_dir, "events")
    srow = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    dlo, dhi = duck.execute(
        "SELECT CAST(min(ts) AS TIMESTAMP), CAST(max(ts) AS TIMESTAMP) FROM events"
    ).fetchall()[0]
    assert srow.lo == dlo and srow.hi == dhi


def test_grand_total_grouping_set_on_empty_input_diverges(spark, duck):
    """SQL standard: the () grouping set is a global aggregate — one row
    (count 0) even over zero input rows, and DuckDB does that. Spark
    lowers grouping sets to Expand + groupBy(gid, keys): empty input →
    no groups → NO grand-total row (found by the property fuzzer).
    Declared grouping-set queries run over non-empty relations, where
    both engines agree (a06_grouping_sets/a06_cube/a06_rollup)."""
    sql = (
        "SELECT count(*) AS n FROM lineitem WHERE l_linenumber < 1 "
        "GROUP BY GROUPING SETS (())"
    )
    spark.sql("SELECT 1").collect()  # session warm
    srows = spark.sql(sql).collect()
    drows = duck.execute(sql).fetchall()
    assert srows == [] and drows == [(0,)]


def test_substr_position_zero_diverges(spark, duck):
    """substr(s, 0, n): Spark clamps position 0 to the string start and
    still returns n characters; DuckDB lets the length window start at
    position 0, so only n-1 characters of the string are covered (n=1 →
    ''). Found by the string-function fuzzer; declared queries use
    1-based positions only, where both engines agree."""
    srow = spark.sql("SELECT substr('theta', 0, 1) AS a, substr('theta', 1, 1) AS b").collect()[0]
    drow = duck.execute("SELECT substr('theta', 0, 1), substr('theta', 1, 1)").fetchall()[0]
    assert (srow.a, srow.b) == ("t", "t")
    assert drow == ("", "t")
