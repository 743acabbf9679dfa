"""Dialect probe battery 19 — window-function tails: DISTINCT window
aggregates (Spark rejects them outright; the frame's distinct multiset
is array_distinct over a windowed collect_list), windowed median
(percentile 0.5 — Spark's median rejects frames), interval RANGE
frames, lag/lead breadth, nth_value. Differential against live DuckDB.
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
    register_views(spark, SF_DIR, ("orders",))
    return spark


def _match(spark, duck, sql: str):
    with serving_dialect(True):
        ours = sorted(tuple(r) for r in run_sql(spark, sql).collect())
    theirs = sorted(duck.execute(sql).fetchall())
    assert ours == theirs, f"{sql!r}: {ours[:2]} != {theirs[:2]}"


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT o_orderkey AS k, count(DISTINCT o_orderstatus)"
        " OVER (ORDER BY o_orderkey ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)"
        " AS cd FROM orders ORDER BY k LIMIT 30",
        "SELECT o_orderkey AS k, sum(DISTINCT o_custkey)"
        " OVER (ORDER BY o_orderkey ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"
        " AS sd FROM orders ORDER BY k LIMIT 30",
        "SELECT o_orderkey AS k, avg(DISTINCT o_custkey)"
        " OVER (ORDER BY o_orderkey ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"
        " AS ad FROM orders ORDER BY k LIMIT 30",
        "SELECT o_orderstatus AS st, count(DISTINCT o_custkey)"
        " OVER (PARTITION BY o_orderstatus) AS cd FROM orders"
        " ORDER BY st, cd LIMIT 9",
        # non-window DISTINCT aggregates stay Spark-native
        "SELECT count(DISTINCT o_orderstatus) AS c,"
        " sum(DISTINCT o_custkey) AS s FROM orders",
    ],
)
def test_windowed_distinct_aggs_b19(sql_session, duck, sql):
    _match(sql_session, duck, sql)


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT o_orderkey AS k, median(o_totalprice)"
        " OVER (ORDER BY o_orderkey ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"
        " AS m FROM orders ORDER BY k LIMIT 30",
        "SELECT median(o_totalprice) AS m FROM orders",  # plain: unchanged
    ],
)
def test_windowed_median_b19(sql_session, duck, sql):
    _match(sql_session, duck, sql)


@pytest.mark.parametrize(
    "sql",
    [
        # interval RANGE frames (count — float sums differ by frame
        # summation order, an ulp-class artifact on both engines)
        "SELECT o_orderkey AS k, count(*) OVER (ORDER BY o_orderdate"
        " RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND INTERVAL 7 DAY FOLLOWING)"
        " AS w FROM orders ORDER BY k LIMIT 20",
        "SELECT o_orderkey AS k, lag(o_totalprice, 2, -1.0)"
        " OVER (ORDER BY o_orderkey) AS l,"
        " lead(o_totalprice, 3) OVER (ORDER BY o_orderkey) AS ld"
        " FROM orders ORDER BY k LIMIT 20",
        "SELECT o_orderkey AS k, nth_value(o_totalprice, 3)"
        " OVER (ORDER BY o_orderkey ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)"
        " AS n3 FROM orders ORDER BY k LIMIT 20",
    ],
)
def test_window_frame_breadth_b19(sql_session, duck, sql):
    _match(sql_session, duck, sql)


def test_windowed_temporal_median_fails_closed_b19(sql_session):
    with serving_dialect(True), pytest.raises(Exception):
        run_sql(
            sql_session,
            "SELECT median(o_orderdate) OVER (ORDER BY o_orderkey"
            " ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) FROM orders LIMIT 1",
        ).collect()
