"""Dialect probe battery 21 — timezone semantics and indexed lambdas.
Headline fixes: ``AT TIME ZONE`` / ``timezone(tz, x)`` with DuckDB's
instant-vs-wall-clock dispatch (naive → to_utc_timestamp, TIMESTAMPTZ →
from_utc_timestamp under the UTC-pinned session), TIMESTAMPTZ literals
and casts, and DuckDB's 1-BASED two-parameter list lambdas
(list_transform (x, i) -> …) — Spark's index is 0-based, a silent
off-by-one on every indexed lambda before. Differential against live
DuckDB; timestamptz values compared through epoch_us (tz-aware vs
UTC-naive Python rendering differs while the instant is identical).
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
        # naive → instant (to_utc): 12:00 NY wall clock = 16:00 UTC
        "SELECT epoch_us(TIMESTAMP '2020-06-01 12:00:00'"
        " AT TIME ZONE 'America/New_York') AS a",
        # instant → wall clock (from_utc)
        "SELECT epoch_us(TIMESTAMPTZ '2020-06-01 12:00:00+00'"
        " AT TIME ZONE 'America/New_York') AS b",
        "SELECT epoch_us('2020-03-01 00:00:00'::TIMESTAMPTZ"
        " AT TIME ZONE 'Asia/Tokyo') AS c",
        # column operand takes the naive branch (the engine's parquet
        # timestamps ARE UTC wall clocks)
        "SELECT epoch_us(o_orderdate AT TIME ZONE 'Europe/Berlin') AS g"
        " FROM orders ORDER BY o_orderkey LIMIT 5",
        # function spelling, both directions
        "SELECT epoch_us(timezone('America/New_York',"
        " TIMESTAMP '2020-06-01 12:00:00')) AS c1,"
        " epoch_us(timezone('Asia/Tokyo',"
        " TIMESTAMPTZ '2020-06-01 12:00:00+00')) AS c2",
        # TIMESTAMPTZ literal with a non-UTC offset parses to the instant
        "SELECT epoch_us(TIMESTAMPTZ '2020-01-01 05:30:00+05:30') AS e,"
        " epoch_us('2020-06-01 00:00:00+02'::TIMESTAMPTZ) AS f",
        # DST transition day, unambiguous hour. (The ambiguous fold hour
        # itself — 01:30 on fall-back day — resolves to standard time in
        # DuckDB/ICU but daylight time in Spark/JDK: a documented 1-hour
        # divergence inside the one ambiguous hour per year.)
        "SELECT epoch_us(TIMESTAMP '2020-11-01 03:30:00'"
        " AT TIME ZONE 'America/New_York') AS dst",
    ],
)
def test_at_time_zone_b21(sql_session, duck, sql):
    _match(sql_session, duck, sql)


@pytest.mark.parametrize(
    "sql",
    [
        # DuckDB's (x, i) index is 1-based; Spark's is 0-based
        "SELECT list_transform([10,20,30], (x, i) -> x + i) AS li",
        "SELECT list_filter([10,20,30,40], (x, i) -> i % 2 = 0) AS lf",
        "SELECT filter([5,6,7], (x, i) -> i > 1) AS f2",
        "SELECT apply([1,2], (x, i) -> x * i) AS ap",
        # 1-param lambdas untouched
        "SELECT list_transform([1,2,3], x -> x * 2) AS one,"
        " list_filter([1,2,3], x -> x > 1) AS onef",
        # nested indexed lambdas
        "SELECT list_transform([[1,2],[3]],"
        " (l, i) -> list_transform(l, (x, j) -> x * 10 + i + j)) AS nested",
    ],
)
def test_indexed_lambdas_one_based_b21(sql_session, duck, sql):
    _match(sql_session, duck, sql)
