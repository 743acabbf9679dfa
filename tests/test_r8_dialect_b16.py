"""Dialect probe battery 16 — temporal extraction functions (yearweek,
isoyear, julian, era, century/decade/millennium in the extract
convention), the epoch_ms/us/ns family, and DuckDB's LOG-BASE-10
1-arg log() (Spark's is ln — a silent wrong answer before this).
Differential against live DuckDB.
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


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT yearweek(DATE '2020-01-01') AS a,"
        " yearweek(DATE '2021-01-01') AS b",  # ISO year 2020, week 53
        "SELECT isoyear(DATE '2021-01-01') AS iy,"
        " isoyear(DATE '2020-06-01') AS iy2",
        # DuckDB's julian anchors 1970-01-01 00:00 at 2440588.0 (not
        # the astronomical 2440587.5)
        "SELECT julian(DATE '2020-01-01') AS j,"
        " julian(TIMESTAMP '2020-01-01 12:00:00') AS j2",
        "SELECT era(DATE '2020-01-01') AS e",
        "SELECT century(DATE '2001-01-01') AS c,"
        " century(DATE '2000-12-31') AS c2,"
        " decade(DATE '1994-05-01') AS d,"
        " millennium(DATE '2001-01-01') AS m,"
        " millennium(DATE '2000-06-01') AS m2",
        "SELECT epoch_ms(TIMESTAMP '2020-01-01 00:00:01') AS em,"
        " epoch_us(TIMESTAMP '2020-01-01 00:00:01') AS eu,"
        " epoch_ns(TIMESTAMP '2020-01-01 00:00:01') AS en",
        "SELECT yearweek(o_orderdate) AS yw, count(*) AS c FROM orders"
        " GROUP BY yw ORDER BY yw LIMIT 10",
        "SELECT julian(o_orderdate) AS j FROM orders"
        " ORDER BY o_orderkey LIMIT 10",
    ],
)
def test_temporal_extract_b16(sql_session, duck, sql):
    _match(sql_session, duck, sql)


@pytest.mark.parametrize(
    "sql",
    [
        # 1-arg log is base 10 in DuckDB, natural log in Spark
        "SELECT log(100) AS l1, round(log(2), 6) AS l2",
        "SELECT log(2, 8) AS a, ln(100) AS b, log10(1000) AS c,"
        " log2(8) AS d",
        "SELECT round(log(o_totalprice), 6) AS l FROM orders"
        " ORDER BY o_orderkey LIMIT 20",
    ],
)
def test_log_base10_b16(sql_session, duck, sql):
    _match(sql_session, duck, sql)
