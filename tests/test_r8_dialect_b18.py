"""Dialect probe battery 18 — aggregate-function tails. Headline fix:
DuckDB's skewness() is the SAMPLE estimator G1 = g1·√(n(n-1))/(n-2)
while Spark's is the population g1 — a silent value divergence at every
n before this battery. Also: FILTER without the WHERE keyword, ordered
sum/avg (sequential float fold), temporal/string median, DECIMAL-exact
fsum/favg (bit-equal to DuckDB's Neumaier-compensated sums), and
bitstring_agg. Differential against live DuckDB.
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
    register_views(spark, SF_DIR, ("orders", "nation"))
    return spark


def _match(spark, duck, sql: str):
    with serving_dialect(True):
        ours = sorted(tuple(r) for r in run_sql(spark, sql).collect())
    theirs = sorted(duck.execute(sql).fetchall())
    assert ours == theirs, f"{sql!r}: {ours[:2]} != {theirs[:2]}"


@pytest.mark.parametrize(
    "sql",
    [
        # single-pass estimator composition is ulp-exact at small n and
        # agrees to 10+ significant digits at n=1500 — round(…, 6)
        "SELECT round(skewness(o_totalprice), 6) AS sk,"
        " round(kurtosis(o_totalprice), 6) AS k FROM orders",
        "SELECT skewness(x) AS s2 FROM (VALUES (1.0),(2.0)) t(x)",  # NULL
        "SELECT round(skewness(x), 9) AS s3"
        " FROM (VALUES (1.0),(2.0),(4.0)) t(x)",
        "SELECT kurtosis(x) AS k3 FROM (VALUES (1.0),(2.0),(4.0)) t(x)",
        "SELECT round(kurtosis(x), 9) AS k4"
        " FROM (VALUES (1.0),(2.0),(4.0),(8.0)) t(x)",
        "SELECT o_orderstatus AS st, round(skewness(o_totalprice), 6) AS sk"
        " FROM orders GROUP BY st ORDER BY st",
    ],
)
def test_sample_skewness_kurtosis_b18(sql_session, duck, sql):
    _match(sql_session, duck, sql)


@pytest.mark.parametrize(
    "sql",
    [
        # DECIMAL(38,15) accumulation lands on the identical double as
        # DuckDB's compensated sums — exact equality, no rounding
        "SELECT fsum(o_totalprice) AS fs, favg(o_totalprice) AS fa"
        " FROM orders",
        "SELECT kahan_sum(o_totalprice) AS ks, sumkahan(o_totalprice) AS sk"
        " FROM orders",
    ],
)
def test_compensated_sums_exact_b18(sql_session, duck, sql):
    _match(sql_session, duck, sql)


@pytest.mark.parametrize(
    "sql",
    [
        # FILTER without WHERE — DuckDB shorthand
        "SELECT count(DISTINCT o_orderstatus) FILTER (o_orderkey > 100) AS c"
        " FROM orders",
        "SELECT sum(o_totalprice) FILTER (o_orderstatus = 'F') AS sf,"
        " sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O') AS so"
        " FROM orders",
        "SELECT o_orderstatus AS st,"
        " avg(o_totalprice) FILTER (o_orderkey % 2 = 0) AS a"
        " FROM orders GROUP BY st ORDER BY st",
    ],
)
def test_filter_shorthand_b18(sql_session, duck, sql):
    _match(sql_session, duck, sql)


@pytest.mark.parametrize(
    "sql",
    [
        # sequential left-to-right fold in key order — the float result
        # is order-dependent, which is the point of the form
        "SELECT sum(o_totalprice ORDER BY o_orderkey) AS s FROM orders",
        "SELECT avg(o_totalprice ORDER BY o_orderkey) AS a FROM orders",
        "SELECT o_orderstatus AS st,"
        " sum(o_totalprice ORDER BY o_orderkey) AS s"
        " FROM orders GROUP BY st ORDER BY st",
        "SELECT sum(o_totalprice ORDER BY o_orderdate DESC, o_orderkey) AS s"
        " FROM orders",
    ],
)
def test_ordered_sum_avg_b18(sql_session, duck, sql):
    _match(sql_session, duck, sql)


@pytest.mark.parametrize(
    "sql",
    [
        # temporal median interpolates (two dates → a 12:00 timestamp)
        "SELECT median(o_orderdate) AS m FROM orders",
        # string median: lower-middle of the sorted values
        "SELECT median(o_orderpriority) AS mp FROM orders",
        "SELECT median(o_totalprice) AS mn FROM orders",  # numeric native
        "SELECT o_orderstatus AS st, median(o_orderdate) AS m"
        " FROM orders GROUP BY st ORDER BY st",
    ],
)
def test_median_breadth_b18(sql_session, duck, sql):
    _match(sql_session, duck, sql)


def test_bitstring_agg_b18(sql_session, duck):
    # 3-arg form: exact parity with DuckDB
    _match(
        sql_session,
        duck,
        "SELECT bitstring_agg(n_nationkey, 0, 9) AS b FROM nation"
        " WHERE n_nationkey IN (2, 4, 7)",
    )
    # 1-arg form: GROUP min/max bounds (deterministic). DuckDB 1.0 reads
    # table-segment statistics there — bounds that ignore WHERE filters,
    # engine-internal and not reproducible — so this one is pinned, not
    # differential.
    with serving_dialect(True):
        rows = run_sql(
            sql_session,
            "SELECT bitstring_agg(n_nationkey) AS b FROM nation"
            " WHERE n_nationkey < 5",
        ).collect()
    assert rows[0].b == "11111"


@pytest.mark.parametrize(
    "sql",
    [
        # regressions around the widened _ORDERED_AGG_RE: plain sum/avg,
        # windowed sums, HOF filter() untouched by the FILTER shorthand
        "SELECT sum(o_totalprice) AS s, avg(o_totalprice) AS a FROM orders",
        "SELECT o_orderkey AS k,"
        " sum(o_totalprice) OVER (ORDER BY o_orderkey"
        " ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS w"
        " FROM orders ORDER BY k LIMIT 10",
        "SELECT filter([1, 2, 3], x -> x > 1) AS f",
    ],
)
def test_no_regressions_b18(sql_session, duck, sql):
    _match(sql_session, duck, sql)
