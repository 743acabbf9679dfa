"""Dialect probe battery 32 — the surviving gaps from a 60-statement
join/aggregate/string sweep (everything else already matched):

* bare dynamic ``PIVOT t ON col USING count(*)`` left NULL where
  DuckDB fills count cells with 0 — a silent wrong answer;
* ``sem()`` — DuckDB's standard error of the mean uses the POPULATION
  stddev over sqrt(n) (ratio-probed at n=1500);
* ``kurtosis_pop()`` — population excess kurtosis, i.e. Spark's
  native kurtosis, guarded from the sample-correction arm.
"""

from __future__ import annotations

import pytest

from duckdb_server_spark.dialect import (
    register_dialect_functions,
    run_sql,
    serving_dialect,
)


@pytest.fixture(scope="module")
def sql32(spark, sf_dir):
    from duckdb_server_spark.session import register_views

    register_dialect_functions(spark)
    register_views(spark, sf_dir, ("nation", "orders"))
    return spark


def _match(spark, duck, sql: str):
    theirs = duck.execute(sql).fetchall()
    with serving_dialect(True):
        ours = [tuple(r) for r in run_sql(spark, sql).collect()]
    a = sorted([str(x) for x in r] for r in ours)
    b = sorted([str(x) for x in r] for r in theirs)
    assert a == b, f"{sql!r}: {ours[:2]} != {theirs[:2]}"


def test_pivot_count_zero_fill(sql32, duck):
    _match(sql32, duck, "PIVOT nation ON n_regionkey USING count(*)")


def test_pivot_count_zero_fill_grouped(sql32, duck):
    _match(
        sql32,
        duck,
        "PIVOT orders ON o_orderstatus USING count(*) GROUP BY"
        " o_orderpriority",
    )


def test_pivot_sum_keeps_null(sql32, duck):
    # sum() pivots keep NULL for empty cells in both engines
    _match(
        sql32,
        duck,
        "PIVOT orders ON o_orderstatus USING sum(o_totalprice) GROUP BY"
        " o_orderpriority",
    )


def test_sem_population_stddev(sql32, duck):
    _match(sql32, duck,
           "SELECT round(sem(o_totalprice), 9) AS s FROM orders")


def test_kurtosis_pop_vs_sample(sql32, duck):
    _match(
        sql32,
        duck,
        "SELECT round(kurtosis_pop(o_totalprice), 9) AS kp,"
        " round(kurtosis(o_totalprice), 9) AS ks FROM orders",
    )


def test_sem_grouped(sql32, duck):
    _match(
        sql32,
        duck,
        "SELECT o_orderstatus, round(sem(o_totalprice), 9) AS s"
        " FROM orders GROUP BY o_orderstatus",
    )
