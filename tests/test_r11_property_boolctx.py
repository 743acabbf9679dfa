"""Generative differentials for the round-11 rewrites (the battery-36
property-fuzz cadence): random NULL-bearing list comparisons in BOTH
semantic contexts (boolean position = distinct total order, value
position = three-valued scan), and random mixed-interval chains through
every lowered consumer — each trial runs the SAME statement on the
engine and live DuckDB 1.0."""

from __future__ import annotations

import random

import pytest

from duckdb_server_spark.dialect import (
    execute_statement,
    register_dialect_functions,
    run_sql,
    serving_dialect,
)


@pytest.fixture(scope="module")
def sqlfz(spark, duck):
    register_dialect_functions(spark)
    rng = random.Random(3711)
    rows = []
    for i in range(25):
        items = [
            "NULL" if rng.random() < 0.35 else str(rng.randrange(4))
            for _ in range(rng.randrange(0, 5))
        ]
        lst = "[" + ", ".join(items) + "]" if items else "CAST([] AS BIGINT[])"
        rows.append(f"SELECT {i} AS i, {lst}::BIGINT[] AS a")
    st = "CREATE TABLE fz37 AS " + " UNION ALL ".join(rows)
    duck.execute(st)
    execute_statement(spark, st)
    return spark


def _match(spark, duck, sql: str):
    theirs = duck.execute(sql).fetchall()
    with serving_dialect(True):
        ours = [tuple(r) for r in run_sql(spark, sql).collect()]
    a = sorted([str(x) for x in r] for r in ours)
    b = sorted([str(x) for x in r] for r in theirs)
    assert a == b, f"{sql!r}: {ours[:4]} != {theirs[:4]}"


def _rand_list(rng):
    items = [
        "NULL" if rng.random() < 0.35 else str(rng.randrange(4))
        for _ in range(rng.randrange(0, 5))
    ]
    return ("[" + ", ".join(items) + "]") if items else (
        "CAST([] AS BIGINT[])"
    )


OPS = ("=", "<>", "<", "<=", ">", ">=")


def test_fuzz_boolean_vs_value_context(sqlfz, duck):
    rng = random.Random(9117)
    for trial in range(12):
        lit = _rand_list(rng)
        op = rng.choice(OPS)
        # boolean position: WHERE
        _match(
            sqlfz, duck,
            f"SELECT i FROM fz37 WHERE a {op} {lit}::BIGINT[]",
        )
        # boolean position: CASE WHEN
        _match(
            sqlfz, duck,
            f"SELECT i, CASE WHEN a {op} {lit}::BIGINT[] THEN 1"
            f" ELSE 0 END AS hit FROM fz37",
        )
        # value position: SELECT list
        _match(
            sqlfz, duck,
            f"SELECT i, CAST(a {op} {lit}::BIGINT[] AS VARCHAR)"
            f" AS v FROM fz37",
        )


_UNITS = ("MONTH", "YEAR", "DAY", "WEEK", "HOUR", "MINUTE", "SECOND")


def _rand_chain(rng, n):
    parts = [f"INTERVAL {rng.randrange(0, 40)} {rng.choice(_UNITS)}"]
    for _ in range(n - 1):
        parts.append(rng.choice(("+", "-")))
        parts.append(
            f"INTERVAL {rng.randrange(0, 40)} {rng.choice(_UNITS)}"
        )
    return " ".join(parts)


def test_fuzz_interval_chains(sqlfz, duck):
    rng = random.Random(3811)
    for trial in range(15):
        chain = _rand_chain(rng, rng.randrange(2, 4))
        _match(
            sqlfz, duck,
            f"SELECT CAST({chain} AS VARCHAR) AS r,"
            f" EXTRACT(epoch FROM {chain}) AS e,"
            f" DATE '2024-01-31' + ({chain}) AS d",
        )
