"""Round-12 fuzz-hunt battery D pins (46 probes: JSON deep paths,
maps/structs, CTE/statement structure, sampling clauses, nested
subscripts, generate_series).

Fixed this round:

* ``json_transform`` / ``json_transform_strict`` — DuckDB's typed-JSON
  projection is from_json with the structure-spec syntax; routed
  through the existing spec→DDL conversion;
* ``USING SAMPLE N PERCENT (bernoulli[, seed])`` — the method-suffix
  spelling, plus DuckDB's clause-after-alias grammar (Spark wants
  TABLESAMPLE before the alias; the rewrite swaps when the preceding
  word proves the identifier is an alias).

Documented acceptances (values equal, client representation only):
struct/map results collect as Row objects / Python dicts where the
DuckDB client renders dicts with key/value arrays.
"""

from __future__ import annotations

import pytest

from duckdb_server_spark.dialect import (
    register_dialect_functions,
    run_sql,
    serving_dialect,
)


@pytest.fixture(scope="module")
def sqlD(spark, duck):
    register_dialect_functions(spark)
    return spark


def _match(spark, duck, sql: str):
    theirs = duck.execute(sql).fetchall()
    with serving_dialect(True):
        ours = [tuple(r) for r in run_sql(spark, sql).collect()]
    a = sorted([str(x) for x in r] for r in ours)
    b = sorted([str(x) for x in r] for r in theirs)
    assert a == b, f"{sql!r}: {ours[:4]} != {theirs[:4]}"


def test_json_transform_values(sqlD, duck):
    with serving_dialect(True):
        r = run_sql(
            sqlD,
            "SELECT json_transform('{\"a\":\"2024-01-01\",\"n\":\"7\"}',"
            " '{\"a\":\"DATE\",\"n\":\"BIGINT\"}') AS v",
        ).collect()[0].v
    d = duck.execute(
        "SELECT json_transform('{\"a\":\"2024-01-01\",\"n\":\"7\"}',"
        " '{\"a\":\"DATE\",\"n\":\"BIGINT\"}')").fetchone()[0]
    assert (r.a, r.n) == (d["a"], d["n"])


@pytest.mark.parametrize("sql", [
    "SELECT count(*) AS c FROM range(10) t USING SAMPLE 100 PERCENT"
    " (BERNOULLI)",
    "SELECT count(*) AS c FROM range(10) t USING SAMPLE 100 PERCENT",
    "SELECT count(*) AS c FROM range(20) USING SAMPLE 100 PERCENT"
    " (bernoulli, 42)",
])
def test_sampling_method_suffix(sqlD, duck, sql):
    _match(sqlD, duck, sql)


@pytest.mark.parametrize("sql", [
    # probed clean in the same sweep — pinned against drift
    "SELECT json_extract('{\"a\": {\"b\": [1,2,3]}}', '$.a.b[1]') AS v",
    "SELECT json_keys('{\"a\":1,\"b\":2}') AS v",
    "SELECT json_merge_patch('{\"a\":1}', '{\"b\":2}') AS v",
    "SELECT json_valid('{\"a\":}') AS a, json_valid('{}') AS b",
    "SELECT json_extract('[1,2,3]', '$[#-1]') AS v",
    "WITH RECURSIVE f(n, v) AS (SELECT 1, 1 UNION ALL"
    " SELECT n+1, v*(n+1) FROM f WHERE n < 6) SELECT max(v) AS v FROM f",
    "SELECT 3 IN (1, 2, NULL) AS a, 1 IN (1, NULL) AS b",
    "SELECT (1, 2) < (1, 3) AS v",
    "SELECT GREATEST(1, NULL, 3) AS a, LEAST(1, NULL, 3) AS b",
    "PIVOT (SELECT 'x' AS k, 'a' AS g, 1 AS v) ON g USING sum(v)",
    "SELECT k, sum(v) FILTER (g = 'a') AS a FROM"
    " (VALUES ('x','a',1),('x','b',2)) t(k,g,v) GROUP BY k",
    "SELECT ([[1,2],[3]])[1][2] AS v",
    "SELECT [[1],[2,3]][2] AS v",
    "SELECT generate_series(5, 1, -2) AS v",
    "SELECT unnest(generate_series(3, 1, -1)) AS v",
    "SELECT range(DATE '2024-01-01', DATE '2024-01-04',"
    " INTERVAL 1 DAY) AS v",
    "FROM (VALUES (42)) t(x) SELECT x",
])
def test_probed_clean_pinned(sqlD, duck, sql):
    _match(sqlD, duck, sql)
