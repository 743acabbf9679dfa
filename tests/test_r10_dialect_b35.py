"""Dialect probe battery 35 — aggregates/subscripts/typing corners
probed against live DuckDB. Fixed this round:

* ``min/max/count/bool_and/bool_or(x ORDER BY y)`` — DuckDB accepts
  (and ignores) ORDER BY inside order-insensitive aggregates; Spark's
  parser rejected it, erroring on valid DuckDB input.
* negative string slice ends — ``'abcdef'[2:-2]`` counts from the last
  character ('bcde'); the old substr window computed a negative length
  and silently returned ''.
* ``sign()`` returns TINYINT (-1/0/1) in DuckDB for every input type;
  Spark's signum returned DOUBLE (repr mismatch on the wire).
* ``generate_subscripts`` alongside an unnest of a textually DIFFERENT
  expression fails closed — DuckDB zips all set-returning functions in
  one SELECT positionally, a pairing the rewrite cannot reconstruct;
  the previous behavior emitted an unzipped shape with subscripts
  pinned at 1 (a silent wrong answer). The same-expression form (the
  real-world usage) keeps zipping via the lateral posexplode.
"""

from __future__ import annotations

import pytest

from duckdb_server_spark.dialect import (
    DialectError,
    register_dialect_functions,
    run_sql,
    serving_dialect,
)


@pytest.fixture(scope="module")
def sql35(spark, sf_dir):
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
    assert a == b, f"{sql!r}: {ours[:3]} != {theirs[:3]}"


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT min(o_orderdate ORDER BY o_totalprice) AS m,"
        " max(o_orderkey ORDER BY o_orderdate DESC) AS mx,"
        " count(o_orderkey ORDER BY o_orderkey) AS c FROM orders",
        "SELECT bool_and(o_orderkey > 0 ORDER BY o_orderkey) AS a"
        " FROM orders",
        # the order-SENSITIVE forms keep their existing handling
        "SELECT o_orderkey % 3 AS k,"
        " string_agg(o_orderstatus, '' ORDER BY o_orderkey) AS s"
        " FROM orders WHERE o_orderkey <= 32 GROUP BY 1 ORDER BY 1",
    ],
)
def test_order_insensitive_aggregates_accept_order_by(sql35, duck, sql):
    _match(sql35, duck, sql)


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT 'abcdef'[2:-2] AS a, 'abcdef'[:-2] AS b,"
        " 'abcdef'[-3:] AS c",
        "SELECT n_name[2:-2] AS s FROM nation ORDER BY n_nationkey"
        " LIMIT 5",
        "SELECT [1,2,3,4,5][2:-2] AS a, [1,2,3,4,5][-3:] AS b",
    ],
)
def test_negative_slice_ends(sql35, duck, sql):
    _match(sql35, duck, sql)


def test_sign_returns_integer(sql35, duck):
    _match(sql35, duck,
           "SELECT sign(-2.5) AS a, sign(0) AS b,"
           " sign(CAST(3.7 AS DOUBLE)) AS c,"
           " sign(o_totalprice) AS d FROM orders LIMIT 1")


def test_gensub_same_expression_zips(sql35, duck):
    _match(sql35, duck,
           "SELECT u.x, u.o FROM (SELECT unnest(n_name) AS x,"
           " generate_subscripts(n_name, 1) AS o FROM (SELECT"
           " string_split(n_name, '_') AS n_name FROM nation"
           " WHERE n_nationkey = 3)) u ORDER BY 2")


def test_gensub_different_unnest_fails_closed(sql35):
    with serving_dialect(True):
        with pytest.raises(DialectError, match="SAME expression"):
            run_sql(
                sql35,
                "SELECT unnest(['a','b']) AS x,"
                " generate_subscripts(['c','d'], 1) AS o",
            ).collect()


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT nullif(3, 3) AS a, ifnull(NULL, 9) AS b",
        "SELECT greatest(1, NULL, 3) AS g, least(1, NULL, 3) AS l",
        "SELECT 5 & 3 AS a, 5 | 3 AS b, xor(5, 3) AS c, ~5 AS d,"
        " 1 << 4 AS e, 256 >> 2 AS f",
        "SELECT mode(o_orderstatus) AS m FROM orders",
        "SELECT array_agg(DISTINCT o_orderstatus ORDER BY o_orderstatus)"
        " AS s FROM orders",
        "SELECT percent_rank() OVER (ORDER BY n_nationkey) AS pr,"
        " cume_dist() OVER (ORDER BY n_nationkey) AS cd FROM nation",
        "SELECT ntile(4) OVER (ORDER BY n_nationkey) AS nt FROM nation",
    ],
)
def test_surrounding_surface_stays_green(sql35, duck, sql):
    _match(sql35, duck, sql)
