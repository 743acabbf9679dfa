"""Dialect probe battery 31 — engine-defined and operator-sugar tails
probed against live DuckDB:

* ``hash()`` — DuckDB's UBIGINT hash reproduced bit for bit: the
  murmur-style finalizer over each type's unsigned representation at
  its own width (INTEGER 32-bit, BIGINT 64, DATE days, TIMESTAMP
  micros, DECIMAL unscaled at its storage width, DOUBLE IEEE bits,
  -0.0 normalized), MurmurHash64A(seed 0xe17a1465) for VARCHAR/BLOB,
  a pinned NULL constant, and the left-fold CombineHash
  ``(a * 0xbf58476d1ce4e5b9) ^ b`` for multi-argument calls. Spark's
  native ``hash`` is 32-bit Murmur3 — every value was silently
  different before.
* ``a <@ b`` / ``a @> b`` / ``a && b`` list containment/overlap
  operators, plus NULL-element semantics fixes for list_has_all /
  list_has_any (DuckDB IGNORES NULL elements; the old forall/
  array_contains form returned NULL where DuckDB says true/false).
* dot-call method sugar ``expr.fn(args)`` ≡ ``fn(expr, args)``,
  chainable; schema qualifiers (main.abs) strip; bare-number and
  string-literal receivers stay parser errors like DuckDB.
* ``'…'::DATE - '…'::DATE`` now folds to the BIGINT day count (the
  DATE-literal and date-column forms were already covered).
* ``unnest(struct)`` and ``unnest(struct, recursive := true)`` with
  nested-struct flattening to leaf names.
* expression-level COLLATE (NOCASE / NOACCENT / NFC, dotted combos)
  applied to both comparison operands or an ORDER BY key; any other
  position fails closed rather than changing a projected value.
"""

from __future__ import annotations

import pytest

from duckdb_server_spark.dialect import (
    register_dialect_functions,
    run_sql,
    serving_dialect,
)


@pytest.fixture(scope="module")
def sql31(spark, sf_dir):
    from duckdb_server_spark.session import register_views

    register_dialect_functions(spark)
    register_views(spark, sf_dir, ("nation", "orders"))
    return spark


def _match(spark, duck, sql: str, ordered: bool = False):
    theirs = duck.execute(sql).fetchall()
    with serving_dialect(True):
        ours = [tuple(r) for r in run_sql(spark, sql).collect()]
    a = [[str(x) for x in r] for r in ours]
    b = [[str(x) for x in r] for r in theirs]
    if not ordered:
        a, b = sorted(a), sorted(b)
    assert a == b, f"{sql!r}: {ours[:3]} != {theirs[:3]}"


# --- hash() ----------------------------------------------------------------


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT hash(42) AS h, hash(-1) AS h2, hash(3000000000) AS h3",
        "SELECT hash(0) AS z, hash(true) AS t, hash(false) AS f",
        "SELECT hash('abc') AS hs, hash('') AS he, hash('日本語テキスト') AS hu",
        "SELECT hash('abcdefgh') AS h8, hash('abcdefghi') AS h9",
        "SELECT hash(NULL) AS hn",
        "SELECT hash(1.5) AS hd, hash(-1.5) AS hdn, hash(-12345678901.234) AS hd2",
        "SELECT hash(1e3) AS hsci",
        "SELECT hash(DATE '2024-01-01') AS hdate",
        "SELECT hash(TIMESTAMP '2024-06-01 12:34:56.789') AS hts",
        "SELECT hash(1, 2) AS c2, hash(1, 2, 3) AS c3, hash('a', 1) AS cm",
    ],
)
def test_hash_literals(sql31, duck, sql):
    _match(sql31, duck, sql)


def test_hash_typed_columns(sql31, duck):
    _match(
        sql31,
        duck,
        "SELECT o_orderkey, hash(o_orderkey) AS hk, hash(o_orderdate) AS hd,"
        " hash(o_orderstatus) AS hs, hash(o_totalprice) AS hp"
        " FROM orders ORDER BY o_orderkey LIMIT 20",
        ordered=True,
    )


def test_hash_combine_columns(sql31, duck):
    _match(
        sql31,
        duck,
        "SELECT hash(o_custkey, o_orderdate) AS hc FROM orders"
        " ORDER BY o_orderkey LIMIT 10",
        ordered=True,
    )


def test_hash_bucketing_pattern(sql31, duck):
    _match(
        sql31,
        duck,
        "SELECT hash(o_orderkey) % 16 AS bucket, count(*) AS n"
        " FROM orders GROUP BY 1 ORDER BY 1",
        ordered=True,
    )


def test_hash_null_in_column(sql31, duck):
    view = (
        "SELECT CASE WHEN n_nationkey % 3 = 0 THEN NULL"
        " ELSE n_nationkey END AS x FROM nation"
    )
    sql31.sql(f"CREATE OR REPLACE TEMP VIEW b31nulls AS {view}")
    duck.execute(f"CREATE OR REPLACE VIEW b31nulls AS {view}")
    _match(sql31, duck, "SELECT hash(x) AS h FROM b31nulls")


def test_hash_unprovable_operand_fails_closed(sql31):
    with serving_dialect(True):
        with pytest.raises(Exception, match="hash"):
            run_sql(sql31, "SELECT hash(o_orderkey + 1) FROM orders")


# --- list containment / overlap operators ----------------------------------


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT [1,1] <@ [1,2] AS a, [1,2,2] @> [2,2,2] AS b,"
        " [] <@ [1] AS c, [1] <@ [] AS d",
        "SELECT [NULL] <@ [1, NULL] AS n1, [1] && [NULL, 1] AS n2,"
        " [] && [] AS e",
        "SELECT [NULL] <@ [1] AS ig, [NULL] && [NULL] AS nn",
        "SELECT list_has_all([1,NULL],[NULL]) AS a,"
        " list_has_all([1],[NULL]) AS b, list_has_any([NULL],[NULL]) AS c",
        "SELECT list_has_all([1], []) AS f, list_has_all([], [1]) AS g,"
        " list_has_any([1],[1,9]) AS h",
        "SELECT list_has_all(NULL, [1]) AS i, list_has_any([1], NULL) AS j",
        "SELECT list_sort([3,1,2]) <@ [0,1,2,3] AS post",
        "SELECT x && [2] AS colop FROM (SELECT [1,2] AS x) t",
        "SELECT 5 BETWEEN 1 AND 10 AND [1] && [1] AS mixed",
    ],
)
def test_list_set_operators(sql31, duck, sql):
    _match(sql31, duck, sql)


# --- dot-call method sugar ---------------------------------------------------


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT abs(-3).sqrt() AS chained",
        "SELECT ([1,2,3]).list_sum() AS dsum",
        "SELECT x.sqrt().round(2) AS d FROM (SELECT 2.0 AS x) t",
        "SELECT [1,2].list_contains(2) AS e",
        "SELECT (5).abs() AS c",
        "SELECT ('abc').upper() AS a",
        "SELECT main.abs(-1) AS f",
        "SELECT t.x.abs() AS i FROM (SELECT -3 AS x) t",
        "SELECT n_name.lower().upper() AS nm FROM nation"
        " ORDER BY n_nationkey LIMIT 3",
        "SELECT n_name.substr(1, 3) AS s3 FROM nation"
        " ORDER BY n_nationkey LIMIT 3",
    ],
)
def test_dot_calls(sql31, duck, sql):
    _match(sql31, duck, sql)


def test_dot_call_string_literal_stays_error(sql31, duck):
    # a parser error in DuckDB — must NOT silently start working
    with pytest.raises(Exception):
        duck.execute("SELECT 'abc'.upper()")
    with serving_dialect(True):
        with pytest.raises(Exception):
            run_sql(sql31, "SELECT 'abc'.upper()").collect()


# --- date-cast subtraction ---------------------------------------------------


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT '2024-01-15'::DATE - '2024-01-01'::DATE AS diff",
        "SELECT CAST('2024-01-15' AS DATE) - CAST('2024-01-01' AS DATE)"
        " AS diff2",
        "SELECT DATE '2024-01-15' - '2024-01-01'::DATE AS diff3",
        "SELECT '2024-01-15'::DATE - 14 AS mi",
        "SELECT '2024-01-01'::DATE + INTERVAL 3 DAY AS pi",
        "SELECT 15 - 3 AS n, 1.5 - 0.25 AS f",
    ],
)
def test_date_cast_subtraction(sql31, duck, sql):
    _match(sql31, duck, sql)


# --- unnest(struct) ----------------------------------------------------------


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT unnest({'a': 1, 'b': 2})",
        "SELECT unnest({'a': 1, 'b': {'c': 2}}, recursive := true)",
        "SELECT unnest({'a': 1, 'b': {'c': 2, 'd': {'e': 5}}},"
        " recursive := true)",
    ],
)
def test_unnest_struct(sql31, duck, sql):
    _match(sql31, duck, sql)


# --- expression-level COLLATE ------------------------------------------------


@pytest.mark.parametrize(
    "sql,ordered",
    [
        ("SELECT 'a' < 'B' COLLATE NOCASE AS c", False),
        ("SELECT 'ö' = 'o' COLLATE NOACCENT AS na,"
         " 'A' = 'a' COLLATE NOCASE AS nc", False),
        ("SELECT 'Ö' = 'o' COLLATE NOCASE.NOACCENT AS both", False),
        ("SELECT 'a' COLLATE NOCASE = 'A' AS lc", False),
        ("SELECT grade FROM (VALUES ('b'),('A')) t(grade)"
         " ORDER BY grade COLLATE NOCASE", True),
        ("SELECT g FROM (VALUES ('é'),('e')) t(g)"
         " ORDER BY g COLLATE NOACCENT, g", True),
    ],
)
def test_collate_expressions(sql31, duck, sql, ordered):
    _match(sql31, duck, sql, ordered=ordered)


def test_collate_projection_fails_closed(sql31):
    # a bare projected COLLATE would have to change the value — refuse
    # (our DialectError; never Spark's native collation semantics)
    with serving_dialect(True):
        with pytest.raises(Exception, match="COLLAT"):
            run_sql(sql31, "SELECT 'A' COLLATE NOCASE AS v")
