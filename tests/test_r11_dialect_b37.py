"""Dialect probe battery 37 — CONTEXT-SENSITIVE nested-comparison
semantics, probed against live DuckDB 1.0 (VERDICT r10 item 5).

Found and fixed this round (a silent-wrong-answer class sitting right
next to battery 33): DuckDB compares nested types with TWO different
semantics depending on where the comparison sits.

* **Value position** (SELECT list, function arguments, a wrapped
  ``(cmp) IS NULL`` / ``(cmp) = true``, aggregate ``FILTER (WHERE …)``):
  the battery-33 short-circuit scan — a NULL element/field pair stops
  the scan with UNKNOWN.
* **Boolean position** (WHERE / HAVING / JOIN ON / CASE WHEN,
  transitively through AND/OR/NOT and grouping parens): an
  IS-DISTINCT-FROM-style TOTAL ORDER — NULL elements compare EQUAL to
  NULL elements and sort LAST (larger than any value); only a
  top-level NULL operand still yields UNKNOWN. Probed live:
  ``WHERE a = [1, NULL]`` KEEPS a ``[1, NULL]`` row that
  ``SELECT a = [1, NULL]`` calls NULL.
* **Constant folding exception**: literal-vs-literal comparisons fold
  BEFORE the boolean-context conversion, keeping value semantics even
  in WHERE (probed: ``WHERE [1,NULL] = [1,NULL]`` filters the row out).

The rewrite classifies each comparison's context textually (left
neighbor keyword through grouping parens; right neighbor clause
keyword), with ``FILTER (WHERE …)`` special-cased to value semantics.
DML WHERE predicates reach the rewrite through the internal
``__dd_boolctx(...)`` marker since the UPDATE/DELETE handlers embed
them in coalesce/CAST NULL plumbing before the pipeline runs.

``CAST(cmp AS BOOLEAN)`` in a filter propagates boolean context
(probed; other cast targets stay value context). Documented residual
(value-classified): a boolean chain nested inside a function argument.
"""

from __future__ import annotations

import pytest

from duckdb_server_spark.dialect import (
    execute_statement,
    register_dialect_functions,
    run_sql,
    serving_dialect,
)


@pytest.fixture(scope="module")
def sql37(spark, duck):
    register_dialect_functions(spark)
    setup = [
        "CREATE TABLE b37t AS SELECT 0 AS i, [1, NULL] AS a"
        " UNION ALL SELECT 1, [1, 2]"
        " UNION ALL SELECT 2, [1]"
        " UNION ALL SELECT 3, CAST(NULL AS BIGINT[])"
        " UNION ALL SELECT 4, [2, NULL]",
        "CREATE TABLE b37s AS"
        " SELECT 0 AS i, {'x': 1, 'y': CAST(NULL AS INT)} AS s"
        " UNION ALL SELECT 1, {'x': 1, 'y': 2}"
        " UNION ALL SELECT 2, {'x': CAST(NULL AS INT), 'y': 3}",
    ]
    for st in setup:
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


# --- boolean position: WHERE -------------------------------------------------


@pytest.mark.parametrize("op,lit", [
    ("=", "[1, NULL]"),
    ("=", "[1, 2]"),
    ("<>", "[1, NULL]"),
    ("<>", "[1, 2]"),
    ("<", "[1, 2]"),
    ("<", "[2]"),
    ("<", "[1]"),
    ("<=", "[1, NULL]"),
    ("<=", "[1, NULL, 0]"),
    (">", "[1]"),
    (">", "[1, 2]"),
    (">=", "[2, NULL]"),
])
def test_where_list_distinct_order(sql37, duck, op, lit):
    _match(sql37, duck, f"SELECT i FROM b37t WHERE a {op} {lit}")


def test_where_not_wrapped(sql37, duck):
    _match(sql37, duck, "SELECT i FROM b37t WHERE NOT (a = [1, NULL])")


def test_where_and_or_chain(sql37, duck):
    _match(
        sql37, duck,
        "SELECT i FROM b37t WHERE a = [1, NULL] OR (i > 0 AND"
        " a = [1, 2])",
    )


def test_where_top_level_null_operand(sql37, duck):
    # row 3's list is NULL at the top level: UNKNOWN, filtered
    _match(sql37, duck, "SELECT i FROM b37t WHERE a = a")


def test_having_distinct(sql37, duck):
    _match(
        sql37, duck,
        "SELECT count(*) AS n FROM b37t GROUP BY a"
        " HAVING a = [1, NULL]",
    )


def test_join_on_distinct(sql37, duck):
    _match(
        sql37, duck,
        "SELECT x.i AS xi, y.i AS yi FROM b37t x JOIN b37t y"
        " ON x.a = y.a",
    )


def test_case_when_distinct(sql37, duck):
    _match(
        sql37, duck,
        "SELECT i, CASE WHEN a = [1, NULL] THEN 1 ELSE 0 END AS hit"
        " FROM b37t",
    )


def test_case_when_ordering_distinct(sql37, duck):
    _match(
        sql37, duck,
        "SELECT i, CASE WHEN a < [1, 2] THEN 'lt' ELSE 'ge' END AS o"
        " FROM b37t WHERE a IS NOT NULL",
    )


# --- struct comparisons in boolean position ----------------------------------


def test_where_struct_distinct_eq(sql37, duck):
    _match(
        sql37, duck,
        "SELECT i FROM b37s WHERE s = {'x': 1, 'y': NULL}",
    )


def test_where_struct_distinct_order(sql37, duck):
    # NULL field sorts LAST: {'x':1,'y':NULL} > {'x':1,'y':2}
    _match(sql37, duck, "SELECT i FROM b37s WHERE s > {'x': 1, 'y': 2}")
    _match(sql37, duck, "SELECT i FROM b37s WHERE s < {'x': 1, 'y': 2}")
    _match(
        sql37, duck,
        "SELECT i FROM b37s WHERE s >= {'x': NULL, 'y': 3}",
    )


# --- value position stays three-valued ----------------------------------------


def test_select_position_unchanged(sql37, duck):
    _match(sql37, duck, "SELECT i, a = [1, NULL] AS v FROM b37t")


def test_function_arg_value_semantics(sql37, duck):
    _match(
        sql37, duck,
        "SELECT i FROM b37t WHERE coalesce(a = [1, NULL], false)",
    )


def test_wrapped_is_null_value_semantics(sql37, duck):
    _match(
        sql37, duck,
        "SELECT i FROM b37t WHERE (a = [1, NULL]) IS NULL",
    )


def test_filter_clause_value_semantics(sql37, duck):
    _match(
        sql37, duck,
        "SELECT count(*) FILTER (WHERE a = [1, NULL]) AS n FROM b37t",
    )


def test_const_const_folds_at_value_semantics(sql37, duck):
    _match(
        sql37, duck,
        "SELECT i FROM b37t WHERE [1, CAST(NULL AS BIGINT)] ="
        " [1, CAST(NULL AS BIGINT)]",
    )


# --- DML WHERE routes through the marker --------------------------------------


def test_update_where_distinct(sql37, duck):
    for st in (
        "CREATE TABLE b37u AS SELECT i, a FROM b37t",
        "UPDATE b37u SET i = i + 100 WHERE a = [1, NULL]",
    ):
        duck.execute(st)
        execute_statement(sql37, st)
    _match(sql37, duck, "SELECT i FROM b37u")


def test_delete_where_distinct(sql37, duck):
    for st in (
        "CREATE TABLE b37d AS SELECT i, a FROM b37t",
        "DELETE FROM b37d WHERE a >= [1, NULL]",
    ):
        duck.execute(st)
        execute_statement(sql37, st)
    _match(sql37, duck, "SELECT i FROM b37d")


# --- bit-shift operators (round 11: Spark 4 parses << / >> only in some
# nesting positions — SELECT (66 >> 2) parses, the same text as a
# function argument is a PARSE_SYNTAX_ERROR — so the rewrite lowers both
# to shiftleft/shiftright with DuckDB's probed precedence) -------------------


@pytest.mark.parametrize("sql", [
    "SELECT 2 + 2 >> 1 AS v",            # shift binds LOWER than +
    "SELECT 2 >> 1 + 1 AS v",
    "SELECT 16 >> 1 << 1 AS v",          # left-associative
    "SELECT 3 * 2 >> 1 AS v",
    "SELECT -5 >> 1 AS v",               # unary minus binds tighter
    "SELECT 2 * -5 >> 1 AS v",
    "SELECT CASE WHEN 4 >> 1 = 2 THEN 'y' ELSE 'n' END AS v",
    "SELECT list_transform([1, 2], k -> (k >> 1) + (k << 2)) AS v",
    "SELECT coalesce(NULL, 66 >> 2) AS v",
])
def test_shift_operators(sql37, duck, sql):
    _match(sql37, duck, sql)


def test_shift_on_column(sql37, duck):
    _match(sql37, duck, "SELECT i << 2 AS v, i >> 1 AS w FROM b37t")


# --- whitespace-separated subscripts (round 11: DuckDB allows `x [1]`
# and whitespace collapse produces `[..] [i]`) --------------------------------


@pytest.mark.parametrize("sql", [
    "SELECT [10, 20, 30] [2] AS v",
    "SELECT [10, 20, 30]\n  [1 + 1] AS v",
    "SELECT a [1] AS v FROM b37t WHERE i = 1",
    "SELECT [[1], [2, 3]] [2] [1] AS v",
    "SELECT list_transform([1, 2], k -> [7, 8] [k]) AS v",
])
def test_spaced_subscripts(sql37, duck, sql):
    _match(sql37, duck, sql)


def test_spaced_bracket_after_keyword_stays_literal(sql37, duck):
    _match(sql37, duck, "SELECT [1, 2] AS v")
    _match(sql37, duck,
           "SELECT CASE WHEN i = 1 THEN [1] ELSE [2] END AS v FROM b37t")


def test_window_filter_distinct_semantics(sql37, duck):
    # probed: aggregate FILTER keeps value semantics (counts 0 on a
    # NULL-pair match) while a WINDOW FILTER compiles through the
    # filter path and uses distinct semantics — with the literal-only
    # const-fold exception applying to both
    _match(
        sql37, duck,
        "SELECT i, count(*) FILTER (WHERE a = [1, NULL]) OVER ()"
        " AS n FROM b37t",
    )
    _match(
        sql37, duck,
        "SELECT i, count(*) FILTER (WHERE [1, CAST(NULL AS BIGINT)] ="
        " [1, CAST(NULL AS BIGINT)]) OVER () AS n FROM b37t",
    )


def test_cast_boolean_propagates_filter_context(sql37, duck):
    _match(
        sql37, duck,
        "SELECT i FROM b37t WHERE CAST(a = [1, NULL] AS BOOLEAN)",
    )
    _match(
        sql37, duck,
        "SELECT i FROM b37t WHERE CAST((a = [1, NULL]) AS BOOLEAN)",
    )
    # a non-boolean cast target keeps value semantics
    _match(
        sql37, duck,
        "SELECT i, CAST(a = [1, NULL] AS VARCHAR) AS v FROM b37t",
    )
