"""Dialect probe battery 33 — nested-type edges, JSON path corners, and
window-frame corners probed against live DuckDB (VERDICT r9 item 5).

Found and fixed this round (each was a silent wrong answer or a hard
error on the serving path):

* **Nested comparison NULL semantics** — DuckDB compares lists/structs
  with a left-to-right SHORT-CIRCUIT scan where a NULL element/field
  pair stops the scan with UNKNOWN (probed: ``[NULL,1] = [NULL,2]`` is
  NULL even though index 1 differs; ``[2,NULL] < [1,2]`` is FALSE —
  first pair decides; ``[1] = [1,2]`` is FALSE — equal prefix, then
  length). Spark treats nested NULLs as ordinary equal/orderable values,
  so every such comparison was silently wrong. The rewrite fires when an
  operand is provably nested; structs resolve field names from literals,
  cast types, or the catalog schema, and fail closed otherwise; map
  comparisons fail closed.
* **JSON path corners** — ``$.a[*]`` wildcards (LIST result), from-end
  indexes ``[#-1]`` / negative ``[-1]``, RFC 6901 JSON Pointer paths
  (``/a/0``), LIST-of-paths second arguments, a resolved JSON ``null``
  reading as SQL NULL (was the text 'null'), two-argument
  ``json_array_length``, and exotic-path ``json_extract_string``.
* **List functions** — ``list_extract``/``[0]`` out-of-range/zero
  indexes return NULL (Spark's element_at raises under ANSI);
  ``list_concat`` SKIPS NULL arguments; ``flatten`` skips NULL sublists;
  ``list_reverse_sort`` is DESC NULLS LAST; ``len()`` of a cast-to-list;
  ``list_contains(l, NULL)`` is NULL.
* **Type spellings** — ``CAST(x AS STRUCT(a INT))`` / ``MAP(K, V)``
  translate to Spark's ``STRUCT<a: INT>`` / ``MAP<K, V>``.

Comparison artifacts normalized here (NOT divergences): PySpark returns
structs as Row (dict-equal), duckdb-1.0's Python client fetches MAP
columns as {'key': [...], 'value': [...]}, and DuckDB documents
``list_distinct`` element order as unspecified (set-compared).
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
def sql33(spark, sf_dir):
    from duckdb_server_spark.session import register_views

    register_dialect_functions(spark)
    register_views(spark, sf_dir, ("nation", "orders", "region"))
    return spark


def _norm(v):
    """Engine/oracle value → comparable form (Row→dict, map-fetch shape,
    floats via repr)."""
    try:
        from pyspark.sql import Row

        if isinstance(v, Row):
            return {k: _norm(x) for k, x in v.asDict().items()}
    except ImportError:  # pragma: no cover
        pass
    if isinstance(v, dict):
        if set(v) == {"key", "value"} and isinstance(v["key"], list):
            # duckdb-1.0 client MAP fetch artifact
            return {str(k): _norm(x)
                    for k, x in zip(v["key"], v["value"])}
        return {str(k): _norm(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return str(v)


def _match(spark, duck, sql: str, ordered: bool = False):
    theirs = duck.execute(sql).fetchall()
    with serving_dialect(True):
        ours = [tuple(r) for r in run_sql(spark, sql).collect()]
    a = [[_norm(x) for x in r] for r in ours]
    b = [[_norm(x) for x in r] for r in theirs]
    if not ordered:
        a = sorted(a, key=repr)
        b = sorted(b, key=repr)
    assert a == b, f"{sql!r}: {ours[:3]} != {theirs[:3]}"


# --- nested comparison NULL semantics ----------------------------------------


@pytest.mark.parametrize(
    "sql",
    [
        # lists: equality
        "SELECT [1, NULL] = [1, NULL] AS a, [NULL] = [NULL] AS b",
        "SELECT [NULL] = [1] AS a, [NULL, 1] = [NULL, 2] AS b",
        "SELECT [1] = [1, 2] AS a, [NULL] = [NULL, 2] AS b",
        "SELECT [NULL, 1] = [2] AS a, [1, 2] = [1, 2] AS b",
        "SELECT [1, 2] <> [1, 3] AS a, [1, NULL] <> [1, 2] AS b",
        # lists: ordering (short-circuit scan, then length)
        "SELECT [NULL] < [1] AS a, [2, NULL] < [1, 2] AS b",
        "SELECT [1, NULL] < [1, 2] AS a, [1, 2] < [1] AS b",
        "SELECT [1] < [1, 2] AS a, [1, 2] <= [1, 2] AS b",
        "SELECT [3, 1] > [2, 9] AS a, [1, NULL] >= [1, NULL] AS b",
        # structs: literal fields
        "SELECT {'a': NULL} = {'a': 1} AS a, {'a': NULL} = {'a': NULL} AS b",
        "SELECT {'a': 1, 'b': NULL} < {'a': 1, 'b': 2} AS a",
        "SELECT {'a': 1, 'b': NULL} = {'a': 2, 'b': NULL} AS a",
        "SELECT {'a': 2, 'b': NULL} > {'a': 1, 'b': NULL} AS a",
        "SELECT {'a': 1} = {'a': 1} AS eq, {'a': 1} = {'a': 2} AS ne",
        "SELECT {'a': 1, 'b': NULL} <> {'a': 1, 'b': 2} AS a",
        # struct field names from a CAST type on one side
        "SELECT CAST(NULL AS STRUCT(a INT)) = {'a': 1} AS x",
        # null-free comparisons still exact
        "SELECT [1,2,3] = [1,2,3] AS a, [1,2] < [1,3] AS b, "
        "{'a': 1, 'b': 'x'} = {'a': 1, 'b': 'x'} AS c",
        # IS [NOT] DISTINCT FROM agrees between engines (no rewrite)
        "SELECT [NULL] IS NOT DISTINCT FROM [NULL] AS a, "
        "{'a': NULL} IS DISTINCT FROM {'a': NULL} AS b",
    ],
)
def test_nested_comparisons(sql33, duck, sql):
    _match(sql33, duck, sql)


def test_nested_comparison_on_column(sql33, duck):
    view = (
        "SELECT n_nationkey AS k, "
        "CASE WHEN n_nationkey % 3 = 0 THEN [n_nationkey, NULL] "
        "ELSE [n_nationkey, n_regionkey] END AS l FROM nation"
    )
    with serving_dialect(True):
        run_sql(sql33, f"CREATE OR REPLACE TEMP VIEW b33lists AS {view}")
    duck.execute(f"CREATE OR REPLACE VIEW b33lists AS {view}")
    _match(sql33, duck,
           "SELECT k, l = [k, 1] AS eq, l < [k, 99] AS lt FROM b33lists")


def test_map_comparison_fails_closed(sql33):
    with serving_dialect(True):
        with pytest.raises(DialectError, match="map comparison"):
            run_sql(
                sql33, "SELECT MAP([1],['x']) = MAP([1],['x'])"
            ).collect()


def test_scalar_comparisons_untouched(sql33, duck):
    _match(sql33, duck,
           "SELECT n_nationkey FROM nation WHERE n_nationkey >= 20 "
           "AND n_name <> 'X' ORDER BY 1", ordered=True)


# --- JSON path corners --------------------------------------------------------


@pytest.mark.parametrize(
    "sql",
    [
        """SELECT json_extract('{"a": [1,2,3]}', '$.a[*]') AS x""",
        """SELECT json_extract('{"a":[{"b":1},{"b":2}]}', '$.a[*].b') AS x""",
        """SELECT json_extract('{"a": [1,2,3]}', '$.a[#-1]') AS x,
                  json_extract('{"a": [1,2,3]}', '$.a[-1]') AS y""",
        """SELECT json_extract('[1,2]', '$[#-2]') AS x""",
        """SELECT json_extract('{"a": {"b": null}}', '$.a.b') AS x,
                  json_extract('{"a": {"b": null}}', '$.a.c') AS y""",
        """SELECT json_extract('{"a": 1}', '/a') AS x,
                  json_extract('{"a": [1,2]}', '/a/1') AS y""",
        """SELECT json_extract('{"a": {"b": 2}}', 'a') AS x""",
        """SELECT json_extract('{"a": [1,2,3]}', ['$.a[0]','$.a[2]']) AS x""",
        """SELECT json_extract_string('{"a": {"b": null}}', '$.a.b') AS x""",
        """SELECT json_extract_string('{"a": "q"}', '/a') AS x""",
        """SELECT json_extract_string('{"a": [1,2]}', '$.a[#-1]') AS x""",
        """SELECT json_array_length('{"a":[1,2,3]}', '$.a') AS x,
                  json_array_length('[1,2]') AS y""",
        """SELECT json_array_length('{"a":[1,2,3]}', '/a') AS x""",
        """SELECT '{"a": {"b.c": 5}}'->'a'->>'b.c' AS x""",
    ],
)
def test_json_path_corners(sql33, duck, sql):
    _match(sql33, duck, sql)


# --- list function edges --------------------------------------------------------


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT list_extract([1,2,3], 0) AS a, list_extract([1,2,3], 9) AS b,"
        " list_extract([1,2,3], -1) AS c",
        "SELECT [1,2,3][0] AS a",
        "SELECT list_concat([1], NULL) AS a, list_concat(NULL, [2]) AS b,"
        " list_concat(NULL, NULL) AS c, list_concat([1], [2]) AS d",
        "SELECT flatten([[1,2],[3]]) AS a, flatten([[1],NULL]) AS b,"
        " flatten(CAST(NULL AS INT[][])) AS c",
        "SELECT list_reverse_sort([3, NULL, 1]) AS a, list_sort([3, NULL, 1]) AS b",
        "SELECT len([1,NULL,3]) AS a, len(CAST(NULL AS INT[])) AS b",
        "SELECT list_contains([1,NULL], NULL) AS a,"
        " list_contains([1,NULL], 1) AS b, list_contains([1,NULL], 2) AS c",
        "SELECT coalesce(CAST(NULL AS STRUCT(a INT)), {'a': 9}) AS x",
        "SELECT CAST(NULL AS MAP(INT, VARCHAR)) IS NULL AS x",
        # element order of list_distinct is unspecified — sort both sides
        "SELECT list_sort(list_distinct([1, NULL, 1, 2])) AS x",
    ],
)
def test_list_function_edges(sql33, duck, sql):
    _match(sql33, duck, sql)


# --- nested types through set operations ---------------------------------------


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT [1,2] AS l UNION SELECT [1,2]",
        "SELECT [1,2] AS l UNION ALL SELECT [3]",
        "SELECT [1,2] AS l INTERSECT SELECT [1,2]",
        "SELECT [1,2] AS l EXCEPT SELECT [3]",
        "SELECT [1, NULL, 2] AS l UNION SELECT [1, NULL, 2]",
        "SELECT {'a': 1, 'b': 'x'} AS s UNION SELECT {'a': 2, 'b': 'y'}",
        "SELECT {'a': 1} AS s INTERSECT SELECT {'a': 1}",
        "SELECT {'a': 1} AS s UNION ALL SELECT {'a': 2.5}",
        "SELECT [1,2] AS l UNION ALL SELECT [2.5]",
        "SELECT MAP([1,2],['a','b']) AS m UNION ALL SELECT MAP([3],['c'])",
        "SELECT unnest([{'a':1},{'a':2}]) AS u",
        "SELECT struct_extract({'a': {'b': 7}}, 'a') AS x",
    ],
)
def test_nested_set_ops(sql33, duck, sql):
    _match(sql33, duck, sql)


def test_struct_order_by(sql33, duck):
    _match(
        sql33, duck,
        "SELECT s FROM (SELECT {'a': n_nationkey % 3, 'b': n_name} AS s "
        "FROM nation) t ORDER BY s LIMIT 5",
        ordered=True,
    )


# --- window frame corners -------------------------------------------------------


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT n_nationkey, sum(n_nationkey) OVER (ORDER BY n_nationkey"
        " RANGE BETWEEN 2 PRECEDING AND 1 PRECEDING) AS s FROM nation"
        " ORDER BY n_nationkey",
        "SELECT n_nationkey, sum(n_nationkey) OVER (ORDER BY n_nationkey"
        " RANGE BETWEEN 1 FOLLOWING AND 3 FOLLOWING) AS s FROM nation"
        " ORDER BY n_nationkey",
        "SELECT n_nationkey, sum(n_nationkey) OVER (ORDER BY n_nationkey"
        " ROWS BETWEEN 3 PRECEDING AND 2 PRECEDING) AS s FROM nation"
        " ORDER BY n_nationkey",
        "SELECT n_nationkey, count(*) OVER (ORDER BY n_nationkey"
        " ROWS BETWEEN CURRENT ROW AND CURRENT ROW EXCLUDE CURRENT ROW)"
        " AS c FROM nation ORDER BY n_nationkey",
        "SELECT n_nationkey, sum(n_nationkey) OVER (ORDER BY n_nationkey"
        " DESC RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS s FROM nation"
        " ORDER BY n_nationkey",
    ],
)
def test_window_frame_corners(sql33, duck, sql):
    _match(sql33, duck, sql, ordered=True)


def test_exclude_group_over_rows_fails_closed(sql33):
    # peers can lie outside a ROWS frame: subtraction would over-correct;
    # the engine refuses rather than risking a silent wrong answer
    with serving_dialect(True):
        with pytest.raises(Exception, match="EXCLUDE"):
            run_sql(
                sql33,
                "SELECT sum(n_nationkey) OVER (ORDER BY n_nationkey ROWS "
                "BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) "
                "FROM nation",
            ).collect()
