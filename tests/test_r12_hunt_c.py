"""Round-12 fuzz-hunt battery C pins (37 differential probes over
window frames, grouping sets, ordered/distinct aggregates, DISTINCT
ON, unnest shapes, and nested-type aggregation).

Silent wrong answers FOUND AND FIXED:

* **default null placement in ORDER BY** — DuckDB sorts NULLs LAST for
  both directions by default; Spark's ASC default is NULLS FIRST, so
  every unannotated ascending key over nullable data ordered
  differently (window functions AND top-level/subquery ORDER BY). The
  rewrite appends NULLS LAST to unannotated non-DESC keys, running
  LAST in the pipeline so frame rewrites that copy order keys into
  PARTITION BY lists are not polluted;
* ``min``/``max`` over STRUCT constructors — DuckDB's total order puts
  a NULL field HIGHEST (max picks the NULL row, min skips it); Spark's
  struct ordering puts it lowest. Lowered to max_by/min_by over a flat
  (is_null, value) key sequence;
* ``list()``/``array_agg()`` over ZERO rows — DuckDB gives NULL,
  collect_list gave [].

Documented acceptances: struct results collect as Row objects (DuckDB
clients see tuples/dicts — values must agree); min/max over struct
COLUMNS (not constructor text) keep Spark ordering.
"""

from __future__ import annotations

import pytest

from duckdb_server_spark.dialect import (
    register_dialect_functions,
    run_sql,
    serving_dialect,
)

T = ("FROM (VALUES (1,'a',10),(2,'a',20),(3,'b',NULL),(4,'b',40),"
     "(5,'c',50)) t(i,g,v)")


@pytest.fixture(scope="module")
def sqlC(spark, duck):
    register_dialect_functions(spark)
    return spark


def _match(spark, duck, sql: str, ordered: bool = False):
    theirs = duck.execute(sql).fetchall()
    with serving_dialect(True):
        ours = [tuple(r) for r in run_sql(spark, sql).collect()]
    a = [[str(x) for x in r] for r in ours]
    b = [[str(x) for x in r] for r in theirs]
    if not ordered:
        a, b = sorted(a), sorted(b)
    assert a == b, f"{sql!r}: {ours[:4]} != {theirs[:4]}"


@pytest.mark.parametrize("sql", [
    # the divergent case: unannotated ASC over nullable keys
    f"SELECT i, count(*) OVER (ORDER BY v) AS s {T}",
    f"SELECT i, rank() OVER (ORDER BY v) AS s {T}",
    f"SELECT i, sum(v) OVER (PARTITION BY g ORDER BY v) AS s {T}",
])
def test_window_null_default_placement(sqlC, duck, sql):
    _match(sqlC, duck, sql)


def test_toplevel_order_by_null_default(sqlC, duck):
    _match(sqlC, duck, f"SELECT i {T} ORDER BY v", ordered=True)
    _match(sqlC, duck, f"SELECT i {T} ORDER BY v DESC", ordered=True)
    _match(sqlC, duck, f"SELECT i {T} ORDER BY v ASC, i", ordered=True)


def test_minmax_struct_total_order(sqlC, duck):
    with serving_dialect(True):
        mx = run_sql(sqlC, f"SELECT max(row(v, i)) AS s {T}").collect()
        mn = run_sql(
            sqlC, f"SELECT min(struct_pack(a := v, b := i)) AS s {T}"
        ).collect()
    assert tuple(mx[0].s) == tuple(
        duck.execute(f"SELECT max(row(v, i)) {T}").fetchone()[0])
    d = duck.execute(
        f"SELECT min(struct_pack(a := v, b := i)) {T}").fetchone()[0]
    assert (mn[0].s.a, mn[0].s.b) == (d["a"], d["b"])


@pytest.mark.parametrize("sql", [
    "SELECT list(x) AS v FROM (SELECT 1 AS x WHERE false) t",
    "SELECT array_agg(x) AS v FROM (SELECT 1 AS x WHERE false) t",
    "SELECT list(v) AS x FROM (VALUES (1),(NULL)) t(v)",
])
def test_empty_and_null_list_agg(sqlC, duck, sql):
    _match(sqlC, duck, sql)


@pytest.mark.parametrize("sql", [
    # probed clean in the same sweep — pinned against drift
    f"SELECT i, sum(v) OVER (ORDER BY i) AS s {T}",
    f"SELECT i, last_value(v IGNORE NULLS) OVER (ORDER BY i) AS s {T}",
    f"SELECT i, nth_value(v, 2) OVER (ORDER BY i) AS s {T}",
    f"SELECT i, lead(v, 2, -1) OVER (ORDER BY i) AS s {T}",
    f"SELECT i, percent_rank() OVER (ORDER BY v NULLS FIRST) AS s {T}",
    f"SELECT g, count(*) AS c {T} GROUP BY ROLLUP(g)"
    " ORDER BY g NULLS LAST",
    f"SELECT g, grouping(g) AS gr, count(*) AS c {T}"
    " GROUP BY GROUPING SETS ((g), ()) ORDER BY g NULLS LAST",
    f"SELECT count(DISTINCT g) FILTER (WHERE v > 15) AS c {T}",
    f"SELECT array_agg(DISTINCT g ORDER BY g) AS s {T}",
    f"SELECT i, v, row_number() OVER (PARTITION BY g ORDER BY i) AS rn"
    f" {T} QUALIFY rn = 1 ORDER BY i",
    f"SELECT string_agg(g, ',' ORDER BY i DESC) AS s {T}",
    f"SELECT arg_min(g, v) AS a, arg_max(g, v) AS b {T}",
    f"SELECT DISTINCT ON (g) i, g {T} ORDER BY g, i DESC",
    "SELECT u.x FROM unnest([1,2,3]) AS u(x)",
    "SELECT bool_and(x) AS v FROM (SELECT true AS x WHERE false) t",
    "SELECT sum(x) AS v FROM (SELECT 1 AS x WHERE false) t",
])
def test_probed_clean_pinned(sqlC, duck, sql):
    _match(sqlC, duck, sql)
