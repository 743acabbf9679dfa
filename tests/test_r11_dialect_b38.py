"""Dialect probe battery 38 — INTERVAL arithmetic corners, probed
against live DuckDB 1.0 (VERDICT r10 item 5's remaining surface;
correlated-subquery decorrelation and grouping-sets NULL handling were
probed too and found already-green — their pins are below).

Found and fixed this round: DuckDB's INTERVAL is ONE unified
(months, days, micros) value; Spark splits it across two incompatible
runtime types (YearMonthInterval / DayTimeInterval), so every MIXED
month/day-time expression was a hard error. The rewrite folds literal
interval ± chains into the canonical triple and lowers each consumer:

* ``CAST(<chain> AS VARCHAR)`` → DuckDB's rendering (probed: components
  print months-days-time in that order regardless of chain order;
  '-1 day' singular; '1 month -01:30:00' puts the sign on the time
  block; all-zero → '00:00:00');
* ``EXTRACT(epoch FROM <chain>)`` / ``epoch(<chain>)`` → the folded
  DOUBLE (probed: whole years at 31557600 s, remaining months at
  2592000 s — trunc toward zero — days at 86400);
* ``expr ± (<mixed chain>)`` → CAST(expr AS TIMESTAMP) plus sequential
  single-class terms (probed: DuckDB types date ± interval as
  TIMESTAMP and applies the triple months-then-days-then-micros).
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
def sql38(spark, duck):
    register_dialect_functions(spark)
    st = (
        "CREATE TABLE b38t AS SELECT r.range AS i,"
        " DATE '2024-01-31' + INTERVAL (r.range) DAY AS d,"
        " 'g' || CAST(r.range % 3 AS VARCHAR) AS g,"
        " r.range % 5 AS v FROM range(8) r"
    )
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


# --- mixed-interval rendering ---------------------------------------------------


@pytest.mark.parametrize("sql", [
    "SELECT CAST(INTERVAL 1 MONTH + INTERVAL 35 DAY AS VARCHAR) AS v",
    "SELECT CAST(INTERVAL 1 MONTH - INTERVAL 40 DAY AS VARCHAR) AS v",
    "SELECT CAST(INTERVAL 2 MONTH - INTERVAL 1 DAY + INTERVAL 90 MINUTE"
    " AS VARCHAR) AS v",
    "SELECT CAST(INTERVAL '-1' DAY + INTERVAL 1 MONTH AS VARCHAR) AS v",
    "SELECT CAST(INTERVAL 0 DAY + INTERVAL 0 MONTH AS VARCHAR) AS v",
    "SELECT CAST(INTERVAL 1 MONTH - INTERVAL 90 MINUTE AS VARCHAR)"
    " AS v",
    "SELECT CAST(INTERVAL 26 MONTH AS VARCHAR) AS v",
    "SELECT CAST(INTERVAL 90 MINUTE AS VARCHAR) AS v",
])
def test_interval_chain_varchar(sql38, duck, sql):
    _match(sql38, duck, sql)


# --- epoch of intervals ---------------------------------------------------------


@pytest.mark.parametrize("sql", [
    "SELECT EXTRACT(epoch FROM INTERVAL 90 MINUTE) AS v",
    "SELECT EXTRACT(epoch FROM INTERVAL 1 MONTH + INTERVAL 1 DAY) AS v",
    "SELECT EXTRACT(epoch FROM INTERVAL 14 MONTH) AS v",
    "SELECT EXTRACT(epoch FROM INTERVAL '-14' MONTH) AS v",
    "SELECT epoch(INTERVAL 90 MINUTE) AS v",
    "SELECT epoch(INTERVAL 1 YEAR) AS v",
])
def test_interval_epoch(sql38, duck, sql):
    _match(sql38, duck, sql)


# --- mixed chains applied to dates/timestamps ----------------------------------


@pytest.mark.parametrize("sql", [
    "SELECT DATE '2024-01-31' + (INTERVAL 1 MONTH + INTERVAL 35 DAY)"
    " AS v",
    "SELECT DATE '2024-03-31' - (INTERVAL 1 MONTH + INTERVAL 2 DAY)"
    " AS v",
    "SELECT TIMESTAMP '2024-01-31 00:00:00' - (INTERVAL 1 MONTH -"
    " INTERVAL 90 MINUTE) AS v",
    "SELECT DATE '2024-01-31' + INTERVAL 1 MONTH AS v",
    "SELECT TIMESTAMP '2024-01-31 01:02:03' + INTERVAL 1 MONTH +"
    " INTERVAL 90 MINUTE AS v",
])
def test_interval_chain_on_temporal(sql38, duck, sql):
    _match(sql38, duck, sql)


def test_interval_chain_on_column(sql38, duck):
    _match(
        sql38, duck,
        "SELECT i, d + (INTERVAL 1 MONTH + INTERVAL 1 DAY) AS m"
        " FROM b38t ORDER BY i",
    )


# --- pins: surfaces probed and found already-green -----------------------------


@pytest.mark.parametrize("sql", [
    # grouping sets NULL-vs-absent + GROUPING()
    "SELECT g, v % 2 AS p, count(*) AS n FROM b38t GROUP BY GROUPING"
    " SETS ((g), (v % 2), ()) ORDER BY 1 NULLS LAST, 2 NULLS LAST, 3",
    "SELECT g, GROUPING(g) AS gg, count(*) AS n FROM b38t GROUP BY"
    " ROLLUP (g) ORDER BY 1 NULLS LAST, 2",
    "SELECT g, v, count(*) AS n FROM b38t GROUP BY CUBE (g, v)"
    " ORDER BY 1 NULLS LAST, 2 NULLS LAST, 3",
    # correlated subqueries (the COUNT-bug class: zero-match groups
    # must read 0, not NULL/absent)
    "SELECT i, (SELECT count(*) FROM b38t x WHERE x.v = b38t.v AND"
    " x.i < b38t.i) AS c FROM b38t ORDER BY i",
    "SELECT g, (SELECT count(*) FROM b38t x WHERE x.g = y.g AND"
    " x.v > 99) AS c FROM (SELECT DISTINCT g FROM b38t) y ORDER BY g",
    "SELECT i FROM b38t WHERE v > (SELECT avg(v) FROM b38t x WHERE"
    " x.g = b38t.g) ORDER BY i",
    "SELECT i, EXISTS (SELECT 1 FROM b38t x WHERE x.i = b38t.i + 1)"
    " AS e FROM b38t ORDER BY i",
])
def test_already_green_surfaces_pinned(sql38, duck, sql):
    _match(sql38, duck, sql)


def test_arg_max_tie_is_engine_defined_but_valid(sql38, duck):
    """Fuzz finding (round 11): with TIES in the ranking expression,
    DuckDB's arg_max/arg_min keep the FIRST row in scan order (probed:
    strictly-greater replacement), which no distributed engine can
    reproduce — Spark's max_by tie choice is partition-order-defined.
    Engine-defined acceptance, pinned: each engine's answer must be a
    MEMBER of its group's tied argmax set (the tie-free case matches
    exactly — a11's oracle has pinned it since round 1)."""
    # b38t: v = i % 5 over 8 rows -> v=0..2 tie twice within g groups
    q = "SELECT g, arg_max(CAST(i AS VARCHAR), v % 2) AS a FROM b38t GROUP BY g"
    valid_q = (
        "SELECT g, CAST(i AS VARCHAR) FROM b38t x WHERE v % 2 ="
        " (SELECT max(v % 2) FROM b38t y WHERE y.g = x.g)"
    )
    valid = {}
    for g, i in duck.execute(valid_q).fetchall():
        valid.setdefault(g, set()).add(i)
    with serving_dialect(True):
        ours = {r["g"]: r["a"] for r in run_sql(sql38, q).collect()}
    theirs = dict(duck.execute(q).fetchall())
    for g, a in ours.items():
        assert a in valid[g], (g, a, valid[g])
    for g, a in theirs.items():
        assert a in valid[g], (g, a, valid[g])


# --- fmt-style format() (round-11 hunt finding: previously UNRESOLVED) --------


@pytest.mark.parametrize("sql", [
    "SELECT format('{}|{:>6}|{:.2f}', 42, 'F', 3.14159) AS v",
    "SELECT format('{}', 1.50) AS v",
    "SELECT format('{}', 1.500) AS v",
    "SELECT format('{}', 42.00) AS v",
    "SELECT format('{}', -3.1400) AS v",
    "SELECT format('{}', 10.05) AS v",
    "SELECT format('{:d}', 255) AS v",
    "SELECT format('{:x}', 255) AS v",
    "SELECT format('{:X}', 255) AS v",
    "SELECT format('{:08.3f}', 3.14159) AS v",
    "SELECT format('{:<5}|', 'ab') AS v",
    "SELECT format('{1} {0}', 'a', 'b') AS v",
    "SELECT format('{0}-{0}', 'x') AS v",
    "SELECT format('{{}} {}', 7) AS v",
    "SELECT format('{:,}', 1234567) AS v",
    "SELECT format('{}', NULL) AS v",
    "SELECT format('{}', true) AS v",
    "SELECT format('100%% {}', 1) AS v",
    "SELECT format('plain') AS v",
    "SELECT format('{}', DATE '2024-01-05') AS v",
])
def test_format_fmt_style(sql38, duck, sql):
    _match(sql38, duck, sql)


def test_format_on_columns(sql38, duck):
    _match(
        sql38, duck,
        "SELECT format('i={} g={:>4}', i, g) AS v FROM b38t"
        " ORDER BY i",
    )


def test_format_significant_digits_now_supported(sql38, duck):
    # {:.3} is SIGNIFICANT digits in fmt, not %.3f — fail-closed in
    # round 11; battery 39 (round 12) landed the probed lowering
    # (dialect_rewrites/breadth.py _fmt_sig_sql). The full grid lives
    # in tests/test_r12_dialect_b39.py; this pin guards the flip.
    _match(sql38, duck, "SELECT format('{:.3}', 3.14159) AS v")
