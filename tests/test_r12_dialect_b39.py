"""Dialect probe battery 39 — probed against live DuckDB 1.0
(VERDICT r11 item 4's hunt list: collation in ORDER BY vs comparisons,
TIME arithmetic corners, struct field-name case sensitivity, list_sort
custom NULL placement, and the ``{:.N}`` significant-digit format gap
left fail-closed in round 11).

Found and fixed this round:

* ``format('{:.N}', x)`` — fmt's none-type SIGNIFICANT-digit general
  format, now lowered by _fmt_sig_sql (dialect_rewrites/breadth.py):
  scientific keeps zeros ('1.00e+20'), fixed >= 1 pads to N
  ('2.0' -> '2.00') with at least one fraction digit ('120.0'), fixed
  < 1 strips zeros ('0.5'), and the bundled fmt's leading-zero CLAMP
  is reproduced bug-compatibly ('{:.1}' of 0.002 AND of 0.0002 both
  print '0.02' — the first significant digit never lands deeper than
  fraction position N+1). 336/336 on the probe grid.
* ``format('{:.Ns}' / '{:Ws}')`` string truncation — strings LEFT-align
  by default where numbers right-align.
* ``format('{:.Ne}', x)`` — scientific with explicit precision.
* ``list_reverse_sort(l, 'NULLS FIRST'|'NULLS LAST')`` two-arg form.

Probed and found already green (pinned below): expression-level and
ORDER BY COLLATE NOCASE, TIME ± INTERVAL wrap-around, DATE + TIME,
struct field-name case-insensitivity in access and comparisons,
list_sort direction + null-order.

Pinned residuals (engine-defined acceptances, documented at
_fmt_sig_sql): pseudo-decimal-ties ('{:.1}' of 0.95 — fmt rounds the
exact binary 0.9499…, every JVM decimal path sees the shortest repr
'0.95'), subnormals, and {:.N} on INTEGER arguments (DuckDB errors
"precision not allowed", the engine formats the cast double — a
success where DuckDB errors, never a silent wrong answer on a
DuckDB-valid query).
"""

from __future__ import annotations

import pytest

from duckdb_server_spark.dialect import (
    register_dialect_functions,
    run_sql,
    serving_dialect,
)


@pytest.fixture(scope="module")
def sql39(spark, duck, sf_dir):
    from duckdb_server_spark.session import register_views

    register_dialect_functions(spark)
    register_views(spark, sf_dir, ("orders",))
    return spark


def _match(spark, duck, sql: str):
    theirs = duck.execute(sql).fetchall()
    with serving_dialect(True):
        ours = [tuple(r) for r in run_sql(spark, sql).collect()]
    a = sorted([str(x) for x in r] for r in ours)
    b = sorted([str(x) for x in r] for r in theirs)
    assert a == b, f"{sql!r}: {ours[:4]} != {theirs[:4]}"


# --- {:.N} significant digits ------------------------------------------------

_SIG_VALUES = [
    "2.0", "120.0", "0.5", "1234.5678", "999.5", "0.000999", "1e20",
    "-0.000012345", "0.25", "0.125", "0.333333", "0.0625", "2.5",
    "-42.42", "1e-4", "0.002", "0.0002", "0.00099", "0.0015", "0.019",
    "0.0999", "0.00999", "0.99", "6.02e23", "0.0", "1e300", "1e-300",
    "123456.0", "98765.4321", "-2.718281828",
]


@pytest.mark.parametrize("val", _SIG_VALUES)
@pytest.mark.parametrize("p", [1, 3, 6])
def test_sig_digits_grid(sql39, duck, val, p):
    _match(sql39, duck,
           f"SELECT format('{{:.{p}}}', CAST({val} AS DOUBLE)) AS v")


@pytest.mark.parametrize("sql", [
    # width/alignment composes with the significant-digit rendering
    "SELECT format('{:12.3}', 0.002) || '|' AS v",
    "SELECT format('{:<12.3}', 1234.5678) || '|' AS v",
    "SELECT format('{:>9.2}', 0.5) || '|' AS v",
    # NULL propagates
    "SELECT format('{:.3}', CAST(NULL AS DOUBLE)) AS v",
    # explicit-precision scientific
    "SELECT format('{:.3e}', 1234.5678) AS v",
    "SELECT format('{:.1e}', 0.00012345) AS v",
    # string truncation; strings LEFT-align by default
    "SELECT format('{:.4}', 'abcdefg') AS v",
    "SELECT format('{:8.4}', 'abcdefg') || '|' AS v",
    "SELECT format('{:>8.4}', 'abcdefg') || '|' AS v",
    "SELECT format('{:s}|{:.2}', 'xy', 99.345) AS v",
    "SELECT format('{:6s}', 'ab') || '|' AS v",
])
def test_format_spec_corners(sql39, duck, sql):
    _match(sql39, duck, sql)


def test_sig_digits_on_column(sql39, duck):
    _match(
        sql39, duck,
        "SELECT format('{:.3}', o_totalprice / 7) AS v"
        " FROM orders WHERE o_orderkey <= 512 ORDER BY o_orderkey",
    )


def test_sig_digits_small_column(sql39, duck):
    # exercises the leading-zero clamp region on real data
    _match(
        sql39, duck,
        "SELECT format('{:.1}', o_totalprice / 100000000) AS v"
        " FROM orders WHERE o_orderkey <= 512 ORDER BY o_orderkey",
    )


def test_sig_zero_precision_fails_closed(sql39, duck):
    # fmt's {:.0} prints magnitude-only ('1000') — out of the subset
    with serving_dialect(True):
        with pytest.raises(Exception, match="UNRESOLVED|format"):
            run_sql(sql39, "SELECT format('{:.0}', 1234.5) AS v").collect()


def test_pseudo_tie_residual_is_pinned(sql39, duck):
    # DOCUMENTED divergence (not a silent unknown): 0.95's binary value
    # is 0.9499… so fmt rounds DOWN; the JVM's decimal paths all see
    # the shortest repr '0.95' and round half-even UP. If either side
    # ever changes, this pin fails and the acceptance gets re-audited.
    assert duck.execute(
        "SELECT format('{:.1}', CAST(0.95 AS DOUBLE))").fetchone()[0] == "0.9"
    with serving_dialect(True):
        ours = run_sql(
            sql39, "SELECT format('{:.1}', CAST(0.95 AS DOUBLE)) AS v"
        ).collect()[0].v
    assert ours == "1.0"
    # exact binary ties agree (half-even on both sides)
    for val, want in [("0.25", "0.2"), ("2.5", "2.5"), ("0.125", "0.1")]:
        _match(sql39, duck,
               f"SELECT format('{{:.1}}', CAST({val} AS DOUBLE)) AS v")


def test_int_precision_acceptance(sql39, duck):
    # DuckDB: "precision not allowed for this argument type"; the
    # engine formats the cast double — success where DuckDB errors
    import duckdb as _duckdb

    with pytest.raises(_duckdb.Error):
        duck.execute("SELECT format('{:.3}', 1234)")
    with serving_dialect(True):
        v = run_sql(sql39, "SELECT format('{:.3}', 1234) AS v").collect()
    assert v[0].v == "1.23e+03"


# --- list_reverse_sort null placement -----------------------------------------

@pytest.mark.parametrize("sql", [
    "SELECT list_reverse_sort([3, NULL, 1], 'NULLS LAST') AS v",
    "SELECT list_reverse_sort([3, NULL, 1], 'NULLS FIRST') AS v",
    "SELECT list_reverse_sort([o_orderkey % 7, NULL, 3], 'NULLS FIRST')[1] AS v"
    " FROM orders WHERE o_orderkey <= 64",
    # already-green 3-arg list_sort pins
    "SELECT list_sort([3, NULL, 1], 'DESC', 'NULLS FIRST') AS v",
    "SELECT list_sort([3, NULL, 1], 'ASC', 'NULLS LAST') AS v",
    "SELECT list_sort([3, NULL, 1], 'DESC') AS v",
    "SELECT list_sort([3, NULL, 1]) AS v",
])
def test_list_sort_null_placement(sql39, duck, sql):
    _match(sql39, duck, sql)


# --- probed already green: collation, TIME, struct field case -----------------

@pytest.mark.parametrize("sql", [
    # expression-level NOCASE on either side of the comparison
    "SELECT 'a' < 'B' AS x, 'a' COLLATE NOCASE < 'B' AS y,"
    " 'a' < 'B' COLLATE NOCASE AS z",
    # NOCASE sort key with a deterministic tiebreak
    "SELECT x FROM (VALUES ('b'),('A'),('a'),('B')) t(x)"
    " ORDER BY x COLLATE NOCASE, x",
    # TIME wraps around midnight in both directions
    "SELECT TIME '23:30:00' + INTERVAL 90 MINUTE AS t",
    "SELECT TIME '01:00:00' - INTERVAL 2 HOUR AS t",
    "SELECT TIME '22:45:00' + INTERVAL (o_orderkey % 11 * 37) MINUTE AS t"
    " FROM orders WHERE o_orderkey <= 64",
    "SELECT TIME '01:15:00' - INTERVAL (o_orderkey % 7) HOUR AS t"
    " FROM orders WHERE o_orderkey <= 64",
    # DATE + TIME composes a timestamp
    "SELECT DATE '2020-01-01' + TIME '10:30:00' AS t",
    # struct field names are case-insensitive in access and comparison
    "SELECT ({'A': 1, 'b': 2}).a AS f1, ({'A': 1, 'b': 2}).\"B\" AS f2",
    "SELECT {'A': 1} = {'a': 1} AS e, {'A': 1} < {'a': 2} AS lt",
    "SELECT CASE WHEN {'Qty': o_orderkey % 4} = {'qty': 1} THEN 'hit'"
    " ELSE 'miss' END AS v FROM orders WHERE o_orderkey <= 64",
])
def test_already_green_surfaces_pinned(sql39, duck, sql):
    _match(sql39, duck, sql)
