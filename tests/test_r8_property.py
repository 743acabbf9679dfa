"""Hypothesis properties for the round-8 rewrite surface (batteries
7-9): the new masked-text rewrites are regex/scanner code whose failure
mode is silent corruption of neighboring SQL, so each gets a generative
differential property against live DuckDB, not just example pins.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from duckdb_server_spark.dialect import (
    register_dialect_functions,
    run_sql,
    serving_dialect,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sql_session(spark):
    from duckdb_server_spark.session import register_views

    register_dialect_functions(spark)
    register_views(spark, SF_DIR, ("nation", "orders"))
    return spark


def _both(spark, duck, sql: str):
    with serving_dialect(True):
        ours = sorted(tuple(r) for r in run_sql(spark, sql).collect())
    theirs = sorted(duck.execute(sql).fetchall())
    return ours, theirs


_S = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --- underscore numerics: value-preserving, identifier-safe ----------------


@_S
@given(
    n=st.integers(min_value=0, max_value=10**12),
    frac=st.integers(min_value=0, max_value=999_999),
)
def test_underscored_integers_match(sql_session, duck, n, frac):
    # group digits with underscores every 3 from the right
    def grp(x: int) -> str:
        s = str(x)
        out = []
        while len(s) > 3:
            out.append(s[-3:])
            s = s[:-3]
        out.append(s)
        return "_".join(reversed(out))

    sql = f"SELECT {grp(n)} AS i, {grp(n)}.{frac:06d} AS f, {grp(n)} + 1 AS j"
    ours, theirs = _both(sql_session, duck, sql)
    assert ours == theirs, sql


@_S
@given(suffix=st.integers(min_value=0, max_value=99))
def test_underscored_identifiers_untouched(sql_session, duck, suffix):
    # aliases containing digit_digit runs must never be rewritten
    alias = f"k{suffix}_1{suffix}"
    sql = f"SELECT n_nationkey AS {alias} FROM nation ORDER BY {alias} LIMIT 3"
    ours, theirs = _both(sql_session, duck, sql)
    assert ours == theirs, sql


# --- TIME ± INTERVAL folding: matches DuckDB across the whole day ----------


@_S
@given(
    h=st.integers(min_value=0, max_value=23),
    mi=st.integers(min_value=0, max_value=59),
    sec=st.integers(min_value=0, max_value=59),
    amount=st.integers(min_value=-5000, max_value=5000),
    unit=st.sampled_from(["MINUTE", "SECOND", "HOUR"]),
    op=st.sampled_from(["+", "-"]),
)
def test_time_interval_fold_matches(sql_session, duck, h, mi, sec, amount, unit, op):
    if amount < 0:
        return  # interval literals take unsigned counts in this form
    sql = f"SELECT TIME '{h:02d}:{mi:02d}:{sec:02d}' {op} INTERVAL {amount} {unit} AS t"
    ours, theirs = _both(sql_session, duck, sql)
    assert ours == theirs, sql


# --- date_diff boundary semantics across random date pairs -----------------


@_S
@given(
    d1=st.dates(min_value=__import__("datetime").date(1990, 1, 1),
                max_value=__import__("datetime").date(2030, 12, 28)),
    d2=st.dates(min_value=__import__("datetime").date(1990, 1, 1),
                max_value=__import__("datetime").date(2030, 12, 28)),
    unit=st.sampled_from(
        ["year", "quarter", "month", "week", "day", "decade", "century"]
    ),
)
def test_date_diff_random_dates(sql_session, duck, d1, d2, unit):
    sql = f"SELECT date_diff('{unit}', DATE '{d1}', DATE '{d2}') AS d"
    ours, theirs = _both(sql_session, duck, sql)
    assert ours == theirs, sql


@_S
@given(
    base=st.integers(min_value=0, max_value=86_399),
    delta=st.integers(min_value=-7200, max_value=7200),
    unit=st.sampled_from(["hour", "minute", "second"]),
)
def test_date_diff_random_times(sql_session, duck, base, delta, unit):
    import datetime as _dt

    a = _dt.datetime(2024, 6, 15) + _dt.timedelta(seconds=base)
    b = a + _dt.timedelta(seconds=delta)
    sql = (
        f"SELECT date_diff('{unit}', TIMESTAMP '{a}', TIMESTAMP '{b}') AS d"
    )
    ours, theirs = _both(sql_session, duck, sql)
    assert ours == theirs, sql


# --- stepped slices over random windows ------------------------------------


@_S
@given(
    n=st.integers(min_value=1, max_value=9),
    a=st.integers(min_value=1, max_value=10),
    b=st.integers(min_value=-1, max_value=12).filter(lambda x: x != 0),
    c=st.integers(min_value=1, max_value=4),
)
def test_stepped_slice_random(sql_session, duck, n, a, b, c):
    arr = "[" + ", ".join(str(i * 10) for i in range(1, n + 1)) + "]"
    sql = f"SELECT list_slice({arr}, {a}, {b}, {c}) AS s"
    ours, theirs = _both(sql_session, duck, sql)
    assert ours == theirs, sql


# --- typed literals: value equivalence on random numerics ------------------


@_S
@given(
    v=st.decimals(
        min_value=-(10**14), max_value=10**14, places=3, allow_nan=False
    ),
    ty=st.sampled_from(["DECIMAL", "DOUBLE", "BIGINT", "INTEGER"]),
)
def test_typed_literal_random(sql_session, duck, v, ty):
    if ty in ("BIGINT", "INTEGER"):
        v = int(v)
        if ty == "INTEGER" and not (-(2**31) < v < 2**31):
            return
    sql = f"SELECT {ty} '{v}' AS x"
    ours, theirs = _both(sql_session, duck, sql)
    assert ours == theirs, sql


# --- battery 14: age() across random date/timestamp pairs ------------------


@_S
@given(
    d1=st.dates(min_value=__import__("datetime").date(1992, 1, 1),
                max_value=__import__("datetime").date(2030, 12, 28)),
    d2=st.dates(min_value=__import__("datetime").date(1992, 1, 1),
                max_value=__import__("datetime").date(2030, 12, 28)),
    t1=st.integers(min_value=0, max_value=86_399),
    t2=st.integers(min_value=0, max_value=86_399),
    use_ts=st.booleans(),
)
def test_age_random_pairs(sql_session, duck, d1, d2, t1, t2, use_ts):
    if use_ts:
        a = f"TIMESTAMP '{d1} {t1 // 3600:02d}:{t1 % 3600 // 60:02d}:{t1 % 60:02d}'"
        b = f"TIMESTAMP '{d2} {t2 // 3600:02d}:{t2 % 3600 // 60:02d}:{t2 % 60:02d}'"
    else:
        a, b = f"DATE '{d1}'", f"DATE '{d2}'"
    sql = f"SELECT age({a}, {b}) AS x"
    ours, theirs = _both(sql_session, duck, sql)
    assert ours == theirs, sql


# --- battery 14: time_bucket across random widths/inputs -------------------


@_S
@given(
    d=st.dates(min_value=__import__("datetime").date(1995, 1, 1),
               max_value=__import__("datetime").date(2030, 12, 28)),
    secs=st.integers(min_value=0, max_value=86_399),
    n=st.integers(min_value=1, max_value=40),
    unit=st.sampled_from(
        ["minute", "hour", "day", "week", "month", "quarter", "year"]
    ),
)
def test_time_bucket_random(sql_session, duck, d, secs, n, unit):
    ts = f"TIMESTAMP '{d} {secs // 3600:02d}:{secs % 3600 // 60:02d}:{secs % 60:02d}'"
    sql = f"SELECT time_bucket(INTERVAL {n} {unit.upper()}, {ts}) AS b"
    ours, theirs = _both(sql_session, duck, sql)
    assert ours == theirs, sql
    sql = f"SELECT time_bucket(INTERVAL {n} {unit.upper()}, DATE '{d}') AS b"
    if unit in ("minute", "hour") and 86_400 % (
        n * (60 if unit == "minute" else 3600)
    ):
        return  # sub-day width not dividing a day: date input fails closed
    ours, theirs = _both(sql_session, duck, sql)
    assert ours == theirs, sql


# --- battery 14: dynamic INTERVAL arithmetic -------------------------------


@_S
@given(
    d=st.dates(min_value=__import__("datetime").date(1995, 1, 1),
               max_value=__import__("datetime").date(2030, 12, 1)),
    n=st.integers(min_value=-500, max_value=500),
    unit=st.sampled_from(["DAY", "HOUR", "MINUTE", "MONTH", "YEAR"]),
)
def test_dynamic_interval_random(sql_session, duck, d, n, unit):
    sql = f"SELECT DATE '{d}' + INTERVAL ({n}) {unit} AS x"
    ours, theirs = _both(sql_session, duck, sql)
    assert ours == theirs, sql
