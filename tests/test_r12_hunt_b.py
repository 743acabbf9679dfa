"""Round-12 fuzz-hunt battery B pins (67 differential probes over
list_aggregate / higher-order list functions, string similarity
functions, cast corners, aggregate corners, and datetime round B).

Silent wrong answers FOUND AND FIXED:

* ``list_aggregate(l, 'sum'/'avg')`` — SQL aggregate NULL semantics:
  DuckDB skips NULL elements and returns NULL for empty/all-NULL
  lists; the old lambda propagated NULLs and returned 0.0 on empty.
  sum's zero is now element-typed, so integer lists stay integral;
* ``list_intersect`` — DuckDB excludes a shared NULL ([1,2,NULL] ∩
  [2,3,NULL] = [2]); Spark's array_intersect keeps it;
* ``list_zip`` — pads with NULLs and keeps element types as structs
  (the old lowering forced DOUBLE pairs-as-arrays);
* ``any_value`` — DuckDB returns the first NON-NULL value;
* string→integer casts — DuckDB parses through DECIMAL and rounds
  half-up away from zero ('12.7' → 13, '1e3' → 1000, '0x1A' → 26);
  literal CASTs fold exactly at rewrite time, TRY_CAST gains a
  rounding fallback branch that only fires where the native try is
  NULL (integer-string exactness preserved).

Documented acceptances (value-equal, client-representation only):
list_zip collects as Row structs vs DuckDB tuples; timezone() returns
a session-zone naive datetime where DuckDB's client attaches tzinfo.
"""

from __future__ import annotations

import pytest

from duckdb_server_spark.dialect import (
    register_dialect_functions,
    run_sql,
    serving_dialect,
)


@pytest.fixture(scope="module")
def sqlB(spark, duck):
    register_dialect_functions(spark)
    return spark


def _match(spark, duck, sql: str):
    theirs = duck.execute(sql).fetchall()
    with serving_dialect(True):
        ours = [tuple(r) for r in run_sql(spark, sql).collect()]
    a = sorted([str(x) for x in r] for r in ours)
    b = sorted([str(x) for x in r] for r in theirs)
    assert a == b, f"{sql!r}: {ours[:4]} != {theirs[:4]}"


@pytest.mark.parametrize("sql", [
    "SELECT list_aggregate([1,2,NULL,4], 'sum') AS v",
    "SELECT list_aggregate([], 'sum') AS v",
    "SELECT list_aggregate([NULL], 'sum') AS v",
    "SELECT list_aggregate([1.5, 2.25], 'sum') AS v",
    "SELECT list_aggregate([1,2,NULL,4], 'min') AS a,"
    " list_aggregate([1,2,NULL,4], 'max') AS b",
    "SELECT list_aggregate([1.0,2.0,4.0], 'avg') AS v",
    "SELECT list_aggregate([1,NULL,3], 'avg') AS v",
    "SELECT list_aggregate([NULL], 'count') AS v",
    "SELECT list_sum([1,2,NULL,4]) AS v",
    "SELECT list_avg([2,NULL,4]) AS v",
])
def test_list_aggregate_null_semantics(sqlB, duck, sql):
    _match(sqlB, duck, sql)


@pytest.mark.parametrize("sql", [
    "SELECT list_intersect([1,2,NULL],[2,3,NULL]) AS v",
    "SELECT list_intersect([1,2],[3,4]) AS v",
    "SELECT any_value(x) AS v FROM (VALUES (NULL),(7)) t(x)",
    "SELECT any_value(x) AS v FROM (VALUES (NULL)) t(x)",
])
def test_list_intersect_and_any_value(sqlB, duck, sql):
    _match(sqlB, duck, sql)


def test_list_intersect_element_order_engine_defined(sqlB, duck):
    # DuckDB's intersection ORDER is its internal hash-set iteration
    # ([1,1,2] ∩ [1,2] observed as [2,1]) — engine-defined acceptance;
    # the SET of elements must agree
    with serving_dialect(True):
        ours = run_sql(
            sqlB, "SELECT list_intersect([1,1,2],[1,2]) AS v"
        ).collect()[0].v
    theirs = duck.execute(
        "SELECT list_intersect([1,1,2],[1,2])").fetchone()[0]
    assert sorted(ours) == sorted(theirs) == [1, 2]


def test_list_zip_values_and_padding(sqlB, duck):
    # pairs ride as ARRAYS (DuckDB's structs subscript positionally,
    # so array pairs keep p[i] consumers working — b10/b60 oracles);
    # the VALUES must agree: ints stay ints, shorter side pads NULL
    with serving_dialect(True):
        ours = run_sql(sqlB, "SELECT list_zip([1,2],[3,4,5]) AS v").collect()
    got = [tuple(p) for p in ours[0].v]
    want = duck.execute("SELECT list_zip([1,2],[3,4,5])").fetchone()[0]
    assert got == [tuple(p) for p in want]


def test_list_zip_truncate_flag_fails_closed(sqlB, duck):
    with serving_dialect(True):
        with pytest.raises(Exception, match="truncate|list_zip"):
            run_sql(sqlB,
                    "SELECT list_zip([1,2],[3,4,5], true) AS v").collect()


@pytest.mark.parametrize("sql", [
    "SELECT CAST('12.7' AS INT) AS v",
    "SELECT CAST('12.5' AS INT) AS a, CAST('-12.5' AS INT) AS b",
    "SELECT CAST('13.5' AS BIGINT) AS v",
    "SELECT CAST(' 42 ' AS INT) AS v",
    "SELECT '12.7'::INT AS v",
    "SELECT try_cast('12.7' AS INT) AS v",
    "SELECT try_cast('1e3' AS INT) AS v",
    "SELECT try_cast('abc' AS INT) AS v",
    "SELECT try_cast('inf' AS INT) AS v",
    "SELECT try_cast('1e20' AS INT) AS v",
    # integer strings keep exactness through the native branch
    "SELECT try_cast('9007199254740993' AS BIGINT) AS v",
    # column expressions route through the fallback too
    "SELECT try_cast(x AS INT) AS v FROM (VALUES ('12.7'),('8'),('no')) t(x)",
])
def test_string_int_cast_rounding(sqlB, duck, sql):
    _match(sqlB, duck, sql)


@pytest.mark.parametrize("sql", [
    # probed clean in the same sweep — pinned against drift
    "SELECT list_reduce([1,2,3,4], (a,b) -> a + b) AS v",
    "SELECT list_unique([1,1,NULL,NULL,2]) AS v",
    "SELECT list_position([4,NULL,6], NULL) AS v",
    "SELECT damerau_levenshtein('abc','acb') AS v",
    "SELECT jaro_winkler_similarity('martha','marhta') AS v",
    "SELECT median(x) AS v FROM (VALUES (1),(2),(3),(4)) t(x)",
    "SELECT mode(x) AS v FROM (VALUES (1),(2),(2),(3)) t(x)",
    "SELECT product(x) AS v FROM (VALUES (2),(3),(4)) t(x)",
    "SELECT bit_xor(x) AS v FROM (VALUES (12),(10)) t(x)",
    "SELECT entropy(x) AS v FROM (VALUES (1),(1),(2),(2)) t(x)",
    "SELECT age(TIMESTAMP '2001-04-10', TIMESTAMP '1957-06-13') AS v",
    "SELECT time_bucket(INTERVAL 15 MINUTE,"
    " TIMESTAMP '2024-01-01 10:37:00') AS v",
    "SELECT date_diff('month', DATE '2024-01-31', DATE '2024-02-01') AS v",
    "SELECT strftime(DATE '2024-03-05', '%A %B %-d, %Y') AS v",
    "SELECT epoch_ms(TIMESTAMP '2024-01-01 00:00:01.5') AS v",
])
def test_probed_clean_pinned(sqlB, duck, sql):
    _match(sqlB, duck, sql)
