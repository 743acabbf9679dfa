"""Round-13 fuzz-hunt battery F pins (VERDICT r12 item 1): MAP
functions, DISTINCT ON under the null-default pass, correlated
aggregates in HAVING, COLLATE inside expressions, TIME / timestamptz
arithmetic, GROUPING SETS, struct/list comparison — ~110 live
differential probes against DuckDB 1.0.

Silent wrong answers / coverage gaps FOUND AND FIXED this round:

* ``map_concat`` on duplicate keys — DuckDB LAST-WINS keeping the
  first occurrence's position; Spark's native map_concat raises
  DUPLICATED_MAP_KEY. Lowered to an index-free entries fold
  (breadth.py _template map_concat branch). Map LITERALS with
  duplicate keys error on BOTH engines, so no global dedup policy.
* COLLATE inside expressions beyond plain comparisons — probed on live
  1.0 and implemented per context: IN/NOT IN lists key every element;
  BETWEEN keys all three operands ('b' NOCASE BETWEEN 'A' AND 'C' is
  true where the bytewise compare is false); simple-CASE operands key
  every WHEN arm; min/max select the extremum UNDER the collation
  (ties are scan-order-dependent in DuckDB → engine-defined here);
  nullif and arg_max/arg_min/max_by/min_by compare under it; while
  upper/substr/||/greatest/least/string_agg/count(DISTINCT) IGNORE the
  annotation (collation does not propagate through value functions) —
  an explicit probed strip-list, everything else still fails closed.
* ``date_diff``/``datediff`` over TIME literals — boundary-crossing
  counts (floor(b/u) − floor(a/u), signed); ``date_sub`` — elapsed
  full units truncated toward zero. Both fold at rewrite time (Spark
  cannot cast TIME to TIMESTAMP). Date-granular units error on TIME in
  DuckDB; they stay unfolded → a visible error, never a silent value.
* ``date_part('epoch', x)`` / ``datepart`` — the epoch field existed
  for EXTRACT and epoch() but not the date_part spelling; now the same
  fractional-seconds DOUBLE, with TIME literals folding to
  seconds-since-midnight.
* parenthesized COLLATE groups — ``('a' COLLATE NOCASE) = 'A'`` and
  ``(… ) || …`` apply the group's outer context (the back-scan now
  treats clause keywords before '(' as plain groups, not calls).

Accepted representation divergence (pinned with canonicalization
below): DuckDB's client returns TIMESTAMPTZ as tz-AWARE UTC datetimes;
Spark returns the same instant as a naive datetime in the UTC session
zone. Same instant, different repr — compared here after folding both
to naive UTC.
"""

from __future__ import annotations

import datetime

import pytest

from duckdb_server_spark.dialect import (
    register_dialect_functions,
    run_sql,
    serving_dialect,
)


@pytest.fixture(scope="module")
def sqlf(spark, duck, sf_dir):
    register_dialect_functions(spark)
    import os
    for name in ("region", "nation", "orders"):
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(name)
    return spark


def _canon(v):
    """Fold engine client representations: DuckDB MAP dict-of-lists →
    items; tz-aware datetimes → naive UTC; Rows → tuples."""
    if isinstance(v, dict):
        if set(v.keys()) == {"key", "value"} and isinstance(
                v.get("key"), list):
            v = dict(zip(v["key"], v["value"]))
        return tuple(sorted((str(k), _canon(x)) for k, x in v.items()))
    if hasattr(v, "asDict"):
        return _canon(v.asDict())
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, datetime.datetime) and v.tzinfo is not None:
        return str(v.astimezone(datetime.timezone.utc)
                   .replace(tzinfo=None))
    return str(v)


def _match(spark, duck, sql: str):
    theirs = duck.execute(sql).fetchall()
    with serving_dialect(True):
        ours = [tuple(r) for r in run_sql(spark, sql).collect()]
    a = sorted([_canon(x) for x in r] for r in ours)
    b = sorted([_canon(x) for x in r] for r in theirs)
    assert a == b, f"{sql!r}: {ours[:4]} != {theirs[:4]}"


@pytest.mark.parametrize("sql", [
    # --- MAP type ------------------------------------------------------
    "SELECT MAP {'a': 1, 'b': 2} AS m",
    "SELECT map_keys(MAP {'a': 1, 'b': 2}) AS v",
    "SELECT map_values(MAP {'a': 1, 'b': 2}) AS v",
    "SELECT map_entries(MAP {'a': 1, 'b': 2}) AS v",
    "SELECT cardinality(MAP {'a': 1, 'b': 2}) AS v",
    "SELECT MAP {'a': 1, 'b': 2}['a'] AS v",
    "SELECT MAP {'a': 1, 'b': 2}['z'] AS v",
    "SELECT element_at(MAP {'a': 1, 'b': 2}, 'b') AS v",
    "SELECT map_from_entries([{'k': 'x', 'v': 1}, {'k': 'y', 'v': 2}]) AS v",
    "SELECT map([1, 2], ['x', 'y']) AS v",
    "SELECT map()['a'] AS v",
    "SELECT map_extract(MAP {'a': 1, 'b': 2}, 'a') AS v",
    "SELECT MAP {1: 'one', 5: 'five'}[5] AS v",
    # map_concat last-win (the found bug)
    "SELECT map_concat(MAP {'a': 1}, MAP {'b': 2}) AS v",
    "SELECT map_concat(MAP {'a': 1, 'b': 9}, MAP {'b': 2}) AS v",
    "SELECT map_keys(map_concat(MAP {'a': 1, 'b': 9}, MAP {'b': 2})) AS v",
    "SELECT map_values(map_concat(MAP {'a': 1, 'b': 9}, MAP {'b': 2})) AS v",
    "SELECT map_concat(MAP {'a': 1}, MAP {'b': 2}, MAP {'a': 7}) AS v",
    "SELECT map_values(map_concat(MAP {'a': 1}, MAP {'b': 2}, MAP {'a': 7})) AS v",
    "SELECT cardinality(map_concat(MAP {'a': 1, 'b': 9}, MAP {'b': 2})) AS v",
])
def test_map_probes(sqlf, duck, sql):
    _match(sqlf, duck, sql)


@pytest.mark.parametrize("sql", [
    "SELECT DISTINCT ON (n_regionkey) n_regionkey, n_name FROM nation ORDER BY n_regionkey, n_name",
    "SELECT DISTINCT ON (n_regionkey) n_regionkey, n_name FROM nation ORDER BY n_regionkey, n_name DESC",
    "SELECT DISTINCT ON (o_custkey % 5) o_custkey % 5 AS k, o_orderkey FROM orders ORDER BY o_custkey % 5, o_orderkey",
    "SELECT DISTINCT ON (r_regionkey % 2) r_regionkey % 2 AS k, r_name FROM region ORDER BY r_regionkey % 2, r_name DESC",
    # nullable sort keys under the r12 null-default pass
    "SELECT DISTINCT ON (x) x, y FROM (VALUES (1, 'a'), (NULL, 'b'), (1, 'c'), (NULL, 'd')) t(x, y) ORDER BY x, y",
    "SELECT DISTINCT ON (x) x, y FROM (VALUES (1, 'a'), (NULL, 'b'), (1, 'c'), (NULL, 'd')) t(x, y) ORDER BY x DESC, y",
])
def test_distinct_on_probes(sqlf, duck, sql):
    _match(sqlf, duck, sql)


@pytest.mark.parametrize("sql", [
    "SELECT n_regionkey, count(*) AS c FROM nation GROUP BY n_regionkey HAVING count(*) > (SELECT avg(cnt) FROM (SELECT count(*) AS cnt FROM nation GROUP BY n_regionkey) s) ORDER BY n_regionkey",
    "SELECT o_custkey, sum(o_totalprice) AS s FROM orders GROUP BY o_custkey HAVING sum(o_totalprice) > 1.5 * (SELECT avg(o_totalprice) FROM orders) * count(*) ORDER BY o_custkey LIMIT 5",
    "SELECT r_regionkey, (SELECT count(*) FROM nation WHERE n_regionkey = r_regionkey) AS c FROM region ORDER BY r_regionkey",
    "SELECT n_regionkey, max(n_nationkey) AS m FROM nation GROUP BY n_regionkey HAVING max(n_nationkey) > any(SELECT n_nationkey FROM nation WHERE n_regionkey = 0) ORDER BY n_regionkey",
])
def test_correlated_having_probes(sqlf, duck, sql):
    _match(sqlf, duck, sql)


@pytest.mark.parametrize("sql", [
    # comparisons (pre-existing) and the new contexts
    "SELECT 'HELLO' COLLATE NOCASE = 'hello' AS v",
    "SELECT CASE WHEN 'X' COLLATE NOCASE = 'x' THEN 1 ELSE 0 END AS v",
    "SELECT 'héllo' COLLATE NOACCENT = 'hello' AS v",
    "SELECT 'HÉLLO' COLLATE NOCASE.NOACCENT = 'hello' AS v",
    # IN / NOT IN with NULL three-valued logic
    "SELECT 'a' COLLATE NOCASE IN ('A', 'B') AS v",
    "SELECT 'a' COLLATE NOCASE NOT IN ('A', 'B') AS v",
    "SELECT 'c' COLLATE NOCASE IN ('A', 'B') AS v",
    "SELECT 'a' COLLATE NOCASE IN ('A', NULL) AS v",
    "SELECT 'c' COLLATE NOCASE IN ('A', NULL) AS v",
    # BETWEEN
    "SELECT 'b' COLLATE NOCASE BETWEEN 'A' AND 'C' AS v",
    "SELECT 'Foo' COLLATE NOCASE NOT BETWEEN 'fa' AND 'fz' AS v",
    # simple-CASE operand keys every arm
    "SELECT CASE 'A' COLLATE NOCASE WHEN 'a' THEN 1 ELSE 0 END AS v",
    "SELECT CASE 'z' COLLATE NOCASE WHEN 'a' THEN 1 WHEN 'Z' THEN 2 ELSE 0 END AS v",
    # min/max select under the collation (non-tie cases — ties are
    # scan-order-dependent in DuckDB, engine-defined here)
    "SELECT max(x COLLATE NOCASE) AS v FROM (VALUES ('a'), ('B')) t(x)",
    "SELECT max(x COLLATE NOCASE) AS v FROM (VALUES ('B'), ('a')) t(x)",
    "SELECT min(x COLLATE NOCASE) AS v FROM (VALUES ('b'), ('A')) t(x)",
    # nullif / arg_max compare under it
    "SELECT nullif('a' COLLATE NOCASE, 'A') AS v",
    "SELECT nullif('c' COLLATE NOCASE, 'A') AS v",
    "SELECT arg_max(x, x COLLATE NOCASE) AS v FROM (VALUES ('a'), ('B')) t(x)",
    # probed value functions IGNORE the annotation
    "SELECT upper(x COLLATE NOCASE) AS v FROM (VALUES ('a')) t(x)",
    "SELECT substr('AbCd' COLLATE NOCASE, 1, 2) = 'ab' AS v",
    "SELECT ('A' COLLATE NOCASE) || 'Z' AS v",
    "SELECT string_agg(x COLLATE NOCASE, ',') AS v FROM (VALUES ('b')) t(x)",
    "SELECT count(DISTINCT x COLLATE NOCASE) AS v FROM (VALUES ('a'), ('A'), ('b')) t(x)",
    "SELECT greatest('a' COLLATE NOCASE, 'B') AS v",
    # parenthesized group takes the outer context
    "SELECT ('a' COLLATE NOCASE) = 'A' AS v",
    "SELECT count(*) AS v FROM nation WHERE n_name COLLATE NOCASE = lower(n_name)",
])
def test_collate_probes(sqlf, duck, sql):
    _match(sqlf, duck, sql)


def test_collate_other_positions_still_fail_closed(sqlf):
    from duckdb_server_spark.dialect import DialectError

    with serving_dialect(True), pytest.raises(DialectError):
        # DISTINCT projection under collation picks a scan-order
        # representative in DuckDB — fail-closed, never silently wrong
        run_sql(
            sqlf,
            "SELECT DISTINCT x COLLATE NOCASE FROM "
            "(VALUES ('a'), ('A')) t(x)",
        ).collect()


@pytest.mark.parametrize("sql", [
    # TIME ± INTERVAL (pre-existing wrap) still green beside the new ops
    "SELECT TIME '11:30:00' + INTERVAL 2 HOUR AS v",
    "SELECT TIME '23:30:00' + INTERVAL 2 HOUR AS v",
    "SELECT TIME '01:30:00' - INTERVAL 3 HOUR AS v",
    # date_diff boundary counts over TIME
    "SELECT date_diff('minute', TIME '10:00:00', TIME '11:30:00') AS v",
    "SELECT date_diff('minute', TIME '11:30:59', TIME '10:00:00') AS v",
    "SELECT date_diff('hour', TIME '10:59:00', TIME '11:00:01') AS v",
    "SELECT date_diff('second', TIME '10:00:00.9', TIME '10:00:01.1') AS v",
    "SELECT date_diff('millisecond', TIME '10:00:00.0009', TIME '10:00:00.0011') AS v",
    "SELECT date_diff('microsecond', TIME '10:00:00', TIME '10:00:01') AS v",
    "SELECT datediff('minute', TIME '10:00:00', TIME '11:30:00') AS v",
    # date_sub elapsed counts over TIME (truncate toward zero)
    "SELECT date_sub('minute', TIME '10:00:30', TIME '11:30:00') AS v",
    "SELECT date_sub('minute', TIME '11:30:00', TIME '10:00:30') AS v",
    "SELECT date_sub('hour', TIME '10:00:00', TIME '09:00:01') AS v",
    # date_part epoch — all spellings
    "SELECT date_part('epoch', TIMESTAMP '2024-03-01 12:00:00') AS v",
    "SELECT date_part('epoch', DATE '2024-03-01') AS v",
    "SELECT date_part('epoch', TIME '10:00:30') AS v",
    "SELECT datepart('epoch', TIMESTAMP '2024-03-01 12:00:00') AS v",
    "SELECT date_part('epoch', TIMESTAMPTZ '2024-03-01 12:00:00+00') AS v",
    # timestamptz values compare as instants (canonicalized)
    "SELECT TIMESTAMPTZ '2024-03-01 12:00:00+00' AS v",
    "SELECT TIMESTAMPTZ '2024-03-01 12:00:00+02' - TIMESTAMPTZ '2024-03-01 10:00:00+00' AS v",
    "SELECT TIMESTAMP '2024-03-01 12:00:00' AT TIME ZONE 'UTC' AS v",
    "SELECT date_trunc('hour', TIMESTAMPTZ '2024-03-01 12:34:56+00') AS v",
    "SELECT date_diff('hour', TIMESTAMPTZ '2024-01-01 00:00:00+00', TIMESTAMPTZ '2024-01-02 03:00:00+00') AS v",
    "SELECT age(TIMESTAMP '2024-03-15 10:00:00', TIMESTAMP '2022-01-10 08:30:00') AS v",
    "SELECT TIME '10:11:12.345678' AS v",
    "SELECT TIMESTAMP '2024-02-29 12:00:00' + INTERVAL 1 YEAR AS v",
    "SELECT DATE '2024-01-31' + INTERVAL 1 MONTH AS v",
    "SELECT TIMESTAMP '2024-01-01 00:00:00' - INTERVAL '90' MINUTE AS v",
])
def test_time_tz_probes(sqlf, duck, sql):
    _match(sqlf, duck, sql)


@pytest.mark.parametrize("sql", [
    "SELECT n_regionkey, count(*) AS c FROM nation GROUP BY ROLLUP (n_regionkey) ORDER BY n_regionkey NULLS LAST",
    "SELECT n_regionkey, n_nationkey % 2 AS par, count(*) AS c FROM nation GROUP BY CUBE (n_regionkey, par) ORDER BY n_regionkey NULLS LAST, par NULLS LAST",
    "SELECT n_regionkey, grouping(n_regionkey) AS g, count(*) AS c FROM nation GROUP BY GROUPING SETS ((n_regionkey), ()) ORDER BY n_regionkey NULLS LAST",
])
def test_grouping_sets_probes(sqlf, duck, sql):
    _match(sqlf, duck, sql)


@pytest.mark.parametrize("sql", [
    "SELECT {'a': 1, 'b': 'x'} = {'a': 1, 'b': 'x'} AS v",
    "SELECT [1, 2, 3] < [1, 2, 4] AS v",
    "SELECT [1, 2] < [1, 2, 0] AS v",
    "SELECT [1, NULL] = [1, NULL] AS v",
    "SELECT {'a': NULL} = {'a': NULL} AS v",
    "SELECT list_sort([[2], [1, 0], []]) AS v",
    "SELECT [1, 2, 3] BETWEEN [1, 2] AND [2] AS v",
    "SELECT generate_series(1, 10, 3) AS v",
    "SELECT generate_series(5, 1, -2) AS v",
    "SELECT range(DATE '2024-01-01', DATE '2024-01-10', INTERVAL 3 DAY) AS v",
    "SELECT unnest(generate_series(1, 3)) AS v",
    "SELECT bit_count(255::BIGINT) AS v",
    "SELECT xor(5, 3) AS v",
    "SELECT 5 & 3 AS v, 5 | 3 AS w, ~5 AS x, 1 << 4 AS y, 256 >> 3 AS z",
    "SELECT gen_random_uuid() IS NOT NULL AS v",
    "SELECT uuid() != uuid() AS v",
])
def test_misc_probes(sqlf, duck, sql):
    _match(sqlf, duck, sql)


# --- wave 2 (round 13): decimal-cast truncation, interval fields,
# time_bucket offsets, aggregate ORDER BY, regex/string corners -------------

@pytest.mark.parametrize("sql", [
    # DECIMAL→DECIMAL literal casts TRUNCATE toward zero (the wave-2
    # silent wrong answer: Spark rounds HALF_UP)
    "SELECT CAST(1.955 AS DECIMAL(4,2)) AS v",
    "SELECT CAST(1.959 AS DECIMAL(4,2)) AS v",
    "SELECT CAST(-1.959 AS DECIMAL(4,2)) AS v",
    "SELECT 1.955::DECIMAL(4,2) AS v",
    "SELECT CAST(2.5 AS DECIMAL(3,0)) AS v",
    "SELECT CAST(1.9 AS DECIMAL(4,2)) AS v",
    "SELECT CAST(2 AS DECIMAL(4,2)) AS v",
    "SELECT CAST(1.955 AS DECIMAL(10,5)) AS v",
    "SELECT CAST(-0.005 AS DECIMAL(3,2)) AS v",
    # DOUBLE→DECIMAL and VARCHAR→DECIMAL round on BOTH engines
    "SELECT CAST(CAST(1.955 AS DOUBLE) AS DECIMAL(4,2)) AS v",
    "SELECT CAST('1.955' AS DECIMAL(4,2)) AS v",
    "SELECT 19.55::DECIMAL(3,1) + 1 AS v",
])
def test_decimal_cast_truncation(sqlf, duck, sql):
    _match(sqlf, duck, sql)


@pytest.mark.parametrize("sql", [
    # interval field extraction (hour NOT mod-24; remainders within
    # the next unit; ms/us are within-minute remainders scaled)
    "SELECT EXTRACT(hour FROM INTERVAL 90 MINUTE) AS v",
    "SELECT EXTRACT(minute FROM INTERVAL 90 MINUTE) AS v",
    "SELECT EXTRACT(second FROM INTERVAL 3661 SECOND) AS v",
    "SELECT EXTRACT(millisecond FROM INTERVAL 90 SECOND) AS v",
    "SELECT EXTRACT(microsecond FROM INTERVAL 90 SECOND) AS v",
    "SELECT EXTRACT(hour FROM INTERVAL 26 HOUR) AS v",
    "SELECT EXTRACT(day FROM INTERVAL 36 HOUR) AS v",
    "SELECT EXTRACT(month FROM INTERVAL 14 MONTH) AS v",
    "SELECT EXTRACT(year FROM INTERVAL 14 MONTH) AS v",
    "SELECT EXTRACT(quarter FROM INTERVAL 14 MONTH) AS v",
    "SELECT EXTRACT(decade FROM INTERVAL 25 YEAR) AS v",
    "SELECT EXTRACT(minute FROM (INTERVAL 1 MONTH + INTERVAL 90 MINUTE)) AS v",
    "SELECT date_part('day', INTERVAL 36 HOUR) AS v",
    "SELECT date_part('hour', INTERVAL 90 MINUTE) AS v",
    # time_bucket INTERVAL-offset third argument
    "SELECT time_bucket(INTERVAL 15 MINUTE, TIMESTAMP '2024-03-01 12:37:11', INTERVAL 5 MINUTE) AS v",
    "SELECT time_bucket(INTERVAL 15 MINUTE, TIMESTAMP '2024-03-01 12:02:11', INTERVAL 5 MINUTE) AS v",
    "SELECT time_bucket(INTERVAL 1 WEEK, DATE '2024-03-07', DATE '2024-03-01') AS v",
    "SELECT time_bucket(INTERVAL 1 MONTH, DATE '2024-03-17', INTERVAL 1 MONTH) AS v",
    "SELECT time_bucket(INTERVAL 2 DAY, DATE '2024-03-07', INTERVAL 1 DAY) AS v",
    "SELECT time_bucket(INTERVAL 15 MINUTE, TIMESTAMP '2024-03-01 12:37:11') AS v",
])
def test_interval_fields_and_buckets(sqlf, duck, sql):
    _match(sqlf, duck, sql)


@pytest.mark.parametrize("sql", [
    # aggregate modifiers and string/regex corners that swept green
    "SELECT array_agg(DISTINCT x ORDER BY x DESC) AS v FROM (VALUES (1),(2),(1),(3)) t(x)",
    "SELECT string_agg(x, ',' ORDER BY x) AS v FROM (VALUES ('b'),('a'),('c')) t(x)",
    "SELECT first(x ORDER BY y) AS v FROM (VALUES ('b', 2),('a', 1)) t(x, y)",
    "SELECT last(x ORDER BY y) AS v FROM (VALUES ('b', 2),('a', 1)) t(x, y)",
    "SELECT list_aggregate([1,2,3], 'sum') AS v",
    "SELECT list_aggregate(['a','b'], 'string_agg', '|') AS v",
    "SELECT struct_insert({'a': 1}, b := 7) AS v",
    "SELECT struct_insert({'a': 1, 'c': 2}, b := 'x').b AS v",
    "SELECT to_base(255, 16) AS v",
    "SELECT to_base(255, 2) AS v",
    "SELECT hex(255) AS v",
    "SELECT unhex('ff') AS v",
    "SELECT bit_length('abc') AS v",
    "SELECT get_bit(bitstring('0110', 4), 1) AS v",
    "SELECT ord('é') AS v",
    "SELECT unicode('é') AS v",
    "SELECT chr(233) AS v",
    "SELECT repeat('ab', 0) AS v",
    "SELECT repeat('ab', -1) AS v",
    "SELECT 0.1 + 0.2 = 0.3 AS v",
    "SELECT round(2.5) AS r1, round(3.5) AS r2, round(-2.5) AS r3",
    "SELECT ceil(-0.5) AS v, floor(-0.5) AS w",
    "SELECT regexp_replace('aaa', 'a', 'b') AS v",
    "SELECT regexp_replace('aaa', 'a', 'b', 'g') AS v",
    "SELECT regexp_extract('a1b2', '([a-z])(\\\\d)', 2) AS v",
    "SELECT regexp_extract('a1b2', '([a-z])([0-9])', ['letter', 'digit']) AS v",
    "SELECT regexp_split_to_array('a,b;c', '[,;]') AS v",
    "SELECT 'abc' ~ 'a.c' AS v",
    "SELECT 'abc' !~ 'x' AS v",
    r"SELECT 'a%b' LIKE 'a\%b' ESCAPE '\' AS v",
    "SELECT 'a_b' LIKE 'a$_b' ESCAPE '$' AS v",
    "SELECT EXISTS (SELECT 1 WHERE 1 = 0) AS v",
    "SELECT NOT EXISTS (SELECT 1) AS v",
    "SELECT format_bytes(1234567) AS v",
    "SELECT instr('hello', 'll') AS v",
    "SELECT position('ll' IN 'hello') AS v",
    "SELECT translate('abcba', 'ab', 'xy') AS v",
    "SELECT lpad('7', 3, '0') AS v, rpad('7', 3, '*') AS w",
    "SELECT greatest(1, NULL, 3) AS v",
    "SELECT least(NULL, NULL) AS v",
    "SELECT TIMESTAMP '2024-03-01 12:00:00' AT TIME ZONE 'America/New_York' AS v",
    "SELECT TIMESTAMPTZ '2024-07-01 12:00:00+00' AT TIME ZONE 'Europe/Berlin' AS v",
])
def test_wave2_misc_probes(sqlf, duck, sql):
    _match(sqlf, duck, sql)


def test_named_group_list_extract_version_acceptance(sqlf, duck):
    """DuckDB 1.0's regexp_extract with a NAME LIST extracts POSITIONAL
    groups; when the pattern itself uses (?<name>…) named groups, 1.0
    returns empty strings (its RE2 path drops named captures in this
    form). This engine returns the matched values — the sane semantics
    and what a later DuckDB produces — so the 1.0-quirk case is pinned
    as an ACCEPTANCE (version-policy note in dialect.py), while the
    positional form matches the oracle exactly."""
    with serving_dialect(True):
        rows = run_sql(
            sqlf,
            r"SELECT regexp_extract('a1b2', '(?<letter>[a-z])"
            r"(?<digit>[0-9])', ['letter', 'digit']) AS v",
        ).collect()
    assert rows[0][0].asDict() == {"letter": "a", "digit": "1"}
    theirs = duck.execute(
        r"SELECT regexp_extract('a1b2', '(?<letter>[a-z])"
        r"(?<digit>[0-9])', ['letter', 'digit']) AS v"
    ).fetchall()
    assert theirs[0][0] == {"letter": "", "digit": ""}  # the 1.0 quirk


# --- wave 3 (round 13): windows, strftime/printf, list/json/aggregate
# corners — 57/59 probes green on the first sweep; the one divergence
# is a 1.0 oracle quirk pinned as an acceptance below ----------------------

@pytest.mark.parametrize("sql", [
    "SELECT x, first_value(x IGNORE NULLS) OVER (ORDER BY i) AS v FROM (VALUES (1, NULL), (2, 7), (3, 8)) t(i, x) ORDER BY x NULLS LAST",
    "SELECT i, last_value(x IGNORE NULLS) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS v FROM (VALUES (1, 5), (2, NULL), (3, 8)) t(i, x) ORDER BY i",
    "SELECT i, ntile(3) OVER (ORDER BY i) AS v FROM (VALUES (1),(2),(3),(4),(5)) t(i) ORDER BY i",
    "SELECT i, cume_dist() OVER (ORDER BY i) AS v FROM (VALUES (1),(2),(2),(4)) t(i) ORDER BY i, v",
    "SELECT i, percent_rank() OVER (ORDER BY i) AS v FROM (VALUES (1),(2),(2),(4)) t(i) ORDER BY i, v",
    "SELECT i, nth_value(i, 2) OVER (ORDER BY i) AS v FROM (VALUES (1),(2),(3)) t(i) ORDER BY i",
    "SELECT strftime(TIMESTAMP '2024-03-05 07:08:09', '%a %A %b %B') AS v",
    "SELECT strftime(DATE '2024-03-05', '%j') AS v",
    "SELECT strftime(TIMESTAMP '2024-03-05 07:08:09', '%I %p') AS v",
    "SELECT strftime(TIMESTAMP '2024-03-05 17:08:09', '%I %p') AS v",
    "SELECT strftime(DATE '2024-03-05', '%y %-d %-m') AS v",
    "SELECT strptime('05/03/2024', '%d/%m/%Y') AS v",
    "SELECT printf('%5.2f|%d|%s', 3.14159, 42, 'x') AS v",
    "SELECT printf('%05d|%x|%o', 42, 255, 8) AS v",
    "SELECT printf('%+d %e', 7, 12345.678) AS v",
    "SELECT printf('%-8s|', 'ab') AS v",
    "SELECT list_grade_up([30, 10, 20]) AS v",
    "SELECT list_select([10, 20, 30], [3, 1]) AS v",
    "SELECT list_where([10, 20, 30], [true, false, true]) AS v",
    "SELECT list_unique([1, 2, 2, NULL, NULL]) AS v",
    "SELECT list_any_value([NULL, 7, 8]) AS v",
    "SELECT flatten([[1, 2], [], [3]]) AS v",
    "SELECT list_position([5, 6, 7], 7) AS v",
    "SELECT list_position([5, 6], 9) AS v",
    "SELECT to_json({'a': [1, 2], 'b': 'x'}) AS v",
    "SELECT json_array(1, 'a', NULL) AS v",
    "SELECT json_object('k', 7, 'm', 'v') AS v",
    'SELECT json_extract(\'{"a": {"b": 7}}\', \'$.a.b\') AS v',
    'SELECT json_extract_string(\'{"a": "x"}\', \'$.a\') AS v',
    'SELECT json_valid(\'{"a": 1}\') AS v, json_valid(\'{bad\') AS w',
    'SELECT json_keys(\'{"a": 1, "b": 2}\') AS v',
    'SELECT json_structure(\'{"a": [1, 2]}\') AS v',
    "SELECT bar(3, 0, 10, 10) AS v",
    "SELECT make_date(2024, 2, 29) AS v",
    "SELECT make_timestamp(2024, 2, 29, 13, 30, 59.5) AS v",
    "SELECT make_timestamp(1709212271000000) AS v",
    "SELECT try_cast('abc' AS INTEGER) AS v",
    "SELECT try_cast('2024-13-01' AS DATE) AS v",
    "SELECT try_cast('inf' AS DOUBLE) AS v",
    "SELECT x FROM (VALUES (1), (2.5)) t(x) ORDER BY x",
    "WITH t AS (SELECT 1 AS a), s AS (SELECT a + 1 AS a FROM t) SELECT a FROM s",
    "WITH RECURSIVE f(n, v) AS (SELECT 1, 1 UNION ALL SELECT n+1, v*(n+1) FROM f WHERE n < 6) SELECT max(v) AS v FROM f",
    "SELECT i FROM (VALUES (1),(2),(3),(4)) t(i) ORDER BY i LIMIT 2 OFFSET 1",
    "SELECT i FROM (VALUES (1),(2),(3),(4)) t(i) ORDER BY i OFFSET 2",
    "SELECT i FROM (VALUES (1),(2),(3),(4)) t(i) ORDER BY i LIMIT 1 + 1",
    "SELECT 1 AS a, 2 AS b UNION ALL BY NAME SELECT 3 AS b, 4 AS a ORDER BY a",
    "SELECT product(x) AS v FROM (VALUES (2.0), (3.0), (4.0)) t(x)",
    "SELECT bool_and(x) AS v, bool_or(y) AS w FROM (VALUES (true, false), (true, false)) t(x, y)",
    "SELECT bit_and(x) AS v, bit_or(x) AS w, bit_xor(x) AS u FROM (VALUES (12), (10)) t(x)",
    "SELECT entropy(x) AS v FROM (VALUES ('a'), ('a'), ('b'), ('c')) t(x)",
    "SELECT mode(x) AS v FROM (VALUES (3), (3), (5)) t(x)",
    "SELECT median(x) AS v FROM (VALUES (1), (3), (7)) t(x)",
])
def test_wave3_probes(sqlf, duck, sql):
    _match(sqlf, duck, sql)


def test_strptime_dayofyear_version_acceptance(sqlf, duck):
    """DuckDB 1.0's strptime silently IGNORES %j (day-of-year):
    strptime('2024-066', '%Y-%j') returns 2024-01-01. This engine
    parses it (2024-03-06 = day 66) — the correct/later-DuckDB
    semantics — pinned as a version acceptance per the dialect.py
    policy note (a from-memory bug replication would actively hurt
    users)."""
    with serving_dialect(True):
        ours = run_sql(sqlf,
                       "SELECT strptime('2024-066', '%Y-%j') AS v"
                       ).collect()
    assert str(ours[0][0]) == "2024-03-06 00:00:00"
    theirs = duck.execute(
        "SELECT strptime('2024-066', '%Y-%j') AS v").fetchall()
    assert str(theirs[0][0]) == "2024-01-01 00:00:00"  # the 1.0 quirk


# --- wave 4 (round 13): parallel unnest zip, star EXCLUDE+REPLACE
# ordering, RANGE-interval frames, similarity fns, ANY/ALL -----------------

@pytest.mark.parametrize("sql", [
    # parallel unnest ZIPS row-wise (found silently cross-ish before;
    # FROM-less all-unnest form lowers to explode(arrays_zip(...)),
    # shorter vectors NULL-pad on both engines)
    "SELECT unnest([1, 2]) AS a, unnest([10, 20]) AS b",
    "SELECT unnest([1, 2, 3]) AS a, unnest([10, 20]) AS b",
    "SELECT unnest(['x','y']) AS a, unnest([1.5, 2.5]) AS b, unnest([7, 8]) AS c",
    # star EXCLUDE + REPLACE keeps the replaced column's ORIGINAL
    # position (schema now resolves through subquery/VALUES sources)
    "SELECT * EXCLUDE (b) REPLACE (a * 10 AS a) FROM (VALUES (1, 2, 3)) t(a, b, c)",
    "SELECT * REPLACE (c + 1 AS c) FROM (VALUES (1, 2, 3)) t(a, b, c)",
    "SELECT unnest([5, 6]) AS v",
    # RANGE frames over temporal keys with interval bounds
    "SELECT ts, sum(v) OVER (ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS s FROM (VALUES (TIMESTAMP '2024-01-01 10:00:00', 1), (TIMESTAMP '2024-01-01 10:30:00', 2), (TIMESTAMP '2024-01-01 12:00:00', 4)) t(ts, v) ORDER BY ts",
    "SELECT d, sum(v) OVER (ORDER BY d RANGE BETWEEN INTERVAL 2 DAY PRECEDING AND INTERVAL 1 DAY FOLLOWING) AS s FROM (VALUES (DATE '2024-01-01', 1), (DATE '2024-01-02', 2), (DATE '2024-01-05', 4)) t(d, v) ORDER BY d",
    # IS [NOT] DISTINCT FROM incl. list operands
    "SELECT NULL IS DISTINCT FROM NULL AS a, 1 IS DISTINCT FROM NULL AS b, 1 IS NOT DISTINCT FROM 1 AS c",
    "SELECT [1, NULL] IS NOT DISTINCT FROM [1, NULL] AS v",
    # quantified comparisons
    "SELECT 3 = ANY (SELECT * FROM (VALUES (1),(3)) t(x)) AS v",
    "SELECT 3 > ALL (SELECT * FROM (VALUES (1),(2)) t(x)) AS v",
    "SELECT 3 >= SOME (SELECT * FROM (VALUES (5),(2)) t(x)) AS v",
    # string similarity family
    "SELECT jaccard('duck', 'luck') AS v",
    "SELECT damerau_levenshtein('abc', 'acb') AS v",
    "SELECT hamming('1010', '1001') AS v",
    "SELECT jaro_similarity('martha', 'marhta') > 0.9 AS v",
    "SELECT jaro_winkler_similarity('martha', 'marhta') > 0.95 AS v",
    "SELECT editdist3('kitten', 'sitting') AS v",
    # star/COLUMNS combos and list comprehensions
    "SELECT COLUMNS('[ac]') FROM (VALUES (1, 2, 3)) t(a, b, c)",
    "SELECT min(COLUMNS(*)) FROM (VALUES (1, 2), (5, 0)) t(a, b)",
    "SELECT [x * 2 FOR x IN [1, 2, 3] IF x > 1] AS v",
    "SELECT [u FOR u IN string_split('a,b,c', ',')] AS v",
    # nested struct/array access
    "SELECT [{'a': 1}, {'a': 2}][2].a AS v",
    "SELECT list_transform([{'a': 1}, {'a': 5}], s -> s.a + 1) AS v",
    "SELECT {'p': {'q': [1, 2]}}.p.q[2] AS v",
    "SELECT unnest(map_entries(MAP {'a': 1}))",
    # date landmarks
    "SELECT date_trunc('week', DATE '2024-01-01') AS v",
    "SELECT date_trunc('quarter', DATE '2024-05-15') AS v",
    "SELECT last_day(DATE '2024-02-05') AS v",
    # aggregate FILTER (both spellings)
    "SELECT count(*) FILTER (WHERE x > 1) AS c, sum(x) FILTER (x > 1) AS s FROM (VALUES (1),(2),(3)) t(x)",
    # DISTINCT ON over derived keys
    "SELECT DISTINCT ON (k) k, v FROM (SELECT x % 2 AS k, x AS v FROM (VALUES (1),(2),(3),(4)) t(x)) s ORDER BY k, v DESC",
])
def test_wave4_probes(sqlf, duck, sql):
    _match(sqlf, duck, sql)


def test_parallel_unnest_with_from_fails_closed(sqlf):
    from duckdb_server_spark.dialect import DialectError

    with serving_dialect(True), pytest.raises(DialectError,
                                              match="parallel unnest"):
        run_sql(
            sqlf,
            "SELECT unnest(a) AS x, unnest(b) AS y FROM "
            "(SELECT [1,2] AS a, [3,4] AS b) t",
        ).collect()
