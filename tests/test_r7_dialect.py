"""Round-7 dialect breadth batch: struct/map literals, function
templates (to_base, list_reduce, 3-arg date_sub, dow/isodow, epoch,
strptime, quantile_disc, kurtosis, histogram, format, struct_extract),
string-distance shims, ordered any_value/arbitrary/first/last, and the
POSITIONAL JOIN rewrite (previously a silent CROSS join through Spark's
alias parsing).

Differential where reprs align; semantic (normalized) where the two
python drivers render the same value differently (Row vs dict, MAP
rendering, tz-awareness).
"""

from __future__ import annotations

import pytest

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
    register_views(spark, SF_DIR, ("nation", "region", "orders"))
    return spark


def _both(spark, duck, sql: str):
    with serving_dialect(True):
        ours = sorted(tuple(r) for r in run_sql(spark, sql).collect())
    theirs = sorted(duck.execute(sql).fetchall())
    return ours, theirs


def _match(spark, duck, sql: str):
    ours, theirs = _both(spark, duck, sql)
    assert ours == theirs, f"{sql!r}: {ours[:2]} != {theirs[:2]}"


# --- struct / map literals -------------------------------------------------


def test_struct_literal_field_access(sql_session, duck):
    _match(sql_session, duck, "SELECT {'a': 1, 'b': 2}.a AS v")


def test_struct_literal_values_match(sql_session, duck):
    with serving_dialect(True):
        row = run_sql(
            sql_session, "SELECT {'a': 1, 'c': [1, 2]} AS s"
        ).collect()[0].s
    drow = duck.execute("SELECT {'a': 1, 'c': [1, 2]} AS s").fetchone()[0]
    assert row.a == drow["a"] and list(row.c) == drow["c"]


def test_nested_struct_literal(sql_session, duck):
    with serving_dialect(True):
        row = run_sql(
            sql_session, "SELECT {'a': {'b': 7}}.a.b AS v"
        ).collect()[0].v
    assert row == duck.execute("SELECT {'a': {'b': 7}}.a.b AS v").fetchone()[0]


def test_map_literal(sql_session, duck):
    with serving_dialect(True):
        m = run_sql(sql_session, "SELECT MAP {'x': 1, 'y': 2} AS m").collect()[0].m
    assert m == {"x": 1, "y": 2}


def test_struct_extract(sql_session, duck):
    _match(sql_session, duck, "SELECT struct_extract({'a': 7}, 'a') AS v")


def test_brace_in_string_literal_untouched(sql_session, duck):
    # masked literals keep braces out of the struct rewrite's reach
    _match(sql_session, duck, "SELECT '{not: struct}' AS s")


# --- function templates ----------------------------------------------------


def test_to_base(sql_session, duck):
    _match(sql_session, duck, "SELECT to_base(255, 16) AS h")


def test_list_reduce(sql_session, duck):
    _match(sql_session, duck,
           "SELECT list_reduce([1, 2, 3, 4], (x, y) -> x + y) AS r")
    _match(sql_session, duck,
           "SELECT list_reduce(['a', 'b'], (x, y) -> x || y) AS r")


def test_list_reverse_sort_keeps_int_type(sql_session, duck):
    _match(sql_session, duck, "SELECT list_reverse_sort([3, 1, 2]) AS l")


def test_date_sub_three_arg(sql_session, duck):
    _match(sql_session, duck,
           "SELECT date_sub('month', DATE '2020-01-31', DATE '2020-03-01') AS d")
    _match(sql_session, duck,
           "SELECT datesub('day', DATE '2020-01-01', DATE '2020-01-05') AS d")


def test_dow_isodow_mapping(sql_session, duck):
    # 2020-01-05 is a Sunday: DuckDB dow=0, isodow=7
    _match(sql_session, duck, "SELECT datepart('dow', DATE '2020-01-05') AS d")
    _match(sql_session, duck,
           "SELECT date_part('isodow', DATE '2020-01-05') AS d")
    _match(sql_session, duck, "SELECT datepart('dow', DATE '2020-01-06') AS d")


def test_epoch_fractional_double(sql_session, duck):
    _match(sql_session, duck,
           "SELECT epoch(TIMESTAMP '2020-01-01 00:00:30.5') AS e")


def test_strptime(sql_session, duck):
    _match(sql_session, duck,
           "SELECT strptime('2020-01-05 03:04', '%Y-%m-%d %H:%M') AS t")


def test_quantile_disc_exact_element(sql_session, duck):
    for p in ("0", "0.25", "0.4", "0.5", "0.75", "0.9", "1"):
        _match(sql_session, duck,
               f"SELECT quantile_disc(n_nationkey, {p}) AS q FROM nation")
    _match(sql_session, duck,
           "SELECT quantile(n_nationkey, 0.25) AS q FROM nation")


def test_kurtosis_sample_corrected(sql_session, duck):
    ours, theirs = _both(
        sql_session, duck, "SELECT kurtosis(n_nationkey) AS k FROM nation"
    )
    assert ours[0][0] == pytest.approx(theirs[0][0], abs=1e-9)


def test_histogram_semantic(sql_session, duck):
    with serving_dialect(True):
        h = run_sql(
            sql_session, "SELECT histogram(n_regionkey) AS h FROM nation"
        ).collect()[0].h
    d = duck.execute("SELECT histogram(n_regionkey) FROM nation").fetchone()[0]
    assert h == dict(zip(d["key"], d["value"]))


def test_format_basic_and_escape(sql_session, duck):
    _match(sql_session, duck, "SELECT format('{} x {}', 1, 'a') AS s")
    _match(sql_session, duck, "SELECT format('100%: {:d}', 7) AS s")


def test_current_schema(sql_session, duck):
    _match(sql_session, duck, "SELECT current_schema() AS s")


# --- string distances ------------------------------------------------------


def test_distance_family(sql_session, duck):
    for sql in (
        "SELECT editdist3('kitten', 'sitting') AS d",
        "SELECT suffix('abc', 'bc') AS b",
        "SELECT hamming('abc', 'abd') AS h",
        "SELECT mismatches('abc', 'abd') AS m",
        "SELECT jaccard('Abc', 'abc') AS j",
        "SELECT jaccard('aaab', 'ab') AS j",
        "SELECT jaro_similarity('martha', 'marhta') AS j",
        "SELECT jaro_winkler_similarity('DIXON', 'DICKSONX') AS j",
        "SELECT jaro_winkler_similarity('duane', 'dwayne') AS j",
        "SELECT jaro_winkler_similarity('a', '') AS j",
        "SELECT damerau_levenshtein('ca', 'abc') AS d",  # full DL: 2, not OSA 3
        "SELECT damerau_levenshtein('abc', 'acb') AS d",
    ):
        _match(sql_session, duck, sql)


def test_distance_on_table_column(sql_session, duck):
    _match(
        sql_session, duck,
        "SELECT n_name, jaro_winkler_similarity(n_name, 'CANADA') AS s "
        "FROM nation ORDER BY s DESC NULLS LAST, n_name LIMIT 5",
    )


# --- ordered first/last/any_value -----------------------------------------


def test_ordered_any_value_family(sql_session, duck):
    _match(
        sql_session, duck,
        "SELECT n_regionkey, any_value(n_name ORDER BY n_name) AS a "
        "FROM nation GROUP BY ALL ORDER BY ALL",
    )
    _match(sql_session, duck,
           "SELECT arbitrary(n_name ORDER BY n_nationkey DESC) AS a FROM nation")
    _match(sql_session, duck,
           "SELECT first(n_name ORDER BY n_nationkey DESC) AS f FROM nation")
    _match(sql_session, duck,
           "SELECT last(n_name ORDER BY n_nationkey) AS l FROM nation")


def test_plain_arbitrary_runs(sql_session):
    with serving_dialect(True):
        out = run_sql(
            sql_session, "SELECT arbitrary(n_name) AS a FROM nation"
        ).collect()
    assert len(out) == 1 and out[0].a is not None


# --- POSITIONAL JOIN -------------------------------------------------------


def test_positional_join_pads_shorter_side(sql_session, duck):
    _match(sql_session, duck,
           "SELECT count(*) AS c FROM nation POSITIONAL JOIN region")
    # 25 nations vs 5 regions: rows 6-25 carry NULL region columns
    _match(
        sql_session, duck,
        "SELECT count(*) AS c FROM nation POSITIONAL JOIN region "
        "WHERE r_name IS NULL",
    )


def test_positional_join_derived_sides(sql_session, duck):
    # round 15 (hunt H): derived-table sides are SUPPORTED — previously
    # fail-closed; columns resolve via a LIMIT-0 probe or alias list
    _match(sql_session, duck,
           "SELECT * FROM (SELECT 1) a POSITIONAL JOIN (SELECT 2) b")


# --- batch 3 (second probe battery) ----------------------------------------


def test_similar_to_full_match(sql_session, duck):
    _match(sql_session, duck,
           "SELECT 'abc' SIMILAR TO 'a.c' AS b, 'abc' NOT SIMILAR TO 'x.*' AS n")
    _match(sql_session, duck,
           "SELECT n_name FROM nation WHERE n_name SIMILAR TO 'A.*' ORDER BY n_name")
    # partial match must NOT pass (full-match semantics)
    _match(sql_session, duck, "SELECT 'abc' SIMILAR TO 'a' AS b")


def test_regexp_full_match(sql_session, duck):
    _match(sql_session, duck, "SELECT regexp_full_match('abc', 'a.c') AS b")
    _match(sql_session, duck, "SELECT regexp_full_match('abc', 'a') AS b")


def test_string_literal_slicing(sql_session, duck):
    _match(sql_session, duck,
           "SELECT 'abcdef'[2:4] AS a, 'abcdef'[3:] AS b, 'abcdef'[:3] AS c")


def test_char_codepoint_family(sql_session, duck):
    _match(sql_session, duck,
           "SELECT ord('A') AS o, chr(66) AS c, unicode('Ω') AS u, unicode('') AS e")


def test_hex_family(sql_session, duck):
    _match(sql_session, duck, "SELECT to_hex(255) AS h, hex(255) AS h2")


def test_postfix_factorial(sql_session, duck):
    _match(sql_session, duck, "SELECT 5 ! AS f")
    _match(sql_session, duck, "SELECT n_nationkey, n_nationkey != 3 AS ne "
                              "FROM nation ORDER BY n_nationkey LIMIT 3")


def test_floored_div_mod(sql_session, duck):
    _match(sql_session, duck,
           "SELECT fdiv(7, 2) AS a, fmod(7, 2) AS b, fdiv(-7, 2) AS c, "
           "fmod(-7, 2) AS d, fmod(7.5, 2) AS e")


def test_operator_function_names(sql_session, duck):
    _match(sql_session, duck,
           "SELECT divide(7, 2) AS a, divide(-7, 2) AS b, multiply(3, 4) AS c, "
           "add(2, 3) AS d, subtract(2, 3) AS e")


def test_even_signbit_isfamily(sql_session, duck):
    _match(sql_session, duck,
           "SELECT even(2.5) AS a, even(2) AS b, even(-2.5) AS c, even(0) AS d")
    _match(sql_session, duck,
           "SELECT signbit(-0.0) AS a, signbit(-5) AS b, signbit(3) AS c")
    _match(sql_session, duck,
           "SELECT isfinite(1.0) AS a, isnan(CAST('nan' AS DOUBLE)) AS b, "
           "isinf(CAST('inf' AS DOUBLE)) AS c")


def test_gamma_family_close(sql_session, duck):
    ours, theirs = _both(
        sql_session, duck,
        "SELECT gamma(5) AS g, lgamma(5.0) AS lg, nextafter(1.0, 2.0) AS n",
    )
    for g, w in zip(ours[0], theirs[0]):
        assert g == pytest.approx(w, rel=1e-12)


def test_kahan_aggregates(sql_session, duck):
    _match(sql_session, duck, "SELECT fsum(n_nationkey) AS s FROM nation")
    _match(sql_session, duck, "SELECT favg(n_nationkey) AS a FROM nation")


def test_geomean(sql_session, duck):
    ours, theirs = _both(
        sql_session, duck, "SELECT geomean(n_nationkey + 1) AS g FROM nation"
    )
    assert ours[0][0] == pytest.approx(theirs[0][0], rel=1e-12)


def test_dayname_monthname(sql_session, duck):
    _match(sql_session, duck,
           "SELECT dayname(DATE '2020-01-05') AS d, monthname(DATE '2020-01-05') AS m")


def test_date_series_yields_timestamps(sql_session, duck):
    _match(sql_session, duck,
           "SELECT generate_series(DATE '2020-01-01', DATE '2020-01-04', "
           "INTERVAL 1 DAY) AS g")


def test_nfc_normalize(sql_session, duck):
    _match(sql_session, duck, "SELECT nfc_normalize('é') AS s")


def test_varchar_postfix_cast(sql_session, duck):
    _match(sql_session, duck,
           "SELECT string_agg(DISTINCT n_regionkey::VARCHAR, ',' "
           "ORDER BY n_regionkey::VARCHAR) AS s FROM nation")


def test_string_column_subscripts_schema_aware(sql_session, duck):
    # n_name is a STRING column: slice and single-index must go through
    # substr, not array slice (schema-resolved, not name-guessed)
    _match(sql_session, duck,
           "SELECT n_name[2:4] AS s FROM nation ORDER BY n_name LIMIT 3")
    _match(sql_session, duck,
           "SELECT n_name[3] AS c, n_name[-1] AS l FROM nation "
           "ORDER BY n_name LIMIT 3")


# --- batch 4 (JSON / nested probe battery) ----------------------------------


def test_json_family(sql_session, duck):
    _match(sql_session, duck,
           """SELECT json_extract('{"a": {"b": 7}}', '$.a.b') AS v""")
    _match(sql_session, duck,
           """SELECT json_extract('{"a": "x"}', '$.a') AS v""")
    _match(sql_session, duck,
           """SELECT json_valid('{"a": 1}') AS v, json_valid('{oops') AS i""")
    _match(sql_session, duck, """SELECT json_keys('{"a":1,"b":2}') AS k""")
    _match(sql_session, duck,
           """SELECT json_merge_patch('{"a":1}', '{"b":2}') AS j""")
    _match(sql_session, duck, """SELECT json('{ "a" :  1 }') AS j""")
    _match(sql_session, duck, """SELECT '{"a": [1,2]}'::JSON AS j""")


def test_list_convenience_family(sql_session, duck):
    for sql in (
        "SELECT list_any_value([NULL, 3, 4]) AS v",
        "SELECT list_sum([1,2,3]) AS s, list_avg([1,2,3]) AS a",
        "SELECT list_sum([1, NULL, 3]) AS n",
        "SELECT list_has_any([1,2],[2,3]) AS a, list_has_all([1,2,3],[2,3]) AS b",
        "SELECT list_select([10,20,30], [1,3]) AS l",
        "SELECT list_where([10,20,30], [true,false,true]) AS l",
        "SELECT list_grade_up([30,10,20]) AS g",
        "SELECT array_reverse([1,2,3]) AS r",
        "SELECT list_resize([1,2], 4, 0) AS l",
        "SELECT list_resize([1,2,3,4], 2) AS l",
        "SELECT apply([1,2,3], x -> x * 2) AS a",
        "SELECT list_dot_product([1.0,2.0], [3.0,4.0]) AS d",
        "SELECT list_cosine_similarity([1.0,0.0], [1.0,0.0]) AS c",
        "SELECT list_distance([0.0,0.0], [3.0,4.0]) AS d",
    ):
        _match(sql_session, duck, sql)


def test_topn_aggregate_forms(sql_session, duck):
    # The top-n aggregate forms postdate the local duckdb 1.0 oracle, so
    # these pin DuckDB's documented semantics directly (list of the top
    # n values / their args, descending for max).
    with serving_dialect(True):
        assert run_sql(
            sql_session, "SELECT max(n_nationkey, 2) AS m FROM nation"
        ).collect()[0].m == [24, 23]
        assert run_sql(
            sql_session, "SELECT min(n_nationkey, 3) AS m FROM nation"
        ).collect()[0].m == [0, 1, 2]
        assert run_sql(
            sql_session,
            "SELECT max_by(n_name, n_nationkey, 2) AS m FROM nation",
        ).collect()[0].m == ["NATION_24", "NATION_23"]
    # 1-arg forms must stay native
    _match(sql_session, duck,
           "SELECT max(n_nationkey) AS a, min(n_name) AS b FROM nation")


def test_list_distinct_ordered(sql_session, duck):
    _match(sql_session, duck,
           "SELECT list(DISTINCT n_regionkey ORDER BY n_regionkey) AS l FROM nation")
    _match(sql_session, duck,
           "SELECT list(DISTINCT n_regionkey ORDER BY n_regionkey DESC) AS l "
           "FROM nation")


def test_date_arithmetic_result_types(sql_session, duck):
    # DATE - DATE is a BIGINT day count in DuckDB; DATE + INTERVAL is a
    # TIMESTAMP; date-granular date_trunc returns DATE even on TIMESTAMP
    _match(sql_session, duck,
           "SELECT DATE '2020-03-01' - DATE '2020-01-01' AS d")
    _match(sql_session, duck,
           "SELECT DATE '2020-01-01' + INTERVAL 3 DAY AS d")
    _match(sql_session, duck,
           "SELECT date_trunc('week', DATE '2020-03-05') AS d")
    _match(sql_session, duck,
           "SELECT date_trunc('month', TIMESTAMP '2020-03-15 01:02:03') AS d")
    _match(sql_session, duck,
           "SELECT date_trunc('hour', TIMESTAMP '2020-03-15 01:02:03') AS d")
    # plain numeric subtraction must NOT be touched
    _match(sql_session, duck,
           "SELECT n_nationkey - n_regionkey AS d FROM nation "
           "ORDER BY n_nationkey LIMIT 3")


# --- batch 5 (operators probe battery) ---------------------------------------


def test_power_operators(sql_session, duck):
    # Spark's ^ is XOR — without the rewrite 2 ^ 3 silently returns 1
    _match(sql_session, duck, "SELECT 2 ** 3 AS p")
    _match(sql_session, duck, "SELECT 2 ^ 3 AS p")
    _match(sql_session, duck, "SELECT 2 ^ 3 ^ 2 AS p")  # left-assoc: 64
    _match(sql_session, duck, "SELECT 2 ^ 0.5 AS p")
    _match(sql_session, duck,
           "SELECT n_nationkey ^ 2 AS p FROM nation ORDER BY n_nationkey LIMIT 3")


def test_postgres_style_match_operators(sql_session, duck):
    # DuckDB's ~ is a FULL-match regex ('abc' ~ 'a' is false)
    _match(sql_session, duck, "SELECT 'abc' ~ 'a.c' AS m, 'abc' ~ 'a' AS m2")
    _match(sql_session, duck, "SELECT 'abc' !~ 'x' AS m")
    _match(sql_session, duck, "SELECT 'abc' ~~ 'a%' AS m, 'abc' !~~ 'x%' AS m2")


def test_quantified_comparisons(sql_session, duck):
    _match(sql_session, duck,
           "SELECT 5 = ANY(SELECT n_regionkey FROM nation) AS a")
    _match(sql_session, duck,
           "SELECT 3 = ANY(SELECT n_regionkey FROM nation) AS a")
    _match(sql_session, duck,
           "SELECT 99 <> ALL(SELECT n_regionkey FROM nation) AS a")
    _match(sql_session, duck,
           "SELECT n_nationkey > ALL(SELECT n_regionkey FROM nation) AS a "
           "FROM nation WHERE n_nationkey IN (3, 24) ORDER BY n_nationkey")
    _match(sql_session, duck,
           "SELECT n_nationkey, n_nationkey >= ANY(SELECT n_regionkey * 5 "
           "FROM nation) AS a FROM nation WHERE n_nationkey < 3 "
           "ORDER BY n_nationkey")


def test_division_modulo_by_zero_yields_null(sql_session, duck):
    # DuckDB: NULL; ANSI Spark would raise — the serving path must match
    _match(sql_session, duck, "SELECT 1 / 0 AS d")
    _match(sql_session, duck, "SELECT CAST(1 AS DOUBLE) / 0 AS d")
    _match(sql_session, duck, "SELECT 1 % 0 AS m")
    _match(sql_session, duck, "SELECT -7 % 3 AS m, 7 % 3 AS m2, 7.5 % 2 AS m3")
    _match(sql_session, duck,
           "SELECT n_nationkey % 4 AS g, count(*) AS c FROM nation "
           "GROUP BY g ORDER BY g")


def test_blob_and_base64_family(sql_session, duck):
    def norm(rows):
        return sorted(
            repr(tuple(bytes(v) if isinstance(v, (bytes, bytearray)) else v
                       for v in r))
            for r in rows
        )
    for sql in (
        "SELECT to_base64('abc'::BLOB) AS b",
        "SELECT from_base64('YWJj') AS b",
        "SELECT encode('abc') AS e",
        "SELECT decode('abc'::BLOB) AS d",
        "SELECT octet_length('abc'::BLOB) AS o",
        "SELECT 'abc'::BLOB AS b",
        "SELECT sha256('abc') AS s",
        "SELECT regexp_escape('a.b+c') AS e",
    ):
        with serving_dialect(True):
            ours = norm(tuple(r) for r in run_sql(sql_session, sql).collect())
        theirs = norm(duck.execute(sql).fetchall())
        assert ours == theirs, sql


def test_left_right_negative_counts(sql_session, duck):
    _match(sql_session, duck,
           "SELECT left('abcdef', -2) AS l, right('abcdef', -2) AS r")
    _match(sql_session, duck,
           "SELECT left('abcdef', 2) AS l, right('abcdef', 2) AS r")
    _match(sql_session, duck,
           "SELECT left(n_name, n_regionkey - 2) AS l FROM nation "
           "ORDER BY n_nationkey LIMIT 5")


def test_ignore_nulls_position(sql_session, duck):
    # DuckDB: IGNORE NULLS inside the call; Spark: after it
    _match(sql_session, duck,
           "SELECT n_nationkey, first_value(CASE WHEN n_nationkey % 3 = 0 "
           "THEN NULL ELSE n_name END IGNORE NULLS) "
           "OVER (ORDER BY n_nationkey) AS f FROM nation ORDER BY n_nationkey")
    _match(sql_session, duck,
           "SELECT n_nationkey, lag(CASE WHEN n_nationkey % 3 = 0 "
           "THEN NULL ELSE n_name END IGNORE NULLS) "
           "OVER (ORDER BY n_nationkey) AS l FROM nation ORDER BY n_nationkey")


def test_named_window_chaining(sql_session, duck):
    _match(sql_session, duck,
           "SELECT n_regionkey, sum(n_nationkey) OVER w1 AS a, "
           "avg(n_nationkey) OVER w2 AS b FROM nation "
           "WINDOW w1 AS (PARTITION BY n_regionkey), "
           "w2 AS (w1 ORDER BY n_nationkey) ORDER BY n_nationkey")
    # non-chained named windows keep working
    _match(sql_session, duck,
           "SELECT n_nationkey, sum(n_nationkey) OVER w AS s FROM nation "
           "WINDOW w AS (PARTITION BY n_regionkey) ORDER BY n_nationkey")


def test_recursive_unnest(sql_session, duck):
    _match(sql_session, duck,
           "SELECT unnest([{'a': 1, 'b': 9}, {'a': 2, 'b': 8}], "
           "recursive := true)")
    _match(sql_session, duck,
           "SELECT unnest([[1,2],[3]], recursive := true) AS u")
    _match(sql_session, duck,
           "SELECT unnest([[1,2],[3]], max_depth := 2) AS u")
    _match(sql_session, duck, "SELECT unnest([4,5]) AS u")


# --- PRAGMA / metadata catalog surface ---------------------------------------


def test_pragma_surface(sql_session):
    from duckdb_server_spark.dialect import execute_statement

    with serving_dialect(True):
        v = execute_statement(sql_session, "PRAGMA version").collect()
        assert v[0].library_version.startswith("v")
        dbs = execute_statement(sql_session, "PRAGMA database_list").collect()
        assert dbs[0].name == "memory"
        tables = {
            r.name
            for r in execute_statement(sql_session, "PRAGMA show_tables").collect()
        }
        assert {"nation", "region"} <= tables
        ti = execute_statement(
            sql_session, "PRAGMA table_info('nation')"
        ).collect()
        assert [r.name for r in ti][:2] == ["n_nationkey", "n_name"]
        assert ti[0].type == "INTEGER"
        assert execute_statement(sql_session, "CHECKPOINT") is None


def test_metadata_table_functions(sql_session):
    with serving_dialect(True):
        rows = run_sql(
            sql_session,
            "SELECT name, type FROM pragma_table_info('region') ORDER BY cid",
        ).collect()
        assert [r.name for r in rows] == ["r_regionkey", "r_name"]
        t = run_sql(
            sql_session,
            "SELECT table_name, column_count FROM duckdb_tables() "
            "WHERE table_name = 'nation'",
        ).collect()
        assert t[0].column_count == 3
        cols = run_sql(
            sql_session,
            "SELECT column_name FROM information_schema.columns "
            "WHERE table_name = 'nation' ORDER BY ordinal_position",
        ).collect()
        assert [r.column_name for r in cols] == [
            "n_nationkey", "n_name", "n_regionkey",
        ]
        tb = run_sql(
            sql_session,
            "SELECT table_name FROM information_schema.tables "
            "ORDER BY table_name",
        ).collect()
        assert "nation" in [r.table_name for r in tb]


def test_current_setting_reflects_set(sql_session):
    from duckdb_server_spark.dialect import execute_statement

    with serving_dialect(True):
        assert run_sql(
            sql_session, "SELECT current_setting('threads') AS t"
        ).collect()[0].t >= 1
        execute_statement(sql_session, "PRAGMA memory_limit='9GB'")
        assert run_sql(
            sql_session, "SELECT current_setting('memory_limit') AS m"
        ).collect()[0].m == "9GB"
