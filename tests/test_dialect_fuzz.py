"""Property-based differential fuzz for the DuckDB→Spark rewriter.

The structural rewrites in dialect.py (subscripts, slices, range/
generate_series, polymorphic len, trim swaps, strftime, ordered
aggregates) are string-level transformations; this fuzz generates random
DuckDB-dialect scalar expressions, runs ``spark.sql(rewrite(q))`` and
DuckDB on the SAME text, and requires identical results — probing the
index/bound/empty-list edge envelope no hand-written query covers.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from duckdb_server_spark.dialect import register_dialect_functions, rewrite

SETTINGS = dict(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def duck():
    import duckdb

    return duckdb.connect()


@pytest.fixture(scope="module", autouse=True)
def _dialect_fns(spark):
    register_dialect_functions(spark)


def both(spark, duck, sql: str):
    srow = spark.sql(rewrite(sql)).collect()[0]
    drow = duck.execute(sql).fetchone()
    got, want = list(srow), list(drow)
    assert len(got) == len(want), sql
    for g, w in zip(got, want):
        if isinstance(g, float) and isinstance(w, float):
            assert abs(g - w) < 1e-9, sql
        else:
            assert g == w, f"{sql!r}: spark={g!r} duck={w!r}"


int_lists = st.lists(st.integers(-9, 99), min_size=1, max_size=5)
indices = st.integers(-7, 7)
words = st.text(alphabet="abcxyz", min_size=0, max_size=6)


@given(lst=int_lists, i=indices)
@settings(**SETTINGS)
def test_fuzz_subscript(spark, duck, lst, i):
    """1-based / negative / zero / out-of-range indices all agree."""
    both(spark, duck, f"SELECT ({lst})[{i}] AS v")


@given(lst=int_lists, i=indices)
@settings(**SETTINGS)
def test_fuzz_subscript_expression_index(spark, duck, lst, i):
    both(spark, duck, f"SELECT ({lst})[len({lst}) + {i}] AS v")


@given(lst=int_lists, a=st.integers(1, 7), b=st.integers(-3, 9))
@settings(**SETTINGS)
def test_fuzz_list_slice(spark, duck, lst, a, b):
    """Clamped ends, negative ends, empty windows (lists compared raw —
    the local DuckDB 1.0 returns NULL for array_to_string([]))."""
    both(spark, duck, f"SELECT list_slice({lst}, {a}, {b}) AS v")


@given(a=st.integers(-6, 6), b=st.integers(-6, 9))
@settings(**SETTINGS)
def test_fuzz_range_and_series(spark, duck, a, b):
    """Empty, negative-bound, and stepped ranges (DuckDB end-exclusive,
    generate_series end-inclusive; both empty when inverted)."""
    both(
        spark, duck,
        f"SELECT range({a}, {b}) AS r, "
        f"generate_series({a}, {b}) AS gs, "
        f"len(range({a}, {b})) AS n",
    )


@given(
    a=st.integers(-4, 9),
    b=st.integers(-4, 9),
    step=st.integers(-4, 4).filter(lambda s: s != 0),
)
@settings(**SETTINGS)
def test_fuzz_range_stepped(spark, duck, a, b, step):
    """Both step signs, including empty/inverted ranges."""
    both(spark, duck, f"SELECT range({a}, {b}, {step}) AS v")


@given(s=words, chars=st.text(alphabet="abx", min_size=1, max_size=2))
@settings(**SETTINGS)
def test_fuzz_trim_swap(spark, duck, s, chars):
    both(
        spark, duck,
        f"SELECT ltrim('{s}', '{chars}') AS l, rtrim('{s}', '{chars}') AS r, "
        f"trim('{s}', '{chars}') AS t",
    )


@given(s=words, lst=int_lists)
@settings(**SETTINGS)
def test_fuzz_len_polymorphic(spark, duck, s, lst):
    both(
        spark, duck,
        f"SELECT len('{s}') AS sl, len({lst}) AS ll, "
        f"len(list_filter({lst}, x -> x > 0)) AS fl",
    )


@given(
    y=st.integers(1990, 2100),
    m=st.integers(1, 12),
    d=st.integers(1, 28),
    fmt=st.sampled_from(["%Y-%m-%d", "%Y/%m", "%d.%m.%y", "%Y|%j", "%B %Y"]),
)
@settings(**SETTINGS)
def test_fuzz_strftime(spark, duck, y, m, d, fmt):
    both(
        spark, duck,
        f"SELECT strftime(DATE '{y:04d}-{m:02d}-{d:02d}', '{fmt}') AS v",
    )


@given(lst=int_lists)
@settings(**SETTINGS)
def test_fuzz_list_aggregate_chain(spark, duck, lst):
    both(
        spark, duck,
        f"SELECT CAST(list_aggregate(list_transform({lst}, x -> x * x), "
        f"'sum') AS DOUBLE) AS ss, "
        f"len(list_distinct({lst})) AS nd, "
        f"array_to_string(list_sort({lst}), ',') AS sorted_csv",
    )


# --- window EXCLUDE frame algebra -------------------------------------------
#
# The EXCLUDE rewrite is frame-total minus excluded contributions; peers
# and NULL arguments make the algebra easy to get subtly wrong, so fuzz
# it over random small tables with duplicate order keys and NULLs.
# ROWS frames use a unique order key (with ties their contents are
# order-dependent and both engines may legitimately differ); TIES/GROUP
# are only defined here for RANGE frames (peers inside the frame).

row_strat = st.tuples(
    st.integers(1, 2),                      # g: partition
    st.integers(1, 4),                      # o: order key (duplicates!)
    st.one_of(st.none(), st.integers(-5, 9)),  # v: nullable value
)


def _values_clause(rows):
    cells = ", ".join(
        f"({i}, {g}, {o}, {'NULL' if v is None else v})"
        for i, (g, o, v) in enumerate(rows)
    )
    return f"(VALUES {cells}) t(id, g, o, v)"


@given(
    rows=st.lists(row_strat, min_size=1, max_size=8),
    p=st.integers(0, 3),
    f=st.integers(0, 3),
    fn=st.sampled_from(["sum(v)", "count(v)", "count(*)"]),
)
@settings(**SETTINGS)
def test_fuzz_exclude_current_row_rows_frame(spark, duck, rows, p, f, fn):
    q = (
        f"SELECT id, {fn} OVER (PARTITION BY g ORDER BY o, id "
        f"ROWS BETWEEN {p} PRECEDING AND {f} FOLLOWING EXCLUDE CURRENT ROW)"
        f" AS s FROM {_values_clause(rows)} ORDER BY id"
    )
    srows = spark.sql(rewrite(q)).collect()
    drows = duck.execute(q).fetchall()
    assert [tuple(r) for r in srows] == drows, q


@given(
    rows=st.lists(row_strat, min_size=1, max_size=8),
    kind=st.sampled_from(["CURRENT ROW", "TIES", "GROUP"]),
    frame=st.sampled_from(
        [
            "RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING",
            "RANGE BETWEEN 2 PRECEDING AND CURRENT ROW",
            "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
            "RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING",
        ]
    ),
    fn=st.sampled_from(["sum(v)", "count(v)", "count(*)"]),
)
@settings(**SETTINGS)
def test_fuzz_exclude_range_frames(spark, duck, rows, kind, frame, fn):
    q = (
        f"SELECT id, {fn} OVER (PARTITION BY g ORDER BY o "
        f"{frame} EXCLUDE {kind}) AS s "
        f"FROM {_values_clause(rows)} ORDER BY id"
    )
    srows = spark.sql(rewrite(q)).collect()
    drows = duck.execute(q).fetchall()
    assert [tuple(r) for r in srows] == drows, q


def test_exclude_unsound_frames_are_refused():
    with pytest.raises(ValueError, match="does not contain the current row"):
        rewrite(
            "SELECT sum(v) OVER (ORDER BY o ROWS BETWEEN 3 PRECEDING AND "
            "2 PRECEDING EXCLUDE CURRENT ROW) FROM t"
        )
    with pytest.raises(ValueError, match="ROWS frame"):
        rewrite(
            "SELECT sum(v) OVER (ORDER BY o ROWS BETWEEN 1 PRECEDING AND "
            "1 FOLLOWING EXCLUDE TIES) FROM t"
        )


@given(rows=st.lists(row_strat, min_size=1, max_size=8))
@settings(**SETTINGS)
def test_fuzz_list_agg_keeps_nulls(spark, duck, rows):
    """DuckDB list()/array_agg() keep NULL elements; the struct-wrapped
    collect_list spelling must too (len counts them)."""
    q = (
        f"SELECT g, len(list(v)) AS n, len(array_agg(v)) AS n2 "
        f"FROM {_values_clause(rows)} GROUP BY g ORDER BY g"
    )
    srows = spark.sql(rewrite(q)).collect()
    drows = duck.execute(q).fetchall()
    assert [tuple(r) for r in srows] == drows, q


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 50), st.integers(-9, 9)),
        min_size=1, max_size=7,
        unique_by=lambda p: p[0],  # unique order keys → deterministic
    ),
    direction=st.sampled_from(["ASC", "DESC"]),
)
@settings(**SETTINGS)
def test_fuzz_ordered_agg_directions(spark, duck, pairs, direction):
    cells = ", ".join(f"({o}, {v})" for o, v in pairs)
    q = (
        f"SELECT list(v ORDER BY o {direction}) AS l "
        f"FROM (VALUES {cells}) t(o, v)"
    )
    srows = spark.sql(rewrite(q)).collect()
    drows = duck.execute(q).fetchall()
    assert [list(srows[0].l)] == [list(drows[0][0])], q


# --- ASOF JOIN rewrite -------------------------------------------------------
#
# The LEAD/LAG-bounded interval-join rewrite is the engine's scale-safe
# ASOF spelling; fuzz it against DuckDB's native ASOF JOIN over random
# key/time tables in all four (direction × join-kind) combinations.

asof_rows = st.lists(
    st.tuples(st.integers(1, 2), st.integers(0, 12)),
    min_size=1, max_size=6,
    unique=True,  # duplicate (key, time) pairs make the match ambiguous
)


@given(
    left=asof_rows,
    right=asof_rows,
    op=st.sampled_from([">=", "<="]),
    kind=st.sampled_from(["", "LEFT "]),
)
@settings(**SETTINGS)
def test_fuzz_asof_join(spark, duck, left, right, op, kind):
    lv = ", ".join(f"({k}, {t})" for k, t in left)
    rv = ", ".join(f"({k}, {t})" for k, t in right)
    q = (
        f"SELECT l.k, l.t, r.rt FROM (VALUES {lv}) l(k, t) "
        f"ASOF {kind}JOIN (VALUES {rv}) r(k, rt) "
        f"ON l.k = r.k AND l.t {op} r.rt "
        f"ORDER BY l.k, l.t"
    )
    srows = sorted([tuple(r) for r in spark.sql(rewrite(q)).collect()], key=repr)
    drows = sorted(duck.execute(q).fetchall(), key=repr)
    assert srows == drows, q


# --- QUALIFY / GLOB / macros -------------------------------------------------


@given(
    rows=st.lists(row_strat, min_size=1, max_size=8),
    k=st.integers(1, 4),
    cmp_op=st.sampled_from(["=", "<=", ">="]),
)
@settings(**SETTINGS)
def test_fuzz_qualify(spark, duck, rows, k, cmp_op):
    q = (
        f"SELECT id, g, row_number() OVER "
        f"(PARTITION BY g ORDER BY o, id) AS rn "
        f"FROM {_values_clause(rows)} QUALIFY rn {cmp_op} {k} ORDER BY id"
    )
    srows = [tuple(r) for r in spark.sql(rewrite(q)).collect()]
    drows = duck.execute(q).fetchall()
    assert srows == drows, q


@given(
    s=st.text(alphabet="abc.x*?", min_size=0, max_size=6),
    pat=st.text(alphabet="abc*?", min_size=0, max_size=5),
)
@settings(**SETTINGS)
def test_fuzz_glob(spark, duck, s, pat):
    q = f"SELECT '{s}' GLOB '{pat}' AS m"
    srows = spark.sql(rewrite(q)).collect()[0].m
    drows = duck.execute(q).fetchone()[0]
    assert srows == drows, q


@given(
    a=st.integers(-9, 9),
    b=st.integers(-9, 9),
    c=st.integers(1, 9),
)
@settings(**SETTINGS)
def test_fuzz_macro_expansion(spark, duck, a, b, c):
    from duckdb_server_spark.dialect import run_script, run_sql

    defs = (
        "CREATE OR REPLACE MACRO lin(x, y, k := 2) AS x * k + y;"
        "CREATE OR REPLACE MACRO nested(x, y) AS lin(y, x) - lin(x, y, k := 3);"
    )
    run_script(spark, defs)
    duck.execute("CREATE OR REPLACE MACRO lin(x, y, k := 2) AS x * k + y")
    duck.execute(
        "CREATE OR REPLACE MACRO nested(x, y) AS lin(y, x) - lin(x, y, k := 3)"
    )
    q = f"SELECT nested({a}, {b}) AS n, lin({a}, {b}, k := {c}) AS l"
    srow = run_sql(spark, q).collect()[0]
    drow = duck.execute(q).fetchone()
    assert (srow.n, srow.l) == drow, q


@given(
    rows=st.lists(row_strat, min_size=1, max_size=8),
    fn=st.sampled_from(["sum(v)", "count(v)", "count(*)", "avg(v)", "min(v)", "max(v)"]),
    thresh=st.integers(1, 3),
)
@settings(**SETTINGS)
def test_fuzz_window_filter(spark, duck, rows, fn, thresh):
    """agg FILTER (WHERE …) OVER w → conditional-aggregate rewrite."""
    q = (
        f"SELECT id, {fn} FILTER (WHERE o >= {thresh}) OVER "
        f"(PARTITION BY g ORDER BY o, id "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s "
        f"FROM {_values_clause(rows)} ORDER BY id"
    )
    srows = spark.sql(rewrite(q)).collect()
    drows = duck.execute(q).fetchall()
    for (sid, sv), (did, dv) in zip([tuple(r) for r in srows], drows):
        assert sid == did, q
        if isinstance(sv, float) and isinstance(dv, float):
            assert abs(sv - dv) < 1e-9, q
        else:
            assert sv == dv, q


@given(rows=st.lists(row_strat, min_size=1, max_size=8))
@settings(**SETTINGS)
def test_fuzz_distinct_on(spark, duck, rows):
    """DISTINCT ON keeps the first row per key under the ORDER BY; the
    full ordering (g, o, id) is total, so results are deterministic."""
    q = (
        f"SELECT DISTINCT ON (g) g, o, id FROM {_values_clause(rows)} "
        f"ORDER BY g ASC NULLS LAST, o ASC NULLS LAST, id ASC NULLS LAST"
    )
    srows = [tuple(r) for r in spark.sql(rewrite(q)).collect()]
    drows = duck.execute(q).fetchall()
    assert srows == drows, q


# ---------------------------------------------------------------------------
# Schema-aware len() dispatch: hostile column names over random schemas
# (VERDICT r5 item 2 — the _LEN_ARRAY_NAMES allowlist is gone; dispatch
# resolves the argument's type from the session catalog).
# ---------------------------------------------------------------------------

# names chosen to defeat any allowlist: array-conventional names bound to
# STRING columns, string-conventional names bound to ARRAY columns,
# function-name collisions, and arbitrary identifiers
_HOSTILE_NAMES = [
    "tokens", "words", "w", "embedding", "shingles",  # allowlisted-as-array
    "txt", "body", "s", "name",                        # string-conventional
    "length", "size_", "len_", "val", "zz9",           # collisions/arbitrary
]


@given(
    arr_name=st.sampled_from(_HOSTILE_NAMES),
    str_name=st.sampled_from(_HOSTILE_NAMES),
    lst=int_lists,
    s=words,
)
@settings(**SETTINGS)
def test_fuzz_len_schema_aware(spark, duck, arr_name, str_name, lst, s):
    from hypothesis import assume

    assume(arr_name != str_name)
    duck.execute(
        f"CREATE OR REPLACE VIEW fuzz_len AS "
        f"SELECT {lst} AS {arr_name}, '{s}' AS {str_name}"
    )
    spark.createDataFrame(
        [(lst, s)], f"`{arr_name}` array<int>, `{str_name}` string"
    ).createOrReplaceTempView("fuzz_len")
    q = (
        f"SELECT len({arr_name}) AS la, len({str_name}) AS ls, "
        f"len(t.{arr_name}) AS qa FROM fuzz_len t"
    )
    srow = tuple(spark.sql(rewrite(q, spark)).collect()[0])
    drow = duck.execute(q).fetchone()
    assert srow == drow, q


# ---------------------------------------------------------------------------
# Adversarial read-only gate (VERDICT r5 item 4): random write-shaped
# payloads nested in random routed wrappers must raise through the
# serving path and leave no trace in the catalog.
# ---------------------------------------------------------------------------

_GATE_PAYLOADS = [
    "CREATE TABLE spark_catalog.default.fz_{n} AS SELECT 1 AS c, 2 AS v",
    "DROP TABLE lineitem",
    "INSERT INTO orders VALUES (1)",
    "CACHE TABLE fz_{n} AS SELECT 1 AS c, 2 AS v",
    "CREATE MACRO fz_{n}(a) AS a + 1",
    "COPY (SELECT 1 AS c, 2 AS v) TO '/tmp/fz_{n}.parquet'",
    "SET spark.sql.ansi.enabled=false",
    "CREATE VIEW fz_{n} AS SELECT 1 AS c, 2 AS v",
]

_GATE_WRAPPERS = [
    "WITH w AS ({p}) SELECT * FROM w",
    "SELECT * FROM ({p}) t",
    "PIVOT ({p}) ON c USING sum(v)",
    "UNPIVOT ({p}) ON c INTO NAME k VALUE v",
    "DESCRIBE SELECT * FROM ({p}) t",
    "SELECT 1 AS c UNION BY NAME ({p})",
    "SELECT * FROM (PIVOT ({p}) ON c USING sum(v)) q",
]

_gate_counter = iter(range(10_000_000))


@given(
    payload=st.sampled_from(_GATE_PAYLOADS),
    wrappers=st.lists(st.sampled_from(_GATE_WRAPPERS), min_size=0, max_size=2),
)
@settings(**SETTINGS)
def test_fuzz_readonly_gate_nested(spark, payload, wrappers):
    import os

    import pyarrow.flight as flight

    from duckdb_server_spark import server as srv

    n = next(_gate_counter)
    stmt = payload.format(n=n)
    for w in wrappers:
        stmt = w.format(p=stmt)
    with pytest.raises(flight.FlightServerError):
        srv.resolve_query_frame(spark, stmt).collect()
    assert not spark.catalog.tableExists(f"fz_{n}"), stmt
    assert not spark.catalog.tableExists(f"spark_catalog.default.fz_{n}"), stmt
    assert not os.path.exists(f"/tmp/fz_{n}.parquet"), stmt
    assert spark.conf.get("spark.sql.ansi.enabled") == "true", stmt


@given(a=st.integers(-99, 99), b=st.integers(-9, 9).filter(lambda v: v != 0))
@settings(**SETTINGS)
def test_fuzz_integer_floor_div(spark, duck, a, b):
    """DuckDB `//` on integers truncates toward zero, exactly Spark DIV."""
    q = f"SELECT ({a}) // ({b}) AS d"
    srow = spark.sql(rewrite(q)).collect()[0]
    drow = duck.execute(q).fetchone()
    assert srow[0] == drow[0], q


# ---------------------------------------------------------------------------
# DuckDB-first numeric parity (round 6): under the serving mode the
# libm shims + bit-exact round + double-division typing must make
# arbitrary numeric expressions EXACTLY equal to DuckDB — no tolerance.
# ---------------------------------------------------------------------------

_NUM_FNS = ["sin", "cos", "tan", "atan", "exp", "ln", "log2", "log10"]


@given(
    a=st.integers(1, 99),
    c=st.sampled_from(["51.0", "25.0", "7.5", "3.0"]),
    fn=st.sampled_from(_NUM_FNS),
    extra=st.sampled_from(["", " * 0.9", " + 0.25"]),
)
@settings(**SETTINGS)
def test_fuzz_duckdb_first_numeric_exact(spark, duck, a, c, fn, extra):
    from duckdb_server_spark.dialect import run_sql, serving_dialect

    q = f"SELECT round({fn}({a} / {c}{extra}), 6) AS v, round(degrees({a} / {c}), 6) AS d"
    with serving_dialect():
        srow = run_sql(spark, q).collect()[0]
    drow = duck.execute(q).fetchone()
    assert (srow.v, srow.d) == drow, q  # EXACT — the shims' contract


@given(
    lst=int_lists,
    mul=st.integers(1, 5),
    thr=st.integers(-5, 50),
)
@settings(**SETTINGS)
def test_fuzz_list_comprehension(spark, duck, lst, mul, thr):
    """[expr FOR v IN l IF c] → transform(filter(...)) — values, empty
    results, and nesting inside len() must match DuckDB."""
    q = (
        f"SELECT [x * {mul} FOR x IN {lst} IF x > {thr}] AS v, "
        f"len([x FOR x IN {lst} IF x > {thr}]) AS n"
    )
    srow = spark.sql(rewrite(q)).collect()[0]
    drow = duck.execute(q).fetchone()
    assert (list(srow.v), srow.n) == (list(drow[0]), drow[1]), q


@given(
    keys=st.lists(
        st.text(alphabet="abcxy_", min_size=1, max_size=4).filter(
            lambda k: not k[0].isdigit() and k not in ("as", "or", "and", "if", "in")
        ),
        min_size=1,
        max_size=4,
        unique=True,
    ),
    vals=st.lists(st.integers(-99, 99), min_size=4, max_size=4),
)
@settings(**SETTINGS)
def test_fuzz_struct_literal_field_access(spark, duck, keys, vals):
    """{'k': v, ...}.k agrees for arbitrary keys/values (r7 batch)."""
    body = ", ".join(f"'{k}': {v}" for k, v in zip(keys, vals))
    both(spark, duck, f"SELECT {{{body}}}.{keys[0]} AS v")


@given(lst=int_lists)
@settings(**SETTINGS)
def test_fuzz_list_reduce(spark, duck, lst):
    both(spark, duck, f"SELECT list_reduce({lst}, (x, y) -> x + y * 2) AS r")


@given(lst=int_lists, p=st.floats(0, 1, allow_nan=False))
@settings(**SETTINGS)
def test_fuzz_quantile_disc(spark, duck, lst, p):
    """quantile_disc returns the exact lower-interpolated ELEMENT (never
    an average), for any probability."""
    both(spark, duck, f"SELECT quantile_disc(v, {p!r}) AS q "
                      f"FROM (VALUES {', '.join(f'({x})' for x in lst)}) t(v)")


@given(a=words, b=words)
@settings(**SETTINGS)
def test_fuzz_distance_shims(spark, duck, a, b):
    """jaro/jaro-winkler/damerau/jaccard match DuckDB on random strings
    (empty-input conventions included)."""
    q = (
        f"SELECT jaro_similarity('{a}', '{b}') AS j1, "
        f"jaro_winkler_similarity('{a}', '{b}') AS j2, "
        f"damerau_levenshtein('{a}', '{b}') AS d"
        + (f", jaccard('{a}', '{b}') AS jc" if a and b else "")
    )
    both(spark, duck, q)


@given(
    y=st.integers(1971, 2199), m=st.integers(1, 12), d=st.integers(1, 28),
    part=st.sampled_from(["dow", "isodow"]),
)
@settings(**SETTINGS)
def test_fuzz_dow_isodow(spark, duck, y, m, d, part):
    both(spark, duck,
         f"SELECT datepart('{part}', DATE '{y:04d}-{m:02d}-{d:02d}') AS v")


@given(a=st.integers(0, 9), b=st.integers(0, 5), c=st.integers(1, 3))
@settings(**SETTINGS)
def test_fuzz_power_operator(spark, duck, a, b, c):
    """^ is exponentiation in DuckDB (XOR in Spark) — values and the
    left associativity of chains must match."""
    both(spark, duck, f"SELECT {a} ^ {b} AS p, {a} ** {b} AS q, "
                      f"{a} ^ {b} ^ {c} AS r")


@given(s=words, pat=words.filter(lambda w: w))
@settings(**SETTINGS)
def test_fuzz_tilde_full_match(spark, duck, s, pat):
    both(spark, duck, f"SELECT '{s}' ~ '{pat}' AS m, '{s}' !~ '{pat}' AS n")


@given(lst=int_lists, x=st.integers(-9, 99), op=st.sampled_from(["=", "<>", "<", ">", "<=", ">="]),
       quant=st.sampled_from(["ANY", "ALL"]))
@settings(**SETTINGS)
def test_fuzz_any_all_subqueries(spark, duck, lst, x, op, quant):
    """Quantified comparisons agree on NULL-free subqueries (the NULL
    corner is documented as EXISTS-style false)."""
    vals = ", ".join(f"({v})" for v in lst)
    both(spark, duck,
         f"SELECT {x} {op} {quant}(SELECT v FROM (VALUES {vals}) t(v)) AS a")


@given(a=st.integers(-99, 99), b=st.integers(-4, 4))
@settings(**SETTINGS)
def test_fuzz_div_mod_zero_null(spark, duck, a, b):
    """Division/modulo: NULL on zero divisor, matching values elsewhere.
    Runs under DuckDB-first serving (the path wire clients get)."""
    from duckdb_server_spark.dialect import serving_dialect

    q = f"SELECT {a} / {b} AS d, {a} % {b} AS m"
    with serving_dialect(True):
        from duckdb_server_spark.dialect import run_sql

        srow = run_sql(spark, q).collect()[0]
    drow = duck.execute(q).fetchone()
    for g, w in zip(list(srow), list(drow)):
        if isinstance(g, float) and isinstance(w, float):
            assert abs(g - w) < 1e-9, q
        else:
            assert g == w, f"{q}: {g!r} != {w!r}"
