"""Property-based differential testing (SQLancer-style): hypothesis
generates random predicates/expressions, the SAME SQL text runs on Spark
SQL and DuckDB over identical parquet, and the row multisets must match.

This probes the long tail of the SQL surface that the reference exposes
via passthrough (main.go:229) but no hand-written query covers: operator
precedence, null propagation, comparison edge cases, arithmetic typing.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

# Column → safe constant range (FIXTURES.md domains; constants stay inside
# so predicates exercise both selective and non-selective paths).
NUM_COLS = {
    "l_quantity": (1.0, 50.0),
    "l_extendedprice": (900.0, 100000.0),
    "l_discount": (0.0, 0.1),
    "l_tax": (0.0, 0.08),
    "l_linenumber": (1, 7),
    "l_orderkey": (1, 6000),
}
CMP_OPS = ["<", "<=", ">", ">=", "=", "<>"]
STR_PREDS = [
    "l_returnflag = 'R'",
    "l_returnflag <> 'N'",
    "l_linestatus = 'O'",
    "l_returnflag IN ('A', 'N')",
    "l_returnflag IS NOT NULL",
]


@st.composite
def atomic_pred(draw) -> str:
    if draw(st.booleans()):
        col = draw(st.sampled_from(sorted(NUM_COLS)))
        lo, hi = NUM_COLS[col]
        if isinstance(lo, int):
            const = draw(st.integers(int(lo), int(hi)))
        else:
            const = round(draw(st.floats(lo, hi, allow_nan=False)), 2)
        op = draw(st.sampled_from(CMP_OPS))
        return f"{col} {op} {const}"
    return draw(st.sampled_from(STR_PREDS))


def boolean_pred():
    return st.recursive(
        atomic_pred(),
        lambda children: st.tuples(
            children, st.sampled_from(["AND", "OR"]), children
        ).map(lambda t: f"({t[0]} {t[1]} {t[2]})")
        | children.map(lambda c: f"(NOT {c})"),
        max_leaves=4,
    )


@st.composite
def numeric_expr(draw) -> str:
    """Arithmetic over numeric columns; division avoided (ANSI-mode
    div-by-zero raises on both engines but at different rows)."""
    a = draw(st.sampled_from(["l_quantity", "l_extendedprice", "l_discount"]))
    b = draw(st.sampled_from(["l_quantity", "l_tax", "l_linenumber"]))
    op = draw(st.sampled_from(["+", "-", "*"]))
    k = round(draw(st.floats(-10, 10, allow_nan=False)), 2)
    return f"({a} {op} {b}) + {k}"


def _normalize(row):
    """NaN → sentinel and -0.0 → 0.0 BEFORE sorting: the two zeros are
    == but repr-sort differently, which would misalign the pairing."""
    return tuple(
        "NaN"
        if isinstance(v, float) and math.isnan(v)
        else v + 0.0
        if isinstance(v, float)
        else v
        for v in row
    )


def _run_both(spark, duck, sql: str):
    srows = sorted(
        (_normalize(tuple(r)) for r in spark.sql(sql).collect()), key=repr
    )
    drows = sorted((_normalize(t) for t in duck.execute(sql).fetchall()), key=repr)
    return srows, drows


def _canon(rows):
    # rows from _run_both are already normalized + sorted
    return [_normalize(row) for row in rows]


@pytest.fixture(scope="module", autouse=True)
def _views(spark, sf_dir):
    from duckdb_server_spark.session import register_views

    register_views(spark, sf_dir)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=boolean_pred())
def test_random_predicates(spark, duck, pred):
    sql = f"SELECT l_orderkey, l_linenumber FROM lineitem WHERE {pred}"
    srows, drows = _run_both(spark, duck, sql)
    assert srows == drows, f"predicate divergence: {pred}"


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(expr=numeric_expr())
def test_random_numeric_expressions(spark, duck, expr):
    sql = (
        f"SELECT l_orderkey, round(CAST({expr} AS DOUBLE), 6) AS v "
        f"FROM lineitem WHERE l_orderkey < 200"
    )
    srows, drows = _run_both(spark, duck, sql)
    s, d = _canon(srows), _canon(drows)
    assert len(s) == len(d), f"row-count divergence: {expr}"
    # tolerance, not bit equality: an expression landing exactly on a
    # .xxxxxx5 boundary rounds differently per engine (Spark rounds the
    # shortest decimal repr, DuckDB the binary value) — the same pinned
    # class as fn_trig in tools/dialect_coverage.py
    for (sk, sv), (dk, dv) in zip(s, d):
        assert sk == dk, f"key divergence: {expr}"
        if isinstance(sv, float) and isinstance(dv, float):
            assert abs(sv - dv) <= 2e-6, f"expression divergence: {expr}"
        else:
            assert sv == dv, f"expression divergence: {expr}"


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=boolean_pred())
def test_random_aggregate_consistency(spark, duck, pred):
    """count(*) under a random predicate — the cheapest full-row check."""
    sql = f"SELECT count(*) AS n FROM lineitem WHERE {pred}"
    srows, drows = _run_both(spark, duck, sql)
    assert srows == drows, f"aggregate divergence: {pred}"


JOIN_TYPES = ["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    how=st.sampled_from(JOIN_TYPES),
    pred=atomic_pred(),
    exists=st.sampled_from(["EXISTS", "NOT EXISTS"]),
)
def test_random_joins_and_subqueries(spark, duck, how, pred, exists):
    """Join types share SQL syntax on both engines; semi/anti exercised
    through (NOT) EXISTS which Catalyst rewrites to semi/anti joins."""
    sql = (
        f"SELECT o_orderkey, count(l_linenumber) AS n "
        f"FROM orders {how} lineitem ON l_orderkey = o_orderkey AND ({pred}) "
        f"WHERE {exists} (SELECT 1 FROM customer "
        f"                WHERE c_custkey = o_custkey AND c_acctbal > 0) "
        f"GROUP BY o_orderkey"
    )
    srows, drows = _run_both(spark, duck, sql)
    assert srows == drows, f"join divergence: {how} / {pred} / {exists}"


WINDOW_FUNCS = [
    "rank()",
    "dense_rank()",
    "count(*)",
    "sum(l_quantity)",
    "min(l_extendedprice)",
]
PARTITION_COLS = ["l_returnflag", "l_linestatus", "l_returnflag, l_linestatus"]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(fn=st.sampled_from(WINDOW_FUNCS), part=st.sampled_from(PARTITION_COLS))
def test_random_window_functions(spark, duck, fn, part):
    """Window functions with the default (RANGE-to-current-row) frame:
    the fixture has duplicate (l_orderkey, l_linenumber) pairs, so ROWS
    frames and row_number are legitimately nondeterministic under ties —
    the default frame includes all peers, and rank/dense_rank/aggregates
    over it are tie-stable on both engines. (Explicit RANGE is rejected
    by Spark for ranking functions, hence the bare OVER clause.)"""
    sql = (
        f"SELECT l_orderkey, l_linenumber, "
        f"CAST({fn} OVER (PARTITION BY {part} "
        f"ORDER BY l_orderkey ASC NULLS LAST, l_linenumber ASC NULLS LAST"
        f") AS DOUBLE) AS v "
        f"FROM lineitem WHERE l_orderkey < 500"
    )
    srows, drows = _run_both(spark, duck, sql)
    assert _canon(srows) == _canon(drows), f"window divergence: {fn} / {part}"


GROUPING_SHAPES = [
    "GROUPING SETS ((l_returnflag), (l_linestatus), ())",
    "GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag))",
    "ROLLUP (l_returnflag, l_linestatus)",
    "CUBE (l_returnflag, l_linestatus)",
]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(shape=st.sampled_from(GROUPING_SHAPES), pred=boolean_pred())
def test_random_grouping_sets(spark, duck, shape, pred):
    """Superaggregate shapes × random predicates: grouping() indicators
    disambiguate real NULL group keys from the superaggregate rows.
    Empty inputs are assumed away: Spark omits the standard's ()
    grand-total row over zero rows (pinned in test_semantics.py)."""
    assume(
        duck.execute(f"SELECT count(*) FROM lineitem WHERE {pred}").fetchone()[0]
        > 0
    )
    sql = (
        "SELECT l_returnflag, l_linestatus, "
        "CAST(grouping(l_returnflag) AS INT) AS g1, "
        "CAST(grouping(l_linestatus) AS INT) AS g2, "
        f"count(*) AS n FROM lineitem WHERE {pred} GROUP BY {shape}"
    )
    srows, drows = _run_both(spark, duck, sql)
    assert srows == drows, f"grouping divergence: {shape} / {pred}"


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=boolean_pred())
def test_random_set_operations(spark, duck, pred):
    """INTERSECT/EXCEPT [ALL] between predicate-split halves of the same
    relation — bag semantics must match exactly."""
    for op in ("INTERSECT", "INTERSECT ALL", "EXCEPT", "EXCEPT ALL"):
        sql = (
            f"SELECT l_suppkey FROM lineitem WHERE {pred} "
            f"{op} "
            f"SELECT l_suppkey FROM lineitem WHERE l_quantity > 25"
        )
        srows, drows = _run_both(spark, duck, sql)
        assert srows == drows, f"set-op divergence: {op} / {pred}"


@st.composite
def string_fn_expr(draw) -> str:
    """Random string-function expression over documents.text — probes the
    declared string surface (SURVEY.md §2.9: SUBSTR/TRIM/LENGTH/REPLACE/
    UPPER/LOWER/INSTR are 1-based/semantics-sensitive)."""
    # Pinned divergence (see test_semantics): substr position 0 — Spark
    # clamps 0 to 1 while DuckDB yields '' (0 consumes part of the length
    # window before character 1). Declared queries use 1-based positions;
    # the fuzzer skips 0.
    start = draw(st.integers(-3, 12).filter(lambda s: s != 0))
    length = draw(st.integers(0, 9))
    needle = draw(st.sampled_from(["a", "e", "th", "zz", " ", ""]))
    return draw(
        st.sampled_from(
            [
                f"substr(text, {start}, {length})",
                f"upper(substr(text, {start}))",
                f"instr(text, '{needle}')",
                f"length(replace(text, '{needle}', '#'))",
                "ltrim(rtrim(concat('  ', text, '  ')))",
                f"left(text, {length})",
                f"right(text, {length})",
                f"lpad(substr(text, 1, 4), {length + 4}, '.')",
                "reverse(lower(text))",
                f"split_part(text, ' ', {max(1, start)})",
            ]
        )
    )


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(expr=string_fn_expr())
def test_random_string_functions(spark, duck, expr):
    sql = f"SELECT doc_id, {expr} AS v FROM documents WHERE doc_id < 100"
    srows, drows = _run_both(spark, duck, sql)
    assert srows == drows, f"string fn divergence: {expr}"


def test_embedding_near_dup_emits_planted_pairs(spark, sf_dir):
    """b12 must demonstrably emit the planted near-dup pairs (the corpus
    itself has no natural near-dups): every pair links an original to its
    +1_000_000 clone at cosine ≥ 0.99."""
    from duckdb_server_spark.catalog.beyond import b12_embedding_near_dup

    rows = b12_embedding_near_dup(spark, sf_dir).collect()
    assert len(rows) > 0, "planted near-dups must surface"
    for r in rows:
        assert r.id_b == r.id_a + 1_000_000
        assert r.cos_sim >= 0.99


def test_lsh_buckets_actually_partition(spark, sf_dir):
    """Hyperplane LSH must produce many balanced buckets — round 1's
    planes were 16-dim against 64-dim vectors (zip_with NULL-padded the
    dot product) and every vector landed in bucket 0, silently turning
    the 'bucketed' joins into full N² self-joins."""
    from pyspark.sql import functions as F

    from duckdb_server_spark.catalog.beyond import _HYPERPLANES, _HYPERPLANES_DEDUP
    from duckdb_server_spark.operators import similarity
    from duckdb_server_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    dim = len(emb.first().embedding)
    assert all(len(p) == dim for p in _HYPERPLANES + _HYPERPLANES_DEDUP)
    n = emb.count()
    for planes, min_buckets in ((_HYPERPLANES, 32), (_HYPERPLANES_DEDUP, 64)):
        sig = emb.select(
            similarity.hyperplane_signature(F.col("embedding"), planes).alias("b")
        )
        stats = (
            sig.groupBy("b").count()
            .agg(F.count("*").alias("nb"), F.max("count").alias("mx"))
            .collect()[0]
        )
        assert stats.nb >= min_buckets, f"only {stats.nb} buckets"
        assert stats.mx <= max(8, n // 4), f"dominant bucket of {stats.mx}/{n}"


def test_minhash_lsh_finds_planted_duplicates(spark, sf_dir):
    """MinHash-LSH must surface genuinely similar pairs as candidates:
    plant exact and one-word-edit copies of real texts and assert each
    planted pair is in the candidate set (the corpus itself has no
    near-dups, so without planting this operator's recall is untestable)."""
    from pyspark.sql import functions as F

    from duckdb_server_spark.operators.dedup import minhash_lsh_candidates
    from duckdb_server_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    exact = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text"
    )
    edited = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 20_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzzedit")).alias("text"),
    )
    staged = docs.unionByName(exact).unionByName(edited)
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(staged, "text", "doc_id").collect()
    }
    for i in range(10):
        assert (i, i + 10_000) in pairs, f"exact dup {i} not a candidate"
    hits = sum((i, i + 20_000) in pairs for i in range(10))
    assert hits >= 8, f"only {hits}/10 one-word-edit dups surfaced"


def test_lsh_and_ivf_topk_selfhit_and_subset(spark, sf_dir):
    """ANN sanity: every query's rank-1 hit is itself (cos ≈ 1 — the
    query vector is in the corpus and always shares its own bucket/cell),
    and every (query, hit, score) the ANN emits matches the brute-force
    score exactly (ANN may miss neighbors, never mis-score them)."""
    from duckdb_server_spark.catalog.beyond import (
        b10_knn_bruteforce,
        b11_lsh_topk,
        b13_ivf_topk,
    )

    brute = {
        (r.query_id, r.vec_id): r.cos_sim for r in b10_knn_bruteforce(spark, sf_dir).collect()
    }
    for fn in (b11_lsh_topk, b13_ivf_topk):
        rows = fn(spark, sf_dir).collect()
        by_query = {}
        for r in rows:
            by_query.setdefault(r.query_id, []).append(r)
        for qid, hits in by_query.items():
            top = min(hits, key=lambda r: r.rank)
            assert top.vec_id == qid and top.cos_sim > 0.999, (fn.__name__, qid)
            for r in hits:
                if (r.query_id, r.vec_id) in brute:
                    assert abs(round(r.cos_sim, 6) - brute[(r.query_id, r.vec_id)]) < 1e-6


def test_simhash_identical_for_copies_near_for_edits(spark, sf_dir):
    """SimHash must give identical fingerprints for exact copies and
    small Hamming distance for one-word edits (the property dedup relies
    on); unrelated docs should differ in many bits."""
    from pyspark.sql import functions as F

    from duckdb_server_spark.operators.dedup import simhash_fingerprint
    from duckdb_server_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(20)
    copies = docs.select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
    edits = docs.select(
        (F.col("doc_id") + 20_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzzedit")).alias("text"),
    )
    fp = {
        r.doc_id: r.simhash
        for r in simhash_fingerprint(
            docs.unionByName(copies).unionByName(edits), "text", "doc_id"
        ).collect()
    }

    def hamming(a: int, b: int) -> int:
        return bin((a ^ b) & 0xFFFFFFFF).count("1")

    for i in range(20):
        assert fp[i] == fp[i + 10_000], "exact copy must hash identically"
        assert hamming(fp[i], fp[i + 20_000]) <= 6, "one-word edit must stay near"
    far = [hamming(fp[i], fp[j]) for i in range(10) for j in range(10, 20)]
    assert sum(d > 6 for d in far) >= len(far) * 0.8, "unrelated docs must differ"


DT_EXPRS = [
    "year({c})",
    "month({c})",
    "day({c})",
    "quarter({c})",
    "hour({c})",
    "minute({c})",
    "CAST(date_trunc('year', {c}) AS TIMESTAMP)",
    "CAST(date_trunc('month', {c}) AS TIMESTAMP)",
    "CAST(date_trunc('day', {c}) AS TIMESTAMP)",
    "CAST(date_trunc('hour', {c}) AS TIMESTAMP)",
    "{c} + INTERVAL 7 DAY",
    "{c} - INTERVAL 36 HOUR",
]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    expr=st.sampled_from(DT_EXPRS),
    cutoff=st.sampled_from(
        ["1995-06-17", "1997-01-01", "1998-11-30", "2001-02-28"]
    ),
)
def test_random_datetime_functions(spark, duck, expr, cutoff):
    """Datetime function family over o_orderdate with random cutoffs —
    the same shared-dialect differential as the string fuzzer. Output
    cast to TIMESTAMP/BIGINT so both pandas bridges agree."""
    e = expr.format(c="o_orderdate")
    cast = "CAST({} AS TIMESTAMP)" if "INTERVAL" in expr or "TIMESTAMP" in expr else "CAST({} AS BIGINT)"
    sql = (
        f"SELECT o_orderkey, {cast.format(e)} AS v FROM orders "
        f"WHERE o_orderdate >= TIMESTAMP '{cutoff} 00:00:00' "
        f"ORDER BY o_orderkey ASC NULLS LAST LIMIT 500"
    )
    srows, drows = _run_both(spark, duck, sql)
    assert srows == drows, f"datetime divergence: {e} @ {cutoff}"
