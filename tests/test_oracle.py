"""Differential oracle tests (SURVEY.md §5): every declared query runs on
Spark AND on DuckDB over the same parquet; results must match on
row-count + schema column names + order-insensitive values.

This mirrors the driver's CORRECTNESS gate so failures surface locally
before a round is judged.
"""

from __future__ import annotations

import math

import pytest

from duckdb_server_spark import catalog

catalog.load_all()

ORACLE_NAMES = sorted(catalog.ORACLE)
ROWS_ONLY_NAMES = sorted(set(catalog.QUERIES) - set(catalog.ORACLE))


def _canon(value):
    """Canonicalize a cell for order-insensitive multiset comparison."""
    if value is None:
        return None
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        # collapse float noise below round-trip precision
        return round(value, 9)
    if isinstance(value, (list, tuple)):
        return tuple(_canon(v) for v in value)
    if isinstance(value, dict):
        return tuple(sorted((k, _canon(v)) for k, v in value.items()))
    return value


def _rows_multiset(cols, rows):
    """Sort columns by name (driver convention), canonicalize, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(name, spark, duck, sf_dir):
    sdf = catalog.QUERIES[name](spark, sf_dir)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.execute(catalog.ORACLE[name])
    duck_cols = [d[0].lower() for d in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s = _rows_multiset(spark_cols, spark_rows)
    d = _rows_multiset(duck_cols, duck_rows)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:5]}"


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only(name, spark, sf_dir):
    """Weaker check for non-SQL-expressible ops: runs, stable schema, ≥0 rows."""
    sdf = catalog.QUERIES[name](spark, sf_dir)
    assert sdf.columns
    assert sdf.count() >= 0


def test_b03_planted_pair_guard(spark, sf_dir):
    """The rows-only b03 entry must never go vacuous: the query plants an
    exact duplicate (doc -1 ≡ doc 0) and reports candidate recall over it
    in every row — assert the guard column is live and positive."""
    rows = catalog.QUERIES["b03_minhash_lsh_pairs"](spark, sf_dir).limit(5).collect()
    assert rows, "b03 returned zero candidate pairs (vacuous)"
    assert all(r.planted_pairs_found >= 1 for r in rows)


def test_b03_main_branch_emits_planted_pair(spark, sf_dir):
    """ADVICE r4: the in-row guard recomputes recall over a 2-doc pruned
    branch (a different code path from the lineage-truncated full-corpus
    branch). Assert the MAIN candidate output itself contains a pair
    touching the planted doc -1, so a recall regression confined to the
    full-corpus branch cannot hide behind a green guard column."""
    from pyspark.sql import functions as F

    cands = catalog.QUERIES["b03_minhash_lsh_pairs"](spark, sf_dir)
    touching = cands.filter((F.col("id_a") == -1) | (F.col("id_b") == -1)).count()
    assert touching >= 1, "planted pair missing from the full-corpus output"


def test_b04_planted_fingerprint_guard(spark, sf_dir):
    """b04's planted duplicate (doc -1 ≡ doc 0) must hash to an identical
    fingerprint. The full differential oracle pins every value; this keeps
    the ground-truth property visible as a direct assertion too."""
    from pyspark.sql import functions as F

    fp = catalog.QUERIES["b04_simhash"](spark, sf_dir)
    pair = {r.doc_id: r.simhash for r in fp.filter(F.col("doc_id").isin(-1, 0)).collect()}
    assert set(pair) == {-1, 0}
    assert pair[-1] == pair[0]


def test_entry_smoke(spark):
    """Mirror the driver's smoke: entry() returns rows with a stable schema
    (the reference's smoke is `SELECT 1 AS a`, client/main.py:11)."""
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert "sum_qty" in df.columns


def test_contract_shapes():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert all(callable(f) for f in qs.values())
