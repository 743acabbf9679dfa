"""SUMMARIZE in DuckDB 1.0's exact column shape — differential on the
deterministic fields (column_name, column_type, min, max, count,
null_percentage); approx_unique / quartiles / avg / std are sketch-based
on BOTH engines (HLL, sampled quantiles), so those are bounds-checked
rather than value-compared. Also covers the SUMMARIZE SELECT … and
SUMMARIZE 'file.parquet' target forms.
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
    register_views(spark, SF_DIR, ("orders", "nation"))
    return spark


EXACT = ("column_name", "column_type", "min", "max", "count", "null_percentage")


def _exact_fields(spark, duck, sql: str, duck_sql: str | None = None):
    with serving_dialect(True):
        df = run_sql(spark, sql)
    sql = duck_sql or sql
    assert df.columns == [
        "column_name", "column_type", "min", "max", "approx_unique",
        "avg", "std", "q25", "q50", "q75", "count", "null_percentage",
    ]
    ours = {r["column_name"]: r for r in df.collect()}
    cols = [d[0] for d in duck.execute(sql).description]
    theirs = {
        row[0]: dict(zip(cols, row)) for row in duck.execute(sql).fetchall()
    }
    assert set(ours) == set(theirs)
    for name, their in theirs.items():
        our = ours[name]
        for f in EXACT:
            assert str(our[f]) == str(their[f]), (
                f"{name}.{f}: {our[f]!r} != {their[f]!r}"
            )
        # sketch fields: same nullness, and HLL within 15% when present
        for f in ("approx_unique", "q25", "q50", "q75"):
            assert (our[f] is None) == (their[f] is None), f"{name}.{f}"
        if their["approx_unique"] and their["approx_unique"] > 10:
            ratio = our["approx_unique"] / their["approx_unique"]
            assert 0.85 <= ratio <= 1.15, f"{name}: HLL ratio {ratio}"
    return ours


def test_summarize_table_differential(sql_session, duck):
    duck.execute(
        "CREATE VIEW IF NOT EXISTS orders AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/orders.parquet')"
    )
    _exact_fields(sql_session, duck, "SUMMARIZE orders")


def test_summarize_select_differential(sql_session, duck):
    duck.execute(
        "CREATE VIEW IF NOT EXISTS nation AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/nation.parquet')"
    )
    _exact_fields(
        sql_session,
        duck,
        "SUMMARIZE SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 10",
    )


def test_summarize_file_target(sql_session, duck):
    # DuckDB 1.0's parser lacks the bare quoted-file form (added later);
    # the SELECT-wrapped spelling is its own equivalent
    _exact_fields(
        sql_session,
        duck,
        f"SUMMARIZE '{SF_DIR}/nation.parquet'",
        duck_sql=f"SUMMARIZE SELECT * FROM '{SF_DIR}/nation.parquet'",
    )
