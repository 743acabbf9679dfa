"""Parquet-introspection and catalog metadata TVFs —
parquet_file_metadata / parquet_schema / parquet_metadata (pyarrow
footer walk, one row per row-group×column with real statistics),
duckdb_indexes / duckdb_settings / duckdb_databases. The parquet TVFs
are differential against DuckDB over the same files on every
engine-independent field (row counts, schema names/types/repetition,
per-column min/max/null stats, compression).
"""

from __future__ import annotations

import pytest

from duckdb_server_spark.dialect import (
    execute_statement,
    register_dialect_functions,
    run_sql,
    serving_dialect,
)

P = "/root/testdata/sf0.001/nation.parquet"
O = "/root/testdata/sf0.001/orders.parquet"


@pytest.fixture(scope="module")
def sql_session(spark):
    register_dialect_functions(spark)
    return spark


def _match(spark, duck, sql: str):
    with serving_dialect(True):
        ours = sorted(tuple(r) for r in run_sql(spark, sql).collect())
    theirs = sorted(duck.execute(sql).fetchall())
    assert ours == theirs, f"{sql!r}: {ours[:3]} != {theirs[:3]}"


@pytest.mark.parametrize(
    "sql",
    [
        f"SELECT file_name, num_rows, num_row_groups, format_version"
        f" FROM parquet_file_metadata('{P}')",
        f"SELECT name, type, repetition_type, num_children"
        f" FROM parquet_schema('{P}') ORDER BY name NULLS LAST",
        f"SELECT path_in_schema, row_group_id, row_group_num_rows,"
        f" num_values, stats_min_value, stats_max_value, stats_null_count,"
        f" compression FROM parquet_metadata('{P}')"
        " ORDER BY path_in_schema",
        # a bigger file: every row group enumerated
        f"SELECT count(*) AS n, sum(row_group_num_rows) AS rows_x_cols"
        f" FROM parquet_metadata('{O}')",
    ],
)
def test_parquet_tvfs_differential(sql_session, duck, sql):
    _match(sql_session, duck, sql)


def test_parquet_tvf_joins_like_a_table(sql_session, duck):
    # the layout-debugging join: schema × metadata over the same file
    sql = (
        f"SELECT s.name, m.stats_min_value FROM parquet_schema('{P}') s"
        f" JOIN parquet_metadata('{P}') m ON s.name = m.path_in_schema"
        " ORDER BY s.name"
    )
    _match(sql_session, duck, sql)


def test_duckdb_databases_and_indexes(sql_session, duck):
    _match(
        sql_session,
        duck,
        "SELECT database_name, path, type FROM duckdb_databases()"
        " WHERE database_name = 'memory'",
    )
    execute_statement(sql_session, "CREATE TABLE mtv_t AS SELECT 1 AS a")
    execute_statement(sql_session, "CREATE INDEX mtv_idx ON mtv_t (a)")
    with serving_dialect(True):
        rows = run_sql(
            sql_session,
            "SELECT index_name, table_name, is_unique FROM duckdb_indexes()"
            " WHERE index_name = 'mtv_idx'",
        ).collect()
    assert rows == [("mtv_idx", "mtv_t", False)]
    execute_statement(sql_session, "DROP INDEX mtv_idx")
    execute_statement(sql_session, "DROP TABLE mtv_t")


def test_duckdb_settings_reflects_set(sql_session):
    execute_statement(sql_session, "SET memory_limit='64GB'")
    with serving_dialect(True):
        rows = run_sql(
            sql_session,
            "SELECT value FROM duckdb_settings() WHERE name = 'memory_limit'",
        ).collect()
    assert rows == [("64GB",)]
