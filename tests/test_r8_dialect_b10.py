"""Dialect probe battery 10 — partitioned COPY, lateral unnest,
standalone generate_subscripts. Differential against live DuckDB,
including a cross-engine hive-layout readback for COPY PARTITION_BY.
"""

from __future__ import annotations

import glob
import os

import pytest

from duckdb_server_spark.dialect import (
    execute_statement,
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


def _match(spark, duck, sql: str):
    with serving_dialect(True):
        ours = sorted(tuple(r) for r in run_sql(spark, sql).collect())
    theirs = sorted(duck.execute(sql).fetchall())
    assert ours == theirs, f"{sql!r}: {ours[:2]} != {theirs[:2]}"


# --- COPY ... TO with PARTITION_BY ----------------------------------------


def test_copy_partition_by_hive_layout(sql_session, duck, tmp_path):
    """Partitioned COPY writes the hive layout DuckDB itself reads back
    (the 100 TB sink shape: one writer task per partition value, no
    single-file coalesce)."""
    out = str(tmp_path / "part_out")
    execute_statement(
        sql_session,
        f"COPY (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders) "
        f"TO '{out}' (FORMAT parquet, PARTITION_BY (o_orderstatus), "
        f"COMPRESSION zstd)",
    )
    dirs = {os.path.basename(p) for p in glob.glob(out + "/o_orderstatus=*")}
    assert dirs == {"o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"}
    back = duck.execute(
        f"SELECT o_orderstatus, count(*), round(sum(o_totalprice), 2) "
        f"FROM read_parquet('{out}/**/*.parquet', hive_partitioning=true) "
        f"GROUP BY 1 ORDER BY 1"
    ).fetchall()
    src = duck.execute(
        "SELECT o_orderstatus, count(*), round(sum(o_totalprice), 2) "
        "FROM orders GROUP BY 1 ORDER BY 1"
    ).fetchall()
    assert back == src


def test_copy_csv_delimiter(sql_session, tmp_path):
    out = str(tmp_path / "c_out")
    execute_statement(
        sql_session,
        f"COPY (SELECT o_orderkey, o_orderstatus FROM orders "
        f"WHERE o_orderkey < 10) TO '{out}' (FORMAT csv, DELIMITER '|')",
    )
    # round 15: unpartitioned COPY TO writes a single plain FILE at the
    # path (the DuckDB contract), not a Spark part-file directory
    import os

    assert os.path.isfile(out)
    assert open(out).readline().strip() == "o_orderkey|o_orderstatus"


def test_copy_plain_single_file_unchanged(sql_session, duck, tmp_path):
    out = str(tmp_path / "plain.parquet")
    execute_statement(
        sql_session,
        f"COPY (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 5) "
        f"TO '{out}'",
    )
    # round 15: DuckDB opens the path AS A FILE — the exact interop the
    # directory shape used to break
    import os

    assert os.path.isfile(out)
    n = duck.execute(
        f"SELECT count(*) FROM read_parquet('{out}')"
    ).fetchone()[0]
    assert n == 5


# --- lateral unnest table function ----------------------------------------


def test_lateral_unnest_comma_join(sql_session, duck):
    _match(
        sql_session,
        duck,
        "SELECT u.x FROM (SELECT [1,2,3] AS arr) t, unnest(t.arr) u(x) "
        "ORDER BY u.x",
    )


def test_lateral_unnest_default_column_name(sql_session, duck):
    # without a column alias DuckDB names the output after the source column
    _match(
        sql_session,
        duck,
        "SELECT u.arr FROM (SELECT [4,5] AS arr) t, unnest(t.arr) u "
        "ORDER BY u.arr",
    )


def test_lateral_unnest_cross_join(sql_session, duck):
    _match(
        sql_session,
        duck,
        "SELECT w.y FROM (SELECT [1,2] AS arr) t "
        "CROSS JOIN unnest(t.arr) AS w(y) ORDER BY w.y",
    )


# --- generate_subscripts ---------------------------------------------------


def test_generate_subscripts_standalone(sql_session, duck):
    _match(sql_session, duck, "SELECT generate_subscripts([10,20,30], 1) AS i")


def test_generate_subscripts_zipped_form_still_works(sql_session, duck):
    _match(
        sql_session,
        duck,
        "SELECT generate_subscripts(arr, 1) AS i, unnest(arr) AS v "
        "FROM (SELECT [7,8,9] AS arr) ORDER BY i",
    )


def test_scalar_unnest_unaffected(sql_session, duck):
    _match(sql_session, duck, "SELECT unnest([1,2,3]) AS u")


# --- interval RANGE frames (confirmed native, pinned) ----------------------


def test_interval_range_frame(sql_session, duck):
    from duckdb_server_spark.session import register_views

    register_views(sql_session, SF_DIR, ("events",))
    _match(
        sql_session,
        duck,
        "SELECT event_id, sum(value) OVER (ORDER BY CAST(ts AS TIMESTAMP) "
        "RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW) AS s "
        "FROM events WHERE event_id < 50 ORDER BY event_id",
    )
