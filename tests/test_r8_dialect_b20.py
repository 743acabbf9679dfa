"""Dialect probe battery 20 — file-reader option breadth: read_csv
columns={…} explicit schemas (DuckDB type spellings), names=[…],
quote/escape/nullstr/dateformat pass-throughs, hive_partitioning over
glob paths (basePath-anchored partition-column inference), the glob()
table function, filename=true, and a fail-closed skip= (Spark has no
skip-N-preamble option — silently returning unskipped rows would be a
wrong answer). Differential against live DuckDB over generated files.
"""

from __future__ import annotations

import os

import pytest

from duckdb_server_spark.dialect import (
    register_dialect_functions,
    run_sql,
    serving_dialect,
)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("b20")
    (d / "a.csv").write_text("x|y\n1|foo\n2|bar\n")
    (d / "b.csv").write_text('x|y\n3|"b|z"\n')
    (d / "nohdr.csv").write_text("7;abc\n8;def\n")
    (d / "nulls.csv").write_text("x,y\n1,NA\n2,ok\n")
    import pyarrow as pa
    import pyarrow.parquet as pq

    for dt, vals in (("2020-01-01", [1, 2]), ("2020-01-02", [3])):
        p = d / "hive" / f"dt={dt}"
        p.mkdir(parents=True)
        pq.write_table(pa.table({"v": vals}), str(p / "part.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def sql_session(spark):
    register_dialect_functions(spark)
    return spark


def _match(spark, duck, sql: str):
    with serving_dialect(True):
        ours = sorted(tuple(r) for r in run_sql(spark, sql).collect())
    theirs = sorted(duck.execute(sql).fetchall())
    assert ours == theirs, f"{sql!r}: {ours[:3]} != {theirs[:3]}"


def test_csv_columns_schema_b20(sql_session, duck, data_dir):
    _match(
        sql_session,
        duck,
        f"SELECT * FROM read_csv('{data_dir}/nohdr.csv', delim=';',"
        " header=false, columns={'i': 'INTEGER', 's': 'VARCHAR'})"
        " ORDER BY i",
    )


def test_csv_names_b20(sql_session, duck, data_dir):
    _match(
        sql_session,
        duck,
        f"SELECT * FROM read_csv('{data_dir}/nohdr.csv', delim=';',"
        " header=false, names=['i','s']) ORDER BY i",
    )


def test_csv_quote_and_nullstr_b20(sql_session, duck, data_dir):
    _match(
        sql_session,
        duck,
        f"SELECT * FROM read_csv('{data_dir}/b.csv', delim='|',"
        " header=true, quote='\"') ORDER BY x",
    )
    _match(
        sql_session,
        duck,
        f"SELECT * FROM read_csv('{data_dir}/nulls.csv', header=true,"
        " nullstr='NA') ORDER BY x",
    )


def test_hive_partitioning_b20(sql_session, duck, data_dir):
    _match(
        sql_session,
        duck,
        f"SELECT v, CAST(dt AS DATE) AS dt FROM"
        f" read_parquet('{data_dir}/hive/*/*.parquet',"
        " hive_partitioning=true) ORDER BY v",
    )


def test_glob_table_function_b20(sql_session, duck, data_dir):
    _match(
        sql_session,
        duck,
        f"SELECT parse_filename(file) AS f FROM glob('{data_dir}/*.csv')"
        " ORDER BY f",
    )


def test_filename_column_b20(sql_session, duck, data_dir):
    _match(
        sql_session,
        duck,
        f"SELECT x, y, parse_filename(filename) AS f FROM"
        f" read_csv('{data_dir}/a.csv', delim='|', header=true,"
        " filename=true) ORDER BY x",
    )


def test_skip_fails_closed_b20(sql_session, data_dir):
    with serving_dialect(True), pytest.raises(ValueError, match="skip"):
        run_sql(
            sql_session,
            f"SELECT * FROM read_csv('{data_dir}/a.csv', delim='|', skip=1)",
        ).collect()


@pytest.fixture(scope="module")
def sniff_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sniff")
    (d / "semi.csv").write_text("a;b;c\n1;x;2.5\n2;y;3.5\n")
    (d / "tab.csv").write_text("a\tb\n1\tx\n")
    (d / "nohead.csv").write_text("1,2.5,x\n2,3.5,y\n")
    (d / "plain.csv").write_text("a,b\n1,x\n2,y\n")
    return str(d)


@pytest.mark.parametrize(
    "fname,order",
    [
        ("semi.csv", "a"),      # ';' sniffed
        ("tab.csv", "a"),       # tab sniffed
        ("nohead.csv", "column0"),  # headerless: DuckDB's column0.. names
        ("plain.csv", "a"),
    ],
)
def test_csv_dialect_sniffing_b20(sql_session, duck, sniff_dir, fname, order):
    """read_csv_auto sniffs delimiter and header like DuckDB — the
    comma+header default silently mis-parsed ';'/tab files and ate the
    first row of headerless data before. Column NAMES must match too."""
    sql = f"SELECT * FROM read_csv_auto('{sniff_dir}/{fname}') ORDER BY {order}"
    theirs = duck.execute(sql).fetchall()
    tcols = [c[0] for c in duck.execute(sql).description]
    with serving_dialect(True):
        df = run_sql(sql_session, sql)
        ours = [tuple(r) for r in df.collect()]
    assert df.columns == tcols
    assert sorted(map(str, ours)) == sorted(map(str, theirs))
