"""Engine façade tests — the user-facing lifecycle."""

from __future__ import annotations

from duckdb_server_spark.engine import Engine


def test_engine_lifecycle(spark, sf_dir):
    eng = Engine(
        warehouse_dir=sf_dir,
        init_sql=["CREATE OR REPLACE TEMP VIEW hello_world AS (SELECT 'hello' AS world)"],
        spark=spark,
    )
    # init-SQL view (the k8s init-container example, k8s/main.yaml:133)
    assert eng.sql("SELECT * FROM hello_world").collect()[0].world == "hello"
    # warehouse view + arbitrary SQL passthrough
    assert eng.sql("SELECT count(*) AS n FROM nation").collect()[0].n == 25
    # Arrow result model
    table = eng.sql_arrow("SELECT n_name FROM nation ORDER BY n_name LIMIT 3")
    assert table.num_rows == 3
    # metadata views (duckdb_extensions()/GetSqlInfo analogs)
    caps = {r.extension_name for r in eng.sql("SELECT * FROM capabilities").collect()}
    assert "parquet" in caps
    info = dict(
        (r.info_name, r.value) for r in eng.sql("SELECT * FROM sql_info").collect()
    )
    assert info["server_name"] == "duckdb_server_spark"
    # EXPLAIN surface
    assert "Scan" in eng.explain("SELECT * FROM nation WHERE n_nationkey = 1")


def test_engine_udfs_registered(spark, sf_dir):
    eng = Engine(warehouse_dir=sf_dir, spark=spark)
    row = eng.sql("SELECT round(sigmoid(CAST(0.0 AS DOUBLE)), 3) AS s").collect()[0]
    assert row.s == 0.5


def test_engine_create_table_as(spark, sf_dir):
    eng = Engine(warehouse_dir=sf_dir, spark=spark)
    eng.create_table(
        "top_nations",
        "SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 5",
    )
    assert eng.sql("SELECT count(*) AS n FROM top_nations").collect()[0].n == 5
    assert "top_nations" in eng.list_tables()
    eng.drop_table("top_nations")
    assert "top_nations" not in eng.list_tables()
