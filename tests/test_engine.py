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


def test_tws_streaming_path_when_deps_present(spark, sf_dir):
    """transformWithStateInPandas needs protobuf (its state-server
    protocol); this container lacks it, so the catalog query runs the
    shared-logic batch fallback (oracle-checked in test_oracle). Where
    protobuf exists this test drives the REAL streaming path and checks
    it against the batch result."""
    import pytest

    from duckdb_server_spark.streaming.tws import HAVE_TWS_DEPS, user_rollup

    if not HAVE_TWS_DEPS:
        pytest.skip("protobuf absent — batch fallback covered by oracle test")

    got = sorted(tuple(r) for r in user_rollup(spark, sf_dir).collect())
    from duckdb_server_spark.session import load_table
    from pyspark.sql import functions as F

    want = sorted(
        tuple(r)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("value").alias("max_value"))
        .collect()
    )
    assert got == want
