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


def test_engine_attach_cross_database_join(spark, sf_dir):
    """DuckDB ATTACH parity: a second warehouse mounts as a catalog
    database with two-part names; cross-database joins are ordinary
    joins over external parquet tables."""
    eng = Engine(warehouse_dir=sf_dir, spark=spark)
    tables = eng.attach("/root/testdata/sf0.001", "tiny")
    try:
        assert "nation" in tables and "region" in tables
        n = eng.sql("SELECT count(*) AS n FROM tiny.nation").collect()[0].n
        assert n == 25
        # cross-db join: current warehouse's nation × attached region
        joined = eng.sql(
            """
            SELECT count(*) AS n
            FROM nation JOIN tiny.region ON n_regionkey = r_regionkey
            """
        ).collect()[0].n
        assert joined == 25
        # external table scans stay pushdown-capable
        assert "PushedFilters" in eng.explain(
            "SELECT * FROM tiny.nation WHERE n_nationkey = 3"
        )
    finally:
        eng.detach("tiny")
    assert not spark.catalog.databaseExists("tiny")


def test_engine_attach_rejects_bad_alias(spark, sf_dir):
    import pytest as _pytest

    eng = Engine(warehouse_dir=sf_dir, spark=spark)
    with _pytest.raises(ValueError):
        eng.attach("/root/testdata/sf0.001", "bad-alias; DROP")


def test_engine_export_import_roundtrip(spark, sf_dir, tmp_path):
    """EXPORT DATABASE → fresh import → identical table list and row
    counts; the manifest is plain re-runnable SQL."""
    eng = Engine(warehouse_dir=sf_dir, spark=spark)
    target = str(tmp_path / "exported")
    exported = eng.export_database(target)
    assert "nation" in exported and "lineitem" in exported
    before = {
        name: eng.table(name).count() for name in ("nation", "region", "orders")
    }
    # wipe the views, then restore purely from the export manifest
    for name in before:
        eng.drop_table(name)
    restored = eng.import_database(target)
    assert set(before) <= set(restored)
    for name, n in before.items():
        assert eng.table(name).count() == n


def test_engine_compact_table(spark, sf_dir):
    """Small-file compaction: same rows, far fewer files."""
    import glob
    import os

    eng = Engine(warehouse_dir=sf_dir, spark=spark)
    frag = eng.sql("SELECT * FROM orders").repartition(32)
    eng.create_table("orders_frag", frag)
    path = os.path.join(eng.warehouse_dir_writable(), "orders_frag")
    files_before = len(glob.glob(os.path.join(path, "*.parquet")))
    assert files_before >= 32
    n_before = eng.table("orders_frag").count()
    eng.compact_table("orders_frag", target_files=4)
    files_after = len(glob.glob(os.path.join(path, "*.parquet")))
    assert files_after <= 4
    assert eng.table("orders_frag").count() == n_before


def test_engine_summarize(spark, sf_dir):
    """SUMMARIZE analog: one row per column, sane stats, single pass."""
    eng = Engine(warehouse_dir=sf_dir, spark=spark)
    s = {r.column_name: r for r in eng.summarize("nation").collect()}
    assert set(s) == {"n_nationkey", "n_name", "n_regionkey"}
    assert s["n_nationkey"].column_type == "INTEGER"  # DuckDB spelling
    assert s["n_nationkey"].min == "0" and s["n_nationkey"].max == "24"
    assert s["n_name"].avg is None  # non-numeric: no mean/std/quartiles
    assert s["n_name"].q50 is None
    assert float(s["n_nationkey"].null_percentage) == 0.0
    assert 20 <= s["n_nationkey"].approx_unique <= 30
    assert s["n_nationkey"]["count"] == 25  # .count is Row's method
    assert s["n_nationkey"].q50 == "12"  # integer quartiles print as ints


def test_engine_summarize_empty_and_map(spark, sf_dir):
    """SUMMARIZE edge cases mirroring DuckDB: an empty table yields NULL
    null_percentage (no ANSI divide-by-zero), and non-orderable map
    columns skip min/max instead of failing analysis."""
    eng = Engine(warehouse_dir=sf_dir, spark=spark)
    eng.sql(
        "SELECT map('k', n_name) AS m, n_nationkey FROM nation WHERE 1 = 0"
    ).createOrReplaceTempView("empty_with_map")
    s = {r.column_name: r for r in eng.summarize("empty_with_map").collect()}
    assert set(s) == {"m", "n_nationkey"}
    assert s["m"].min is None and s["m"].max is None
    assert s["m"].null_percentage is None
    assert s["n_nationkey"].null_percentage is None


def test_engine_compact_table_stale_old_dir(spark, sf_dir):
    """A stale `<path>.old` left by a prior crashed compaction must not
    break the next run (bare os.rename onto a non-empty dir raises)."""
    import os

    eng = Engine(warehouse_dir=sf_dir, spark=spark)
    eng.create_table("nation_c", eng.sql("SELECT * FROM nation").repartition(8))
    path = os.path.join(eng.warehouse_dir_writable(), "nation_c")
    os.makedirs(os.path.join(path + ".old", "leftover"), exist_ok=True)
    eng.compact_table("nation_c", target_files=2)
    assert eng.table("nation_c").count() == 25
    assert not os.path.exists(path + ".old")


def test_engine_optimize_zorder(spark, sf_dir):
    """OPTIMIZE ZORDER analog: same rows, and every rewritten file covers
    only a fraction of the RAW (user_id, event_id) domain — the property
    parquet min/max footer pruning needs for ``col = X`` predicates.
    A mod-256 interleave (no domain quantization) fails this: each file
    would span nearly the full raw domain on both columns."""
    import glob
    import os

    from pyspark.sql import functions as F

    eng = Engine(warehouse_dir=sf_dir, spark=spark)
    eng.create_table("events_z", eng.sql("SELECT * FROM events").repartition(8))
    n_before = eng.table("events_z").count()
    dom = eng.table("events_z").agg(
        F.min("user_id").alias("x_lo"), F.max("user_id").alias("x_hi"),
        F.min("event_id").alias("y_lo"), F.max("event_id").alias("y_hi"),
    ).collect()[0]
    x_span = dom.x_hi - dom.x_lo + 1
    y_span = dom.y_hi - dom.y_lo + 1
    eng.optimize_zorder("events_z", "user_id", "event_id", target_files=4)
    assert eng.table("events_z").count() == n_before
    path = os.path.join(eng.warehouse_dir_writable(), "events_z")
    files = glob.glob(os.path.join(path, "*.parquet"))
    assert 1 <= len(files) <= 4
    for f in files:
        row = spark.read.parquet(f).agg(
            F.min("user_id").alias("x0"), F.max("user_id").alias("x1"),
            F.min("event_id").alias("y0"), F.max("event_id").alias("y1"),
        ).collect()[0]
        # A z-range can straddle one quadrant boundary: ≤ full span on one
        # axis × half on the other ⇒ raw-area fraction ≤ ~0.5 per file.
        area_frac = ((row.x1 - row.x0 + 1) / x_span) * ((row.y1 - row.y0 + 1) / y_span)
        assert area_frac <= 0.6, (f, area_frac)
    eng.drop_table("events_z")
