"""Declared queries for remote sources: HTTP fetch (S9) and cross-engine
federation over Arrow Flight (S10). The S3 path (S8) is config-only —
see sources/remote.py:configure_s3 and tests/test_remote.py.
"""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_server_spark.catalog import query
from duckdb_server_spark.session import load_table as t
from duckdb_server_spark.sources.remote import (
    attach_flight_catalog,
    attach_flight_table,
    http_table,
)


@query(
    "s09_http_scan",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents WHERE doc_id < 50
    """,
)
def s09_http_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 (http_client analog, k8s/main.yaml:111): fetch a JSON payload
    by URL and materialize it. Staged to a file:// URL so the test is
    hermetic; the fetch path is identical for http(s)://. The staging key
    is an md5 digest, not ``hash()`` (salted per process → every fresh
    process would re-stage and leak a directory)."""
    import hashlib

    staged = os.path.join(
        tempfile.gettempdir(),
        f"dss_http_{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}",
    )
    marker = os.path.join(staged, "_SUCCESS")
    if not os.path.exists(marker):
        docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
        docs.select("doc_id", "lang", "n_chars").coalesce(1).write.mode(
            "overwrite"
        ).json(staged)
    (part,) = glob.glob(os.path.join(staged, "part-*.json"))
    df = http_table(spark, f"file://{part}", format="json")
    return df.select("doc_id", "lang", "n_chars")


@query(
    "s10_federated_flight",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def s10_federated_flight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 (ATTACH TYPE AIRPORT analog, k8s/main.yaml:153-155): pull a
    remote engine's table through a real gRPC Arrow Flight hop and
    register it locally. The "remote" is this engine's own Flight façade
    serving the same warehouse — one process, two engine instances, a
    genuine network hop, exactly the reference's sidecar topology."""
    from duckdb_server_spark.server import serve_in_background
    from duckdb_server_spark.session import register_views

    register_views(spark, sf_dir, tables=("nation",))
    server, _ = serve_in_background(spark)
    try:
        return attach_flight_table(
            spark,
            f"grpc://127.0.0.1:{server.port}",
            "SELECT n_nationkey, n_name, n_regionkey FROM nation",
            "federated_nation",
        )
    finally:
        server.shutdown()


# One hermetic S3 store per (process, sf_dir): serves the sf_dir's
# parquet files as a bucket with fixed demo credentials, SigV4-verified
# on every request. The bucket name embeds the sf_dir digest so the
# engine's URI-keyed read-view cache can never alias across scales.
_S3_STORES: dict[str, tuple[object, str]] = {}
_S3_KEY_ID = "DSSDEMOACCESSKEY"
_S3_SECRET = "dss-demo-secret-key"


def _shared_s3_store(sf_dir: str):
    """Returns (server, bucket)."""
    entry = _S3_STORES.get(sf_dir)
    if entry is None:
        import atexit
        import hashlib

        from duckdb_server_spark.sources.s3 import MiniS3Server

        bucket = "wh" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        server = MiniS3Server(
            sf_dir,
            bucket=bucket,
            access_key=_S3_KEY_ID,
            secret_key=_S3_SECRET,
        )
        atexit.register(server.shutdown)
        entry = _S3_STORES[sf_dir] = (server, bucket)
    return entry


@query(
    "s08_s3_scan",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents
    WHERE doc_id < 100
    ORDER BY doc_id ASC NULLS LAST
    """,
)
def s08_s3_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 (httpfs + S3 secret, k8s/main.yaml:110-125): the reference
    INSTALLs httpfs and CREATE SECRETs S3 credentials, then queries
    ``read_parquet('s3://…')``. This runs that exact statement pair
    end-to-end against a hermetic in-process S3 store: the secret routes
    through the engine's statement router into the secret store (and the
    fs.s3a.* conf, the real-cluster path), and the scan's s3:// URI
    resolves via a REAL AWS-SigV4-signed GetObject — the store verifies
    the signature server-side, so wrong credentials 403. Spooled to an
    ETag-keyed local cache on this jar-less single node; with hadoop-aws
    jars the same secret's s3a conf scans object storage directly and
    partition-parallel, which is the 100 TB path."""
    from duckdb_server_spark.dialect import execute_statement, run_sql

    server, bucket = _shared_s3_store(sf_dir)
    execute_statement(spark, "INSTALL httpfs")
    execute_statement(spark, "LOAD httpfs")
    execute_statement(
        spark,
        f"""CREATE OR REPLACE SECRET s8demo (
            TYPE s3,
            KEY_ID '{_S3_KEY_ID}',
            SECRET '{_S3_SECRET}',
            ENDPOINT '127.0.0.1:{server.port}',
            USE_SSL 'false',
            URL_STYLE 'path'
        )""",
    )
    return run_sql(
        spark,
        f"SELECT doc_id, lang, n_chars "
        f"FROM read_parquet('s3://{bucket}/documents.parquet') "
        f"WHERE doc_id < 100 ORDER BY doc_id ASC NULLS LAST",
    )


# The catalog-attach scan is LAZY (data crosses the hop at action time,
# which is the point), so the façade must outlive the builder: one
# shared background server per (process, session), shut down at exit —
# repeated driver runs reuse it instead of leaking a port each call.
_CATALOG_SERVERS: dict[int, object] = {}


def _shared_flight_server(spark: SparkSession):
    key = id(spark)
    server = _CATALOG_SERVERS.get(key)
    if server is None:
        import atexit

        from duckdb_server_spark.server import serve_in_background

        server, _ = serve_in_background(spark)
        atexit.register(server.shutdown)
        _CATALOG_SERVERS[key] = server
    return server


@query(
    "s10b_attach_remote_catalog",
    oracle="""
    SELECT r_name, count(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name ASC NULLS LAST
    """,
)
def s10b_attach_remote_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 catalog form (the k8s Airport ATTACH shape, k8s/main.yaml:
    153-155): attach a remote engine and discover its CATALOG — tables
    appear locally without per-table registration. Discovery is one
    Flight SQL ``CommandGetTables`` round-trip (pattern ``%ion`` finds
    ``nation`` and ``region`` in one shot); each discovered table
    registers as a LAZY view over the ``flight_table`` Python DataSource,
    so the fact-side join below pulls the remote dims across a real gRPC
    hop at SCAN time, per-endpoint-parallel — then joins them against
    the LOCAL customer table, the cross-engine topology the reference's
    Dremio sidecar serves. Remote dims are broadcast-sized; Catalyst
    broadcasts them against the local fact scan."""
    from duckdb_server_spark.session import register_views

    register_views(spark, sf_dir, tables=("nation", "region"))
    customer = t(spark, sf_dir, "customer")
    server = _shared_flight_server(spark)
    names = attach_flight_catalog(
        spark,
        f"grpc://127.0.0.1:{server.port}",
        prefix="rc_",
        pattern="%ion",
    )
    if not {"nation", "region"} <= set(names):
        raise ValueError(f"catalog discovery incomplete: {names}")
    nation = spark.table("rc_nation")
    region = spark.table("rc_region")
    return (
        customer.join(
            F.broadcast(nation),
            customer.c_nationkey == nation.n_nationkey,
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.col("r_name").asc_nulls_last())
    )


@query(
    "s09b_python_datasource",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents WHERE doc_id < 50
    """,
)
def s09b_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9/S14 via PySpark 4's Python DataSource API: a registered reader
    class with source-side partition planning (sources/pydatasource.py)
    — the scalable form of the extension mechanism; reads parallelize
    across executors instead of staging through the driver. Hermetic: a
    deterministic JSONL payload staged once per sf_dir (stable md5 name,
    so fresh processes reuse it — ``hash()`` is salted per process and
    was re-staging and leaking a file per run)."""
    import hashlib
    import json as _json

    from duckdb_server_spark.sources.pydatasource import FORMAT_NAME, register

    staged = os.path.join(
        tempfile.gettempdir(),
        f"dss_pyds_{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}.jsonl",
    )
    if not os.path.exists(staged):
        rows = (
            t(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 50)
            .select("doc_id", "lang", "n_chars")
            .orderBy("doc_id")
            .collect()
        )
        with open(staged + ".tmp", "w", encoding="utf-8") as fh:
            for r in rows:
                fh.write(_json.dumps(r.asDict()) + "\n")
        os.replace(staged + ".tmp", staged)
    register(spark)
    # 2 planned partitions still exercises source-side splitting; each
    # partition costs a python-worker launch, so more is pure overhead
    # on a 50-row payload (measured 4.5s at 4 vs 1.6s at 2).
    return (
        spark.read.format(FORMAT_NAME)
        .option("path", staged)
        .option("partitions", "2")
        .load()
        .orderBy(F.col("doc_id").asc_nulls_last())
    )


@query(
    "s24_attach_duckdb_file",
    oracle="""
    SELECT r.r_name, count(*) AS n_nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name ASC NULLS LAST
    """,
)
def s24_attach_duckdb_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ATTACH of a REAL .duckdb database file — the literal artifact the
    reference's ``-db`` flag mounts (main.go:54-61). A legacy DuckDB
    database is staged once per sf_dir (built BY duckdb, so the attach
    path reads a genuine DuckDB storage file, not a fixture we control),
    then ``ATTACH '…' AS legacy (READ_ONLY)`` routes through the
    statement router: every table exports ONCE through DuckDB's own
    parquet writer into an mtime-keyed spool (bytes go file→file — no
    driver materialization) and registers as external parquet under a
    catalog database, so Spark scans with full pushdown/pruning and
    two-part names. The query joins an attached table against the live
    warehouse — the migration shape: a user points this engine at their
    existing DuckDB file and keeps querying."""
    import hashlib

    from duckdb_server_spark.dialect import execute_statement, run_sql
    from duckdb_server_spark.session import register_views

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    dbfile = os.path.join(tempfile.gettempdir(), f"dss_legacy_{key}.duckdb")
    if not os.path.exists(dbfile):
        import duckdb as _duckdb

        tmp = dbfile + ".tmp"
        if os.path.exists(tmp):
            os.remove(tmp)
        con = _duckdb.connect(tmp)
        try:
            con.execute(
                "CREATE TABLE nation AS SELECT * FROM read_parquet("
                f"'{os.path.join(sf_dir, 'nation.parquet')}')"
            )
        finally:
            con.close()
        os.replace(tmp, dbfile)
    register_views(spark, sf_dir, tables=("region",))
    alias = f"legacy_{key}"
    execute_statement(spark, f"ATTACH '{dbfile}' AS {alias} (READ_ONLY)")
    return run_sql(
        spark,
        f"SELECT r.r_name, count(*) AS n_nations "
        f"FROM {alias}.nation n JOIN region r "
        f"ON n.n_regionkey = r.r_regionkey "
        f"GROUP BY r.r_name ORDER BY r.r_name ASC NULLS LAST",
    )
