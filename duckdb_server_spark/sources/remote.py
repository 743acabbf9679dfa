"""Remote sources: object-store config (S8), HTTP fetch (S9), and
cross-engine federation (S10).

Reference anchors:
- S8: ``INSTALL httpfs`` + ``CREATE SECRET (TYPE s3, KEY_ID …, ENDPOINT …,
  URL_STYLE path)`` (k8s/main.yaml:110-125) → Spark's s3a Hadoop configs.
- S9: ``INSTALL http_client FROM community`` (k8s/main.yaml:111) →
  driver-side stdlib fetch materialized into a DataFrame (small payloads
  only — a control-plane convenience, not a data-plane scan).
- S10: ``ATTACH 'x' (TYPE AIRPORT, location 'grpc://…')`` exposing a
  remote engine's tables locally (k8s/main.yaml:153-155) → an Arrow
  Flight hop: fetch the remote query result as Arrow record batches and
  register it as a temp view. Works against any Flight server, including
  this engine's own façade (server.py) — tested that way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def configure_s3(
    spark: SparkSession,
    access_key: str | None = None,
    secret_key: str | None = None,
    endpoint: str | None = None,
    path_style: bool = True,
) -> None:
    """The httpfs/S3-secret analog (S8, k8s/main.yaml:115-125): after
    this, ``spark.read.parquet("s3a://bucket/…")`` works (given the
    hadoop-aws jars on the cluster classpath)."""
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    if access_key:
        conf.set("fs.s3a.access.key", access_key)
    if secret_key:
        conf.set("fs.s3a.secret.key", secret_key)
    if endpoint:
        conf.set("fs.s3a.endpoint", endpoint)
    conf.set("fs.s3a.path.style.access", "true" if path_style else "false")


def http_table(
    spark: SparkSession, url: str, format: str = "json", view_name: str | None = None
) -> DataFrame:
    """S9: fetch a small remote payload (http/https/file URL) on the
    driver and materialize it as a DataFrame. JSON payloads are staged to
    a driver-local temp file and parsed with ``spark.read.json`` — a pure
    JVM scan (parallelizing the raw lines as a Python RDD launches python
    workers on every default-parallelism slice twice, infer + read:
    measured ~7 s vs ~1 s for the file path on a 50-row payload). CSV via
    header-splitting. Driver-side by design — for bulk data use s3a (S8)."""
    import hashlib
    import os
    import tempfile
    import urllib.request

    with urllib.request.urlopen(url) as resp:  # noqa: S310 — caller-supplied URL
        body = resp.read().decode("utf-8")
    lines = [ln for ln in body.splitlines() if ln.strip()]
    if format == "json":
        staged = os.path.join(
            tempfile.gettempdir(),
            f"dss_http_body_{hashlib.md5(body.encode()).hexdigest()[:12]}.json",
        )
        if not os.path.exists(staged):
            with open(staged + ".tmp", "w", encoding="utf-8") as fh:
                fh.write("\n".join(lines))
            os.replace(staged + ".tmp", staged)
        df = spark.read.json(staged)
    elif format == "csv":
        header = lines[0].split(",")
        rows = [ln.split(",") for ln in lines[1:]]
        df = spark.createDataFrame(rows, header)
    else:
        raise ValueError(f"unsupported http_table format: {format}")
    if view_name:
        df.createOrReplaceTempView(view_name)
    return df


def attach_flight_table(
    spark: SparkSession, location: str, sql: str, view_name: str
) -> DataFrame:
    """S10: the ``ATTACH (TYPE AIRPORT, location 'grpc://…')`` analog —
    run ``sql`` on the remote Flight server, pull the Arrow result, and
    register it locally as ``view_name``.

    The remote result materializes on the driver (like DuckDB's airport
    ATTACH, each query crosses one gRPC hop, k8s/main.yaml:153-155); for
    partition-parallel remote scans use JDBC/DSv2 instead."""
    import pyarrow.flight as flight

    client = flight.connect(location)
    try:
        table = client.do_get(flight.Ticket(sql.encode("utf-8"))).read_all()
    finally:
        client.close()
    df = spark.createDataFrame(table.to_pandas())
    df.createOrReplaceTempView(view_name)
    return df


def attach_flight_catalog(
    spark: SparkSession,
    location: str,
    prefix: str = "remote_",
    pattern: str | None = None,
) -> list[str]:
    """S10 catalog form: ``ATTACH (TYPE AIRPORT)`` discovers the remote
    CATALOG — tables appear locally without per-table registration.

    Discovery is one Flight SQL ``CommandGetTables`` round-trip; each
    discovered table then registers as ``{prefix}{name}``, a lazy view
    over the ``flight_table`` DataSource (sources/flightsource.py), so
    data crosses the wire at SCAN time, per-endpoint-parallel — the
    shape that survives attaching a big remote warehouse. Returns the
    discovered table names."""
    import pyarrow.flight as flight

    from duckdb_server_spark import flightsql
    from duckdb_server_spark.sources.flightsource import (
        FORMAT_NAME,
        register,
    )

    client = flight.connect(location)
    try:
        descriptor = flight.FlightDescriptor.for_command(
            flightsql.encode_command_get_tables(pattern, False)
        )
        info = client.get_flight_info(descriptor)
        listing = client.do_get(info.endpoints[0].ticket).read_all()
    finally:
        client.close()
    names = listing.column("table_name").to_pylist()
    register(spark)
    for name in names:
        df = (
            spark.read.format(FORMAT_NAME)
            .option("location", location)
            .option("query", f"SELECT * FROM {name}")
            .load()
        )
        df.createOrReplaceTempView(prefix + name)
    return names


def attach_jdbc_table(
    spark: SparkSession,
    url: str,
    remote_table: str,
    view_name: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    **options: str,
) -> DataFrame:
    """S10 (scale path): register a remote JDBC table as a local view.
    With a ``partition_column`` the scan parallelizes across executors —
    the federation mode that survives big remote tables."""
    reader = spark.read.format("jdbc").option("url", url).option(
        "dbtable", remote_table
    )
    if partition_column:
        bounds = (
            spark.read.format("jdbc")
            .option("url", url)
            .option(
                "dbtable",
                f"(SELECT min({partition_column}) lo, max({partition_column}) hi "
                f"FROM {remote_table}) b",
            )
            .options(**options)
            .load()
            .collect()[0]
        )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(bounds["lo"]))
            .option("upperBound", str(bounds["hi"]))
            .option("numPartitions", str(num_partitions))
        )
    df = reader.options(**options).load()
    df.createOrReplaceTempView(view_name)
    return df
