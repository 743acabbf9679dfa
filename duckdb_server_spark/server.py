"""Arrow Flight serving façade — the engine's protocol surface.

Parity target: the reference is an Arrow Flight SQL server on ``:32010``
(main.go:258,270) with three handlers — ``GetFlightInfo`` for
``CommandStatementQuery`` / ``CommandGetSqlInfo`` (main.go:126-194),
``DoGet`` executing the ticket's SQL and streaming Arrow record batches
(main.go:196-250), and ``DoAction`` left Unimplemented (main.go:121-124).

Spark-first differences (improvements, documented in SURVEY.md §3):
- ``GetFlightInfo`` resolves the result schema via Catalyst **analysis
  only** (``spark.sql(q).schema`` — parse → analyze, no job). The
  reference executes the full query just to read the schema and then
  discards the result (main.go:142-148), doubling every two-step query.
- The ticket protocol is the reference's raw path: ticket bytes ARE the
  SQL string (main.go:199). The protobuf-Any quirk of the reference's
  two-step path (main.go:129-139) is deliberately not replicated.
- Results stream as Arrow record batches exactly like the reference's
  ``DoGet`` loop (main.go:241-243); collection uses Spark's Arrow path
  (``df.toArrow()``), re-chunked to bounded batch sizes.

Read-only serving: the session serves a parquet warehouse registered as
temp views (the ``-db`` file analog, main.go:31,61); no write path is
exposed through the Flight surface.
"""

from __future__ import annotations

import threading
from collections.abc import Iterable

import pyarrow as pa
import pyarrow.flight as flight
from pyspark.sql import SparkSession

# Sentinel mirroring the reference's metadata path (main.go:201).
SQL_INFO_TICKET = b"CommandGetSqlInfo"

# Batch rows per streamed RecordBatch (the reference streams whatever
# batch size DuckDB produces; we bound it explicitly).
BATCH_ROWS = 8192


def _sql_info_table() -> pa.Table:
    """The GetSqlInfo payload (main.go:352-526 analog).

    The reference encodes values as a dense union (main.go:281-350);
    Arrow-python Flight results are plainer as typed string values — the
    (info_name, value) relational shape is preserved. Reported truthfully:
    the reference claims read_only=false even when serving read-only
    (main.go:357 vs main.go:61).
    """
    import pyspark

    names = [
        "server_name",
        "server_version",
        "server_arrow_version",
        "server_read_only",
        "identifier_quote_char",
    ]
    values = [
        "duckdb_server_spark",
        f"spark {pyspark.__version__}",
        f"pyarrow {pa.__version__}",
        "true",
        '"',
    ]
    return pa.table({"info_name": names, "value": values})


class SparkFlightServer(flight.FlightServerBase):
    """Flight server over one shared SparkSession (the reference shares a
    single DuckDB connection across all requests, main.go:70)."""

    def __init__(self, spark: SparkSession, location: str = "grpc://127.0.0.1:0"):
        super().__init__(location)
        self.spark = spark
        self._location = location

    # -- entry point 2: schema probe (main.go:126-194) ----------------------
    def get_flight_info(self, context, descriptor):
        if descriptor.command == SQL_INFO_TICKET:
            schema = _sql_info_table().schema
            ticket = flight.Ticket(SQL_INFO_TICKET)
        else:
            query = descriptor.command.decode("utf-8")
            from pyspark.sql.pandas.types import to_arrow_schema

            # Catalyst analysis only — no job runs (vs the reference's
            # full double execution, main.go:144-148).
            schema = to_arrow_schema(self.spark.sql(query).schema)
            ticket = flight.Ticket(descriptor.command)
        endpoint = flight.FlightEndpoint(ticket, [self._location])
        # Unknown cardinality, like the reference (main.go:164-165).
        return flight.FlightInfo(schema, descriptor, [endpoint], 0, -1)

    # -- entry point 1: execute + stream (main.go:196-250) ------------------
    def do_get(self, context, ticket):
        if ticket.ticket == SQL_INFO_TICKET:
            return flight.RecordBatchStream(_sql_info_table())
        query = ticket.ticket.decode("utf-8")
        try:
            df = self.spark.sql(query)
            table = df.toArrow()
        except Exception as exc:  # engine error → Flight error (main.go:230-232)
            raise flight.FlightServerError(str(exc)) from exc
        batches = table.to_batches(max_chunksize=BATCH_ROWS)
        if not batches:
            batches = [pa.RecordBatch.from_pylist([], schema=table.schema)]
        return flight.GeneratorStream(table.schema, iter(batches))

    # -- DoAction: Unimplemented, like the reference (main.go:121-124) ------
    def do_action(self, context, action):
        raise NotImplementedError(f"action {action.type!r} not implemented")

    def list_actions(self, context):
        return []


def serve_in_background(
    spark: SparkSession, port: int = 0
) -> tuple[SparkFlightServer, threading.Thread]:
    """Start the server on a daemon thread; returns (server, thread).
    ``server.port`` holds the bound port (0 → ephemeral)."""
    server = SparkFlightServer(spark, f"grpc://127.0.0.1:{port}")
    thread = threading.Thread(target=server.serve, daemon=True)
    thread.start()
    return server, thread


# ---------------------------------------------------------------------------
# Smoke clients (parity with client/main.py / client/main.go)
# ---------------------------------------------------------------------------


def query_raw(port: int, sql: str) -> pa.Table:
    """Raw-ticket path (client/main.py:9-11): ticket bytes are the SQL."""
    client = flight.connect(f"grpc://127.0.0.1:{port}")
    try:
        return client.do_get(flight.Ticket(sql.encode("utf-8"))).read_all()
    finally:
        client.close()


def query_two_step(port: int, sql: str) -> pa.Table:
    """GetFlightInfo → DoGet path (client/main.py:21-24 ADBC analog)."""
    client = flight.connect(f"grpc://127.0.0.1:{port}")
    try:
        descriptor = flight.FlightDescriptor.for_command(sql.encode("utf-8"))
        info = client.get_flight_info(descriptor)
        tables: list[pa.Table] = []
        for endpoint in info.endpoints:
            tables.append(client.do_get(endpoint.ticket).read_all())
        return pa.concat_tables(tables)
    finally:
        client.close()


def get_sql_info(port: int) -> pa.Table:
    """Metadata path (main.go:170-191 analog)."""
    client = flight.connect(f"grpc://127.0.0.1:{port}")
    try:
        descriptor = flight.FlightDescriptor.for_command(SQL_INFO_TICKET)
        info = client.get_flight_info(descriptor)
        return client.do_get(info.endpoints[0].ticket).read_all()
    finally:
        client.close()


# ---------------------------------------------------------------------------
# CLI entrypoint — the reference's flag surface (main.go:31-42)
# ---------------------------------------------------------------------------


def main(argv: list[str] | None = None) -> None:
    """``python -m duckdb_server_spark.server`` — serve a parquet warehouse
    over Arrow Flight, mirroring the reference's CLI (main.go:31-42):

    - ``--warehouse DIR`` ↔ ``-db``: directory of ``<table>.parquet``
      registered as views at startup (serve-time is read-only by
      construction — the session only ever reads them, main.go:61).
    - ``--init SQL``      ↔ ``-init``: ';'-separated statements run once
      after the views register (main.go:107-111).
    - ``--port N``        ↔ the fixed ``:32010`` (main.go:258).
    """
    import argparse

    from duckdb_server_spark.session import DEFAULT_SF_DIR, bootstrap, get_spark

    parser = argparse.ArgumentParser(description="PySpark Arrow Flight SQL server")
    parser.add_argument("--warehouse", default=DEFAULT_SF_DIR)
    parser.add_argument("--init", default="", help="';'-separated init SQL")
    parser.add_argument("--port", type=int, default=32010)
    args = parser.parse_args(argv)

    spark = get_spark(app_name="dss-server")
    statements = [s.strip() for s in args.init.split(";") if s.strip()]
    bootstrap(spark, args.warehouse, init_sql=statements)
    server = SparkFlightServer(spark, f"grpc://0.0.0.0:{args.port}")
    print(f"serving warehouse={args.warehouse} port={server.port}", flush=True)
    server.serve()


if __name__ == "__main__":
    main()
