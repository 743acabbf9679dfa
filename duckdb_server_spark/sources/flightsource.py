"""Flight-backed Python DataSource — the scan half of catalog ATTACH.

The reference's k8s topology attaches a remote engine as a catalog
(``ATTACH 'dremio' (TYPE AIRPORT, location 'grpc://…')``,
k8s/main.yaml:153-155): tables appear locally without per-table
registration and each query crosses the wire at SCAN time, not attach
time. The driver-side ``attach_flight_table`` helper
(sources/remote.py) materializes eagerly; this DataSource is the lazy,
partition-parallel form:

- planning (driver): one ``GetFlightInfo`` call → schema + endpoints;
- execution (executors): one ``DoGet`` per endpoint ticket, yielding
  Arrow record batches straight into the scan — rows never stage
  through the driver, and a multi-endpoint server parallelizes across
  Spark tasks for free.

Registered as ``spark.read.format("flight_table")`` with options
``location`` (gRPC URI) and ``query`` (remote SQL).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

FORMAT_NAME = "flight_table"


def _flight_info(location: str, sql: str):
    import pyarrow.flight as flight

    client = flight.connect(location)
    try:
        return client.get_flight_info(
            flight.FlightDescriptor.for_command(sql.encode("utf-8"))
        )
    finally:
        client.close()


class FlightTableDataSource(DataSource):
    """Options: ``location`` (grpc://host:port), ``query`` (remote SQL)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema

        info = _flight_info(self.options["location"], self.options["query"])
        return from_arrow_schema(info.schema)

    def reader(self, schema) -> "FlightTableReader":
        return FlightTableReader(self.options)


class FlightTableReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.location = options["location"]
        self.query = options["query"]

    def partitions(self):
        # one Spark task per Flight endpoint; each carries its opaque
        # ticket plus the location to dial (endpoint locations override
        # the attach URI when the server hands out per-shard addresses)
        info = _flight_info(self.location, self.query)
        parts = []
        for ep in info.endpoints:
            loc = self.location
            for cand in ep.locations:
                uri = cand.uri.decode() if isinstance(cand.uri, bytes) else cand.uri
                # a server bound to port 0 advertises its bind URI, not
                # the assigned port — an unusable location means "reuse
                # the connection you have" (Flight convention)
                if uri and not uri.endswith(":0"):
                    loc = uri
                    break
            parts.append(InputPartition((loc, bytes(ep.ticket.ticket))))
        return parts

    def read(self, partition):
        import pyarrow.flight as flight

        loc, ticket = partition.value
        client = flight.connect(loc)
        try:
            for chunk in client.do_get(flight.Ticket(ticket)):
                yield chunk.data  # arrow RecordBatch → vectorized ingest
        finally:
            client.close()


def register(spark) -> None:
    """Idempotent session registration."""
    spark.dataSource.register(FlightTableDataSource)
