"""ADBC FlightSQL client-frame replay (VERDICT r8 item 5).

The off-the-shelf ``adbc_driver_flightsql`` wheels are absent from this
container (2 environmental skips in test_server.py), so the frames an
ADBC client sends are reproduced here from the PUBLIC FlightSql.proto
schema with an INDEPENDENT minimal protobuf writer (varint/tag
assembly in this file — deliberately not flightsql.py's encoders, so
the server's hand-rolled decoders are exercised by bytes they did not
produce). The sequence mirrors the ADBC FlightSQL driver's wire
behavior — connection-setup metadata (GetSqlInfo, GetTables,
GetPrimaryKeys, GetXdbcTypeInfo) followed by
GetFlightInfo(CommandStatementQuery) → DoGet(ticket) — which is also
byte-for-byte the reference's Go client path (client/main.go:13-27).
"""

from __future__ import annotations

import pyarrow.flight as flight
import pytest

from duckdb_server_spark import flightsql
from duckdb_server_spark import server as srv
from duckdb_server_spark.session import bootstrap

# --- independent minimal protobuf writer (public wire format) --------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _str_field(field: int, s: str) -> bytes:
    return _len_field(field, s.encode())


def _varint_field(field: int, n: int) -> bytes:
    return _tag(field, 0) + _varint(n)


_SQL_PKG = "type.googleapis.com/arrow.flight.protocol.sql."


def _any(msg_name: str, value: bytes) -> bytes:
    return _str_field(1, _SQL_PKG + msg_name) + _len_field(2, value)


@pytest.fixture(scope="module")
def flight_port(spark, sf_dir):
    bootstrap(spark, sf_dir)
    server, _thread = srv.serve_in_background(spark)
    yield server.port
    server.shutdown()


def _get(client, descriptor_bytes: bytes):
    info = client.get_flight_info(
        flight.FlightDescriptor.for_command(descriptor_bytes)
    )
    return client.do_get(info.endpoints[0].ticket).read_all()


def test_adbc_connection_setup_and_query_replay(flight_port):
    """The ADBC driver's wire sequence, frame by frame, from
    independently-assembled protobuf bytes."""
    with flight.connect(f"grpc://127.0.0.1:{flight_port}") as client:
        # 1. GetSqlInfo (empty info list = everything) — connection setup
        sql_info = _get(client, _any("CommandGetSqlInfo", b""))
        assert sql_info.column_names[0] == "info_name"
        assert sql_info.num_rows > 0

        # 2. GetSqlInfo with a PACKED repeated filter (flight.sql.server
        #    name = 0, version = 1) — the driver's targeted fetch
        packed = _len_field(1, _varint(0) + _varint(1))
        two = _get(client, _any("CommandGetSqlInfo", packed))
        assert two.num_rows == 2

        # 3. GetTables with a LIKE pattern and include_schema
        cmd = _str_field(3, "nati_n") + _varint_field(5, 1)
        tables = _get(client, _any("CommandGetTables", cmd))
        assert tables.column("table_name").to_pylist() == ["nation"]
        assert "table_schema" in tables.column_names

        # 4. key metadata (primary/imported) — must be EMPTY, not an
        #    Unimplemented error (that aborts the whole ADBC handshake)
        pk = _get(client, _any("CommandGetPrimaryKeys", _str_field(3, "orders")))
        assert pk.num_rows == 0
        assert pk.schema.equals(flightsql.GET_PRIMARY_KEYS_SCHEMA)

        # 5. XdbcTypeInfo narrowed to VARCHAR (java.sql.Types 12) —
        #    plain-varint int32 per the proto schema
        ti = _get(client, _any("CommandGetXdbcTypeInfo", _varint_field(1, 12)))
        assert ti.column("type_name").to_pylist() == ["VARCHAR"]

        # 6. the query itself: GetFlightInfo(CommandStatementQuery) →
        #    DoGet(ticket) — the reference's ADBC smoke statement
        q = _any("CommandStatementQuery", _str_field(1, "SELECT 1 as a, 2 as b"))
        result = _get(client, q)
        assert result.to_pydict() == {"a": [1], "b": [2]}

        # 7. a real table scan through the same frames
        q2 = _any(
            "CommandStatementQuery",
            _str_field(1, "SELECT count(*) AS n FROM nation"),
        )
        n = _get(client, q2).column("n").to_pylist()[0]
        assert n == 25


def test_independent_bytes_match_engine_encoders(flight_port):
    """Cross-check: the independent writer and flightsql.py produce
    byte-identical frames for the same logical command — wire-format
    agreement from two implementations."""
    ours = _any("CommandStatementQuery", _str_field(1, "SELECT 1 AS a"))
    theirs = flightsql.encode_command_statement_query("SELECT 1 AS a")
    assert ours == theirs


def test_unknown_any_type_clean_error(flight_port):
    """A frame with an unknown Any type_url must fail with a clean
    FlightServerError (fail-closed), not a crash."""
    with flight.connect(f"grpc://127.0.0.1:{flight_port}") as client:
        bogus = _any("CommandNoSuchThing", b"")
        with pytest.raises(flight.FlightError):
            client.get_flight_info(flight.FlightDescriptor.for_command(bogus))


# --- independent minimal protobuf reader (for the create result) -----------


def _read_varint(b: bytes, pos: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        v = b[pos]
        out |= (v & 0x7F) << shift
        pos += 1
        if not v & 0x80:
            return out, pos
        shift += 7


def _read_fields(b: bytes) -> dict[int, bytes | int]:
    """Flat field map (last wins) — enough for Any and the prepared
    result, whose fields are all length-delimited or varint."""
    fields: dict[int, bytes | int] = {}
    pos = 0
    while pos < len(b):
        key, pos = _read_varint(b, pos)
        field, wire = key >> 3, key & 0x07
        if wire == 2:
            ln, pos = _read_varint(b, pos)
            fields[field] = b[pos : pos + ln]
            pos += ln
        elif wire == 0:
            fields[field], pos = _read_varint(b, pos)
        else:
            raise AssertionError(f"unexpected wire type {wire}")
    return fields


def test_adbc_prepared_statement_lifecycle_replay(flight_port):
    """The ADBC prepared-statement wire sequence from independent
    frames: CreatePreparedStatement → (decode the result handle with an
    independent reader) → DoPut parameter binding → GetFlightInfo(
    CommandPreparedStatementQuery) → DoGet → rebind and re-execute →
    ClosePreparedStatement → the handle is gone."""
    import pyarrow as pa

    with flight.connect(f"grpc://127.0.0.1:{flight_port}") as client:
        create = _any(
            "ActionCreatePreparedStatementRequest",
            _str_field(1, "SELECT $1 + $2 AS s, $1 AS a"),
        )
        results = list(
            client.do_action(flight.Action("CreatePreparedStatement", create))
        )
        any_fields = _read_fields(results[0].body.to_pybytes())
        assert any_fields[1].decode().endswith(
            "ActionCreatePreparedStatementResult"
        )
        handle = _read_fields(any_fields[2])[1]
        assert isinstance(handle, bytes) and handle

        descriptor_bytes = _any(
            "CommandPreparedStatementQuery", _len_field(1, handle)
        )
        descriptor = flight.FlightDescriptor.for_command(descriptor_bytes)
        for a, b in ((3, 4), (30, 40)):  # rebind re-executes
            batch = pa.record_batch(
                [pa.array([a]), pa.array([b])], names=["p1", "p2"]
            )
            w, _ = client.do_put(descriptor, batch.schema)
            w.write_batch(batch)
            w.close()
            info = client.get_flight_info(descriptor)
            out = client.do_get(info.endpoints[0].ticket).read_all()
            assert out["s"][0].as_py() == a + b
            assert out["a"][0].as_py() == a

        close = _any(
            "ActionClosePreparedStatementRequest", _len_field(1, handle)
        )
        list(client.do_action(flight.Action("ClosePreparedStatement", close)))
        with pytest.raises(flight.FlightError):
            client.get_flight_info(descriptor)
