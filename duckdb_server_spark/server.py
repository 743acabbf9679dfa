"""Arrow Flight serving façade — the engine's protocol surface.

Parity target: the reference is an Arrow Flight SQL server on ``:32010``
(main.go:258,270) with three handlers — ``GetFlightInfo`` for
``CommandStatementQuery`` / ``CommandGetSqlInfo`` (main.go:126-194),
``DoGet`` executing the ticket's SQL and streaming Arrow record batches
(main.go:196-250), and ``DoAction`` left Unimplemented (main.go:121-124).

Protocol surface (all three dialects served):
- **Flight SQL protobuf** (what off-the-shelf ADBC / flightsql clients
  speak, reference client/main.go:13-17): ``GetFlightInfo`` unmarshals a
  protobuf ``Any`` wrapping ``CommandStatementQuery`` (main.go:129-139) and
  answers ``CommandGetSqlInfo`` with the standard ``SqlInfo`` dense-union
  schema (main.go:173-175, 202-223). Tickets are
  ``Any(TicketStatementQuery)``. Wire codecs: ``flightsql.py``.
- **Raw tickets** (reference client/main.py:9-11): ticket bytes ARE the SQL.
- **Legacy sentinel** ``CommandGetSqlInfo`` (plain bytes): the relational
  (info_name, value) metadata table, kept for round-1 clients.

Spark-first differences (improvements, documented in SURVEY.md §3):
- ``GetFlightInfo`` resolves the result schema via Catalyst **analysis
  only** (``spark.sql(q).schema`` — parse → analyze, no job). The
  reference executes the full query just to read the schema and then
  discards the result (main.go:142-148), doubling every two-step query.
- Results stream **incrementally**: each executor serializes its Arrow
  batches to IPC and the driver forwards them one at a time
  (``toLocalIterator`` — bounded driver memory), matching the reference's
  pipelined DoGet loop (main.go:241-243). No full-result materialization.

Read-only serving, enforced: every statement is gated at **parse time**
(before ``spark.sql`` can eagerly execute a command) — only query-shaped
plans and read-only metadata commands (EXPLAIN/SHOW/DESCRIBE) run; DDL,
DML, SET and other side-effecting statements are rejected with a Flight
error. This is the engine-level analog of the reference's
``access_mode=read_only`` connection (main.go:61). Authentication is out
of scope, as in the reference (no auth handlers in main.go).
"""

from __future__ import annotations

import re
import threading
from collections.abc import Iterator

import pyarrow as pa
import pyarrow.flight as flight
from pyspark.sql import DataFrame, SparkSession

from duckdb_server_spark import flightsql

# Legacy sentinel mirroring the reference's metadata path (main.go:201).
SQL_INFO_TICKET = b"CommandGetSqlInfo"

# Rows per streamed RecordBatch (the reference streams whatever batch size
# DuckDB produces; we re-chunk to a bounded size).
BATCH_ROWS = 8192

# Read-only command prefixes allowed through the statement gate.
_READONLY_COMMAND_PREFIXES = ("Explain", "Show", "Describe")


def _legacy_sql_info_table() -> pa.Table:
    """Round-1 relational (info_name, value) metadata table — kept for
    legacy clients; standard Flight SQL clients get the dense-union form
    (flightsql.sql_info_table)."""
    info = flightsql.server_sql_info()
    names = {
        flightsql.FLIGHT_SQL_SERVER_NAME: "server_name",
        flightsql.FLIGHT_SQL_SERVER_VERSION: "server_version",
        flightsql.FLIGHT_SQL_SERVER_ARROW_VERSION: "server_arrow_version",
        flightsql.FLIGHT_SQL_SERVER_READ_ONLY: "server_read_only",
        flightsql.SQL_IDENTIFIER_QUOTE_CHAR: "identifier_quote_char",
    }
    return pa.table(
        {
            "info_name": [names[c] for c in sorted(names)],
            "value": [str(info[c]).lower() if isinstance(info[c], bool) else str(info[c])
                      for c in sorted(names)],
        }
    )


def assert_query_shaped(spark: SparkSession, sql: str) -> None:
    """Reject non-query statements at parse time (read-only gate).

    ``spark.sql`` executes commands (DDL/DML/SET) **eagerly** at DataFrame
    creation, so the gate must run on the *parsed* plan before any
    ``spark.sql`` call. Deny when the parsed plan is a Catalyst ``Command``
    (SET/CREATE/DROP/CACHE/ADD JAR/...) other than read-only metadata
    commands, or an INSERT statement (``InsertIntoStatement`` /
    ``InsertIntoDir`` are not ``Command`` subclasses at parse time).
    """
    jspark = spark._jsparkSession
    try:
        parsed = jspark.sessionState().sqlParser().parsePlan(sql)
    except Exception as exc:
        raise flight.FlightServerError(f"parse error: {exc}") from exc
    name = parsed.getClass().getSimpleName()
    if name.startswith("InsertInto"):
        raise flight.FlightServerError(
            f"read-only server: statement {name!r} is not allowed"
        )
    command_cls = getattr(spark, "_dss_command_cls", None)
    if command_cls is None:
        command_cls = spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.catalyst.plans.logical.Command"
        )
        spark._dss_command_cls = command_cls
    if command_cls.isInstance(parsed) and not name.startswith(
        _READONLY_COMMAND_PREFIXES
    ):
        raise flight.FlightServerError(
            f"read-only server: statement {name!r} is not allowed"
        )


def resolve_query_frame(spark: SparkSession, sql: str) -> DataFrame:
    """Serving-path execution with the FULL dialect surface — everything
    ``Engine.sql`` accepts works over the wire too: routed statement
    forms (DESCRIBE / SUMMARIZE / dynamic PIVOT / UNPIVOT / EXECUTE),
    ``read_parquet``/bare-path file reads, macros, UNION BY NAME, and
    recursive CTEs. The read-only gate still runs FIRST on everything
    that is not a known read-only statement form: natively-parseable
    input gates as-is (UNION BY NAME gates as UNION ALL — identical
    statement shape), DuckDB-dialect input gates through its rewrite.

    Resolution runs under the DuckDB-first serving default
    (dialect.serving_dialect): the reference's wire contract is verbatim
    DuckDB SQL (main.go:199,229), so both-dialect-valid statements get
    DuckDB answers here while embedded ``Engine.sql`` stays native-first.
    An explicit ``SET dialect`` in the init script overrides either way."""
    from duckdb_server_spark import dialect

    with dialect.serving_dialect():
        return _resolve_query_frame_inner(spark, sql)


def _resolve_query_frame_inner(spark: SparkSession, sql: str) -> DataFrame:
    from duckdb_server_spark import dialect

    def gate_text(text: str) -> None:
        """Read-only-gate a SQL fragment: natively-parseable input gates
        as-is, DuckDB-dialect input gates through its rewrite."""
        g = dialect.neutralize_parameters(text)
        g = dialect._UNION_BY_NAME_RE.sub("UNION ALL", g)
        try:
            assert_query_shaped(spark, g)
        except flight.FlightServerError:
            try:
                rewritten = dialect.rewrite(g, spark)
            except ValueError as exc:
                raise flight.FlightServerError(str(exc)) from exc
            assert_query_shaped(spark, rewritten)

    def run() -> DataFrame:
        try:
            return dialect.run_sql(spark, sql)
        except flight.FlightServerError:
            raise
        except Exception as exc:
            raise flight.FlightServerError(str(exc)) from exc

    # Routed statement forms are read-only in themselves, but a source
    # SUBQUERY smuggled inside them must pass the gate too — otherwise
    # ``PIVOT (CREATE TABLE …) ON c USING sum(v)`` would execute the
    # inner command ungated.
    if (
        dialect._SUMMARIZE_RE.match(sql)
        or dialect._DESCRIBE_RE.match(sql)
        or dialect._SHOW_TABLES_RE.match(sql)
        or dialect._SHOW_TABLE_RE.match(sql)
    ):
        return run()  # table-name-only forms: nothing executable inside
    if m := dialect._DESCRIBE_SELECT_RE.match(sql):
        gate_text(m.group(1))
        return run()
    if m := dialect._PIVOT_RE.match(sql):
        src = m.group(1)
        if src.startswith("("):
            gate_text(src[1:-1])
        return run()
    if m := dialect._UNPIVOT_RE.match(sql):
        src = m.group(1)
        if src.startswith("("):
            gate_text(src[1:-1])
        return run()
    if m := dialect._EXECUTE_RE.match(sql):
        # EXECUTE runs a statement PREPAREd at init time. The stored TEXT
        # is init-trusted, but wire-triggered execution is not: an init
        # script that prepared a DML must not become a write path over
        # the wire, so the stored statement gates like any other query
        # (parameter placeholders neutralize to NULLs inside gate_text).
        stmt = dialect.dialect_state(spark).prepared.get(m.group(1).lower())
        if stmt is not None:
            gate_text(stmt)
        return run()
    # Bare-path / read_* file references and embedded dynamic PIVOTs
    # don't parse as SQL; resolve them to registered views FIRST (read
    # and read-only-gated side effects) so the gate sees an ordinary
    # statement.
    if dialect._FILE_READ_HINT_RE.search(sql):
        try:
            sql = dialect._resolve_file_reads(spark, sql)
        except Exception as exc:
            raise flight.FlightServerError(str(exc)) from exc
    if re.search(r"\(\s*PIVOT\b", sql, re.IGNORECASE):
        for em in dialect._EMBEDDED_PIVOT_RE.finditer(sql):
            src = em.group(1)
            if src.startswith("("):
                gate_text(src[1:-1])
        try:
            sql = dialect._resolve_embedded_pivots(spark, sql)
        except flight.FlightServerError:
            raise
        except Exception as exc:
            raise flight.FlightServerError(str(exc)) from exc
    gate_text(sql)
    return run()


def resolve_query_sql(spark: SparkSession, sql: str) -> str:
    """Dialect acceptance on the serving path. The reference executes
    verbatim DuckDB SQL from the wire (main.go:199 → main.go:229); a
    migrating client therefore sends ``quantile_cont``/``* EXCLUDE``/
    ``ASOF JOIN`` as raw SQL. Native Spark SQL passes through untouched
    (and pays only the parse+analysis it needed anyway); on parse or
    analysis failure the DuckDB→Spark rewrite (dialect.rewrite) is applied
    and re-gated. Command denial still applies to the rewritten form, so
    the read-only gate cannot be bypassed via dialect. Honors the same
    DuckDB-first serving default as resolve_query_frame: when active (and
    not overridden by an explicit SET dialect), the rewrite is tried
    FIRST so both-dialect-valid statements resolve to DuckDB semantics."""
    from duckdb_server_spark import dialect
    from duckdb_server_spark.dialect import rewrite

    setting = dialect.dialect_state(spark).settings.get("dialect", "").lower()
    duck_first = setting in ("duckdb", "duck") if setting else True
    if duck_first:
        try:
            rewritten = rewrite(sql, spark, duckdb_first=True)
            assert_query_shaped(spark, rewritten)
            spark.sql(rewritten).schema
            return rewritten
        except flight.FlightServerError:
            raise  # gate denial is not a dialect mismatch — don't retry
        except Exception:
            pass  # maybe Spark-dialect input — fall through to native
    try:
        assert_query_shaped(spark, sql)
        spark.sql(sql).schema  # analysis only — query-shaped, so lazy
        return sql
    except Exception as first_err:
        try:
            rewritten = rewrite(sql, spark)
        except ValueError:
            raise first_err from None
        if " ".join(rewritten.split()) == " ".join(sql.split()):
            raise
        assert_query_shaped(spark, rewritten)
        try:
            spark.sql(rewritten).schema
        except Exception as exc:
            raise flight.FlightServerError(str(exc)) from exc
        return rewritten


def iter_arrow_batches(df: DataFrame, schema: pa.Schema) -> Iterator[pa.RecordBatch]:
    """Stream a DataFrame's result as Arrow batches with bounded driver
    memory (the reference's pipelined DoGet loop, main.go:241-243).

    Each executor serializes its Arrow batches to IPC bytes inside
    ``mapInArrow`` (no row-at-a-time Python); the driver pulls one
    partition at a time via ``toLocalIterator(prefetchPartitions=True)``
    and forwards the deserialized batches. Partition order — and therefore
    any ORDER BY in the query — is preserved.
    """

    def _serialize(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            for chunk_start in range(0, batch.num_rows, BATCH_ROWS):
                chunk = batch.slice(chunk_start, BATCH_ROWS)
                sink = pa.BufferOutputStream()
                with pa.ipc.new_stream(sink, chunk.schema) as writer:
                    writer.write_batch(chunk)
                yield pa.RecordBatch.from_arrays(
                    [pa.array([sink.getvalue().to_pybytes()], pa.binary())],
                    names=["ipc"],
                )

    blobs = df.mapInArrow(_serialize, "ipc binary")
    for row in blobs.toLocalIterator(prefetchPartitions=True):
        with pa.ipc.open_stream(row.ipc) as reader:
            for batch in reader:
                if batch.schema != schema:
                    batch = pa.Table.from_batches([batch]).cast(schema).to_batches()[0]
                yield batch


class SparkFlightServer(flight.FlightServerBase):
    """Flight server over one shared SparkSession (the reference shares a
    single DuckDB connection across all requests, main.go:70)."""

    def __init__(self, spark: SparkSession, location: str = "grpc://127.0.0.1:0"):
        super().__init__(location)
        self.spark = spark
        self._location = location
        # Prepared-statement registry: opaque handle → SQL text. The
        # reference leaves DoAction Unimplemented (main.go:121-124); ADBC
        # FlightSQL drivers route *every* statement through
        # CreatePreparedStatement, so implementing the pair is what makes
        # off-the-shelf clients work end-to-end.
        self._prepared: dict[bytes, str] = {}
        # handle → one row of parameter values bound via DoPut (ADBC/JDBC
        # '?'/'$N' binding); consumed at execution time by bind_parameters.
        self._bound: dict[bytes, list] = {}
        self._prepared_lock = threading.Lock()
        self._prepared_seq = 0

    # -- statement resolution ----------------------------------------------
    def _resolve_command(self, raw: bytes):
        """Classify descriptor/ticket bytes → (kind, payload).
        kind ∈ {'sql_info_legacy', 'sql_info', 'catalogs', 'db_schemas',
        'tables', 'query'}; payload is the SQL string for 'query', the
        requested info codes for 'sql_info', the decoded filter tuple for
        'tables', else None."""
        if raw == SQL_INFO_TICKET:
            return "sql_info_legacy", None
        unpacked = flightsql.unpack_any(raw)
        if unpacked is not None:
            type_url, value = unpacked
            if type_url == flightsql.CMD_GET_SQL_INFO:
                return "sql_info", flightsql.decode_command_get_sql_info(value)
            if type_url == flightsql.CMD_STATEMENT_QUERY:
                return "query", flightsql.decode_command_statement_query(value)
            if type_url == flightsql.TICKET_STATEMENT_QUERY:
                handle = flightsql.decode_ticket_statement_query(value)
                try:
                    return "query", handle.decode("utf-8")
                except UnicodeDecodeError:
                    raise flight.FlightServerError(
                        "statement handle is not UTF-8 SQL"
                    ) from None
            if type_url == flightsql.CMD_GET_CATALOGS:
                return "catalogs", None
            if type_url == flightsql.CMD_GET_DB_SCHEMAS:
                return "db_schemas", None
            if type_url == flightsql.CMD_GET_TABLES:
                return "tables", flightsql.decode_command_get_tables(value)
            if type_url == flightsql.CMD_GET_PRIMARY_KEYS:
                return "primary_keys", None
            if type_url in (
                flightsql.CMD_GET_EXPORTED_KEYS,
                flightsql.CMD_GET_IMPORTED_KEYS,
            ):
                return "keys", None
            if type_url == flightsql.CMD_GET_XDBC_TYPE_INFO:
                return "type_info", flightsql.decode_command_get_xdbc_type_info(value)
            if type_url == flightsql.CMD_PREPARED_STATEMENT_QUERY:
                handle = flightsql.decode_prepared_statement_handle(value)
                with self._prepared_lock:
                    sql = self._prepared.get(handle)
                    params = self._bound.get(handle)
                if sql is None:
                    raise flight.FlightServerError(
                        f"unknown prepared statement handle {handle!r}"
                    )
                if params is not None:
                    from duckdb_server_spark.dialect import bind_parameters

                    try:
                        sql = bind_parameters(sql, params)
                    except ValueError as exc:
                        raise flight.FlightServerError(str(exc)) from exc
                return "query", sql
            raise flight.FlightServerError(f"unsupported Flight SQL command {type_url}")
        try:
            return "query", raw.decode("utf-8")
        except UnicodeDecodeError:
            raise flight.FlightServerError(
                "ticket is neither Flight SQL protobuf nor UTF-8 SQL"
            ) from None

    # -- FlightSQL metadata result tables -----------------------------------
    _CATALOG_NAME = "spark_catalog"
    _DB_SCHEMA_NAME = "default"

    def _metadata_table(self, kind: str, payload) -> pa.Table:
        if kind == "sql_info_legacy":
            return _legacy_sql_info_table()
        if kind == "sql_info":
            return flightsql.sql_info_table(payload)
        if kind == "catalogs":
            return pa.Table.from_arrays(
                [pa.array([self._CATALOG_NAME])], schema=flightsql.GET_CATALOGS_SCHEMA
            )
        if kind == "db_schemas":
            return pa.Table.from_arrays(
                [pa.array([self._CATALOG_NAME]), pa.array([self._DB_SCHEMA_NAME])],
                schema=flightsql.GET_DB_SCHEMAS_SCHEMA,
            )
        # Constraint metadata: parquet views carry no PK/FK — the
        # protocol-correct answer is an empty standard-schema table, so
        # ADBC metadata fetches succeed instead of erroring on
        # Unimplemented (which is what the reference returns).
        if kind == "primary_keys":
            return flightsql.empty_table(flightsql.GET_PRIMARY_KEYS_SCHEMA)
        if kind == "keys":
            return flightsql.empty_table(flightsql.GET_KEYS_SCHEMA)
        if kind == "type_info":
            return flightsql.xdbc_type_info_table(payload)
        # tables: the served temp-view namespace (the '-db' warehouse).
        # The Flight SQL table_name_filter_pattern is a SQL LIKE pattern
        # ('%' any run, '_' one char) — translate to an anchored regex so
        # '_' works and regex/glob metacharacters in names stay literal.
        pattern, include_schema = payload
        import re as _re

        like_re = None
        if pattern is not None:
            like_re = _re.compile(
                "".join(
                    ".*" if ch == "%" else "." if ch == "_" else _re.escape(ch)
                    for ch in pattern
                )
                + r"\Z"
            )
        names = sorted(
            t.name
            for t in self.spark.catalog.listTables()
            if t.isTemporary and (like_re is None or like_re.match(t.name))
        )
        arrays = [
            pa.array([self._CATALOG_NAME] * len(names)),
            pa.array([self._DB_SCHEMA_NAME] * len(names)),
            pa.array(names),
            pa.array(["VIEW"] * len(names)),
        ]
        schema = flightsql.GET_TABLES_SCHEMA
        if include_schema:
            from pyspark.sql.pandas.types import to_arrow_schema

            arrays.append(
                pa.array(
                    [
                        flightsql.serialize_schema(
                            to_arrow_schema(self.spark.table(n).schema)
                        )
                        for n in names
                    ],
                    pa.binary(),
                )
            )
            schema = flightsql.GET_TABLES_SCHEMA_WITH_SCHEMA
        return pa.Table.from_arrays(arrays, schema=schema)

    # -- entry point 2: schema probe (main.go:126-194) ----------------------
    def get_flight_info(self, context, descriptor):
        kind, payload = self._resolve_command(descriptor.command)
        if kind == "sql_info_legacy":
            schema = _legacy_sql_info_table().schema
            ticket = flight.Ticket(SQL_INFO_TICKET)
        elif kind != "query":
            # Metadata commands: cheap to build; schema from the result.
            schema = self._metadata_table(kind, payload).schema
            ticket = flight.Ticket(descriptor.command)
        else:
            # Gate + full dialect resolution BEFORE any spark.sql —
            # commands would otherwise execute eagerly during the schema
            # probe. Catalyst analysis only for plain queries (vs the
            # reference's full double execution, main.go:144-148); routed
            # statement forms may run their inherent discovery job
            # (dynamic PIVOT's distinct).
            df = resolve_query_frame(self.spark, payload)
            from pyspark.sql.pandas.types import to_arrow_schema

            try:
                schema = to_arrow_schema(df.schema)
            except Exception as exc:
                raise flight.FlightServerError(str(exc)) from exc
            # The ticket carries the original statement; DoGet re-resolves
            # deterministically (file-read views and pivots are cached by
            # digest).
            ticket = flight.Ticket(
                flightsql.encode_ticket_statement_query(payload.encode("utf-8"))
            )
        endpoint = flight.FlightEndpoint(ticket, [self._location])
        # Unknown cardinality: -1 records / -1 bytes, like the reference
        # (main.go:164-165).
        return flight.FlightInfo(schema, descriptor, [endpoint], -1, -1)

    # -- GetSchema: schema-only probe (no ticket, no execution) -------------
    def get_schema(self, context, descriptor):
        kind, payload = self._resolve_command(descriptor.command)
        if kind != "query":
            return flight.SchemaResult(self._metadata_table(kind, payload).schema)
        df = resolve_query_frame(self.spark, payload)
        from pyspark.sql.pandas.types import to_arrow_schema

        try:
            return flight.SchemaResult(to_arrow_schema(df.schema))
        except Exception as exc:
            raise flight.FlightServerError(str(exc)) from exc

    # -- entry point 1: execute + stream (main.go:196-250) ------------------
    def do_get(self, context, ticket):
        kind, payload = self._resolve_command(ticket.ticket)
        if kind != "query":
            return flight.RecordBatchStream(self._metadata_table(kind, payload))
        df = resolve_query_frame(self.spark, payload)
        from pyspark.sql.pandas.types import to_arrow_schema

        try:
            schema = to_arrow_schema(df.schema)
        except Exception as exc:  # engine error → Flight error (main.go:230-232)
            raise flight.FlightServerError(str(exc)) from exc
        return flight.GeneratorStream(schema, iter_arrow_batches(df, schema))

    # -- DoAction: prepared statements (beyond the reference, which leaves
    # DoAction Unimplemented, main.go:121-124). ADBC FlightSQL drivers
    # execute *all* statements via CreatePreparedStatement → GetFlightInfo(
    # CommandPreparedStatementQuery) → DoGet → ClosePreparedStatement, so
    # this pair is the difference between "speaks the protocol" and "works
    # with off-the-shelf clients". Other actions stay Unimplemented. --------
    def do_action(self, context, action):
        if action.type == flightsql.CREATE_PREPARED_STATEMENT:
            unpacked = flightsql.unpack_any(action.body.to_pybytes())
            if unpacked is None or unpacked[0] != flightsql.ACTION_CREATE_PREPARED_REQ:
                raise flight.FlightServerError(
                    "CreatePreparedStatement body is not "
                    "Any(ActionCreatePreparedStatementRequest)"
                )
            sql = flightsql.decode_action_create_prepared_request(unpacked[1])
            from duckdb_server_spark.dialect import (
                has_parameters,
                neutralize_parameters,
            )

            if has_parameters(sql):
                # Parameterized statement: full analysis must wait for the
                # DoPut binding, so gate the statement shape only — on the
                # placeholders-as-NULL form, since Spark's parser rejects
                # '$N' — and return an empty dataset schema; clients
                # discover it from the first result stream. The bound form
                # is re-gated + analyzed at execution.
                assert_query_shaped(self.spark, neutralize_parameters(sql))
                schema = pa.schema([])
            else:
                # Gate + analyze now: a bad statement fails at prepare
                # time (the contract ADBC relies on), and the dataset
                # schema rides back in the result so clients can bind
                # without a round trip. Full dialect surface — DESCRIBE /
                # SUMMARIZE / read_parquet prepare fine.
                df = resolve_query_frame(self.spark, sql)
                from pyspark.sql.pandas.types import to_arrow_schema

                try:
                    schema = to_arrow_schema(df.schema)
                except Exception as exc:
                    raise flight.FlightServerError(str(exc)) from exc
            with self._prepared_lock:
                self._prepared_seq += 1
                handle = b"dss-ps-%d" % self._prepared_seq
                self._prepared[handle] = sql
            yield flight.Result(
                flightsql.encode_action_create_prepared_result(
                    handle, flightsql.serialize_schema(schema)
                )
            )
            return
        if action.type == flightsql.CLOSE_PREPARED_STATEMENT:
            unpacked = flightsql.unpack_any(action.body.to_pybytes())
            if unpacked is None or unpacked[0] != flightsql.ACTION_CLOSE_PREPARED_REQ:
                raise flight.FlightServerError(
                    "ClosePreparedStatement body is not "
                    "Any(ActionClosePreparedStatementRequest)"
                )
            handle = flightsql.decode_prepared_statement_handle(unpacked[1])
            with self._prepared_lock:
                self._prepared.pop(handle, None)  # close is idempotent
                self._bound.pop(handle, None)
            return
        raise NotImplementedError(f"action {action.type!r} not implemented")

    # -- DoPut: prepared-statement parameter binding. The only write the
    # server accepts — and it writes engine state, not data: one Arrow row
    # of '?'/'$N' values per handle (the ADBC/JDBC bind sequence). Data
    # DoPut stays rejected, preserving the read-only contract. -------------
    def do_put(self, context, descriptor, reader, writer):
        unpacked = flightsql.unpack_any(descriptor.command)
        if unpacked is None or unpacked[0] != flightsql.CMD_PREPARED_STATEMENT_QUERY:
            raise flight.FlightServerError(
                "read-only server: DoPut accepts only "
                "CommandPreparedStatementQuery parameter binding"
            )
        handle = flightsql.decode_prepared_statement_handle(unpacked[1])
        with self._prepared_lock:
            if handle not in self._prepared:
                raise flight.FlightServerError(
                    f"unknown prepared statement handle {handle!r}"
                )
        table = reader.read_all()
        if table.num_rows != 1:
            raise flight.FlightServerError(
                f"parameter binding expects exactly one row, got {table.num_rows}"
            )
        row = [col[0].as_py() for col in table.columns]
        with self._prepared_lock:
            self._bound[handle] = row

    def list_actions(self, context):
        return [
            flight.ActionType(
                flightsql.CREATE_PREPARED_STATEMENT,
                "Prepare a read-only SQL statement; returns "
                "Any(ActionCreatePreparedStatementResult) with the handle "
                "and dataset schema.",
            ),
            flight.ActionType(
                flightsql.CLOSE_PREPARED_STATEMENT,
                "Release a prepared statement handle (idempotent).",
            ),
        ]


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


def query_flightsql(port: int, sql: str) -> pa.Table:
    """Standard Flight SQL two-step (reference client/main.go:13-27): the
    descriptor carries ``Any(CommandStatementQuery)``, the endpoint ticket
    is passed back opaquely — the exact wire exchange an ADBC /
    flightsql-go driver performs."""
    client = flight.connect(f"grpc://127.0.0.1:{port}")
    try:
        descriptor = flight.FlightDescriptor.for_command(
            flightsql.encode_command_statement_query(sql)
        )
        info = client.get_flight_info(descriptor)
        tables = [client.do_get(ep.ticket).read_all() for ep in info.endpoints]
        return pa.concat_tables(tables)
    finally:
        client.close()


def query_prepared(port: int, sql: str, params=None) -> pa.Table:
    """Full ADBC-style prepared-statement exchange: DoAction
    CreatePreparedStatement → [DoPut parameter row] → GetFlightInfo(
    CommandPreparedStatementQuery) → DoGet → DoAction
    ClosePreparedStatement. This is the wire sequence
    ``adbc_driver_flightsql`` emits for every ExecuteQuery."""
    client = flight.connect(f"grpc://127.0.0.1:{port}")
    try:
        results = list(
            client.do_action(
                flight.Action(
                    flightsql.CREATE_PREPARED_STATEMENT,
                    flightsql.encode_action_create_prepared_request(sql),
                )
            )
        )
        handle, _schema = flightsql.decode_action_create_prepared_result(
            results[0].body.to_pybytes()
        )
        try:
            descriptor = flight.FlightDescriptor.for_command(
                flightsql.encode_command_prepared_statement_query(handle)
            )
            if params is not None:
                batch = pa.record_batch(
                    [pa.array([v]) for v in params],
                    names=[f"param_{i + 1}" for i in range(len(params))],
                )
                put_writer, _put_meta = client.do_put(descriptor, batch.schema)
                put_writer.write_batch(batch)
                put_writer.close()
            info = client.get_flight_info(descriptor)
            tables = [client.do_get(ep.ticket).read_all() for ep in info.endpoints]
            return pa.concat_tables(tables)
        finally:
            list(
                client.do_action(
                    flight.Action(
                        flightsql.CLOSE_PREPARED_STATEMENT,
                        flightsql.encode_action_close_prepared_request(handle),
                    )
                )
            )
    finally:
        client.close()


def get_sql_info(port: int, codes: list[int] | None = None) -> pa.Table:
    """Standard Flight SQL GetSqlInfo (main.go:170-191 analog): dense-union
    value column, optional code filter."""
    client = flight.connect(f"grpc://127.0.0.1:{port}")
    try:
        descriptor = flight.FlightDescriptor.for_command(
            flightsql.encode_command_get_sql_info(codes)
        )
        info = client.get_flight_info(descriptor)
        return client.do_get(info.endpoints[0].ticket).read_all()
    finally:
        client.close()


def get_tables(
    port: int, pattern: str | None = None, include_schema: bool = False
) -> pa.Table:
    """Standard Flight SQL CommandGetTables (beyond the reference, which
    implements only GetSqlInfo — this is what ADBC's adbc_get_objects
    drives). Catalogs/db-schemas commands work the same way."""
    client = flight.connect(f"grpc://127.0.0.1:{port}")
    try:
        descriptor = flight.FlightDescriptor.for_command(
            flightsql.encode_command_get_tables(pattern, include_schema)
        )
        info = client.get_flight_info(descriptor)
        return client.do_get(info.endpoints[0].ticket).read_all()
    finally:
        client.close()


def get_sql_info_legacy(port: int) -> pa.Table:
    """Round-1 relational metadata path (plain sentinel ticket)."""
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
      registered as views at startup; serving is read-only — enforced by
      the parse-time statement gate (main.go:61's access_mode=read_only).
    - ``--init SQL``      ↔ ``-init``: ';'-separated statements run once
      after the views register (main.go:107-111) — init SQL is NOT gated,
      matching the reference's init-phase write window (k8s/main.yaml).
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
