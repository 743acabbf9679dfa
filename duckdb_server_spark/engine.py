"""The public engine façade — what a user of the reference switches to.

Reference usage (README.md:1-19):
    duckdb-server -db my.db -init setup.sql   # serve Flight SQL on :32010

This engine:
    from duckdb_server_spark.engine import Engine
    eng = Engine(warehouse_dir="/data/warehouse", init_sql=["CREATE ..."])
    eng.sql("SELECT ...").show()       # embedded use (the -db analog)
    eng.serve(port=32010)              # Flight serving (the gRPC analog)

Lifecycle parity (main.go:44-119): construct → register warehouse views
(`-db`) → run init SQL (`-init`) → capability + sql_info metadata views
(duckdb_extensions()/GetSqlInfo analogs) → optionally serve.
"""

from __future__ import annotations

from collections.abc import Iterable

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

from duckdb_server_spark.session import DEFAULT_SF_DIR, bootstrap, get_spark


class Engine:
    """One engine instance = one SparkSession + one bootstrapped catalog
    (the reference's single shared connection, main.go:70)."""

    def __init__(
        self,
        warehouse_dir: str = DEFAULT_SF_DIR,
        init_sql: Iterable[str] = (),
        spark: SparkSession | None = None,
        app_name: str = "duckdb_server_spark",
    ):
        self.spark = spark or get_spark(app_name=app_name)
        self.warehouse_dir = warehouse_dir
        self.views = bootstrap(self.spark, warehouse_dir, init_sql=init_sql)
        from duckdb_server_spark.functions.udfs import register_udfs

        register_udfs(self.spark)
        self._server = None

    # -- query surface ------------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        """Arbitrary SQL over the bootstrapped catalog — the passthrough
        parity point (main.go:229): anything Spark SQL parses runs."""
        return self.spark.sql(query)

    def sql_arrow(self, query: str) -> pa.Table:
        """Execute and return Arrow — the reference's result model
        (Arrow record batches, main.go:241-243)."""
        return self.spark.sql(query).toArrow()

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def explain(self, query: str, mode: str = "formatted") -> str:
        """EXPLAIN (Q6, main.go:418)."""
        from duckdb_server_spark.plans import explain_string

        return explain_string(self.spark.sql(query), mode)

    # -- init-phase data management (main.go:107-111 / k8s init container) --
    def create_table(self, name: str, source: DataFrame | str) -> DataFrame:
        """CREATE TABLE AS — the init-phase mutation path (§1.4: the
        reference writes only during init, k8s/main.yaml:100-135; serving
        stays read-only). Persists parquet into the warehouse dir and
        registers the view."""
        import os

        df = self.sql(source) if isinstance(source, str) else source
        path = os.path.join(self.warehouse_dir_writable(), name)
        df.write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        out.createOrReplaceTempView(name)
        self.views[name] = out
        return out

    def drop_table(self, name: str) -> None:
        self.spark.catalog.dropTempView(name)
        self.views.pop(name, None)

    def list_tables(self) -> list[str]:
        return sorted(
            t.name for t in self.spark.catalog.listTables() if t.isTemporary
        )

    def warehouse_dir_writable(self) -> str:
        """Managed-table storage: a private per-engine directory (created
        lazily with mkdtemp). A fixed world-shared path would let two
        engine instances silently overwrite each other's managed tables
        and invites symlink squatting on multi-user hosts."""
        import tempfile

        if getattr(self, "_managed_dir", None) is None:
            self._managed_dir = tempfile.mkdtemp(prefix="dss_managed_")
        return self._managed_dir

    # -- serving ------------------------------------------------------------
    def serve(self, port: int = 32010, block: bool = False):
        """Start the Flight façade (the reference serves :32010,
        main.go:258,270)."""
        from duckdb_server_spark.server import SparkFlightServer, serve_in_background

        if block:
            server = SparkFlightServer(self.spark, f"grpc://0.0.0.0:{port}")
            server.serve()
            return server
        self._server, _ = serve_in_background(self.spark, port=port)
        return self._server

    def shutdown(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server = None
