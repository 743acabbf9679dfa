"""Sources & sinks (SURVEY.md §2.1).

Scans S1-S6 are direct ``spark.read`` calls (used throughout the catalog);
this package adds the persistent file-sink path S12 (``COPY … TO`` analog,
reachable in the reference via passthrough main.go:229 but blocked at serve
time by read-only mode main.go:61 — like the reference, writes belong to
the init/ETL phase, not the serving path).
"""

from duckdb_server_spark.sources.sinks import (  # noqa: F401
    write_csv,
    write_json,
    write_parquet,
)
