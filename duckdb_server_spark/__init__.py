"""duckdb_server_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of ``markdessain/duckdb-server``.

The reference (/root/reference, `main.go`) is a thin Arrow Flight SQL shim
over an embedded DuckDB 1.4.1: every query is arbitrary SQL passed verbatim
to the engine (main.go:229) and results stream back as Arrow batches
(main.go:241-243). This package re-expresses that capability surface
Spark-first:

- ``session``   — SparkSession bootstrap (the `-db` / `-init` / extension
                  loading analog, main.go:44-119).
- ``sources``   — scans/sinks (parquet/csv/json/inline/s3a; SURVEY.md §2.1).
- ``functions`` — DuckDB-name → Spark function shim layer (SURVEY.md §2.9),
                  including divergence fixes (numeric trunc, GLOB, instr).
- ``operators`` — relational + beyond-reference operators (as-of join,
                  dedup, similarity search, text analysis, top-k).
- ``plans``     — plan inspection helpers (explain/pushdown assertions).
- ``streaming`` — Structured Streaming capability extension (SURVEY.md
                  §2.10) with batch-checkable analogs.
- ``catalog``   — the declared (PySpark query, DuckDB oracle SQL) registry
                  consumed by ``__spark_entry__.py``.
"""

__version__ = "0.1.0"
