"""Physical-plan inspection (SURVEY.md §4).

The reference delegates all optimization to its embedded engine
(main.go:229); this engine delegates to Catalyst + AQE. This package makes
the resulting plans *checkable*: tests assert that filters push into
parquet scans, projections prune columns, small dimensions broadcast, and
hot paths stay inside whole-stage codegen — the properties that decide
whether a query that works at sf0.1 still works at 100 TB.
"""

from duckdb_server_spark.plans.inspect import (  # noqa: F401
    explain_string,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
    wholestage_codegen_spans,
)
