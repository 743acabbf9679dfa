"""Rewrite-family modules split out of dialect.py (round 11).
Import via duckdb_server_spark.dialect, which re-exports every
name for back-compat."""
