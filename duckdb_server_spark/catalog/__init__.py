"""Declared query catalog — the judged contract.

Every implemented operator from SURVEY.md §2 registers here as a
``(PySpark builder, DuckDB oracle SQL)`` pair. ``__spark_entry__.py``
re-exports this registry; the driver runs both sides on identical parquet
at sf0.01 and compares row-count + schema + order-insensitive value hash.

Conventions (FIXTURES.md):
- alias every computed column identically on both sides;
- explicit NULLS FIRST/LAST (Spark default ASC=NULLS FIRST, DuckDB=NULLS LAST);
- round float aggregates (partition-parallel summation order differs);
- sort collect_list/array_agg output;
- session timezone UTC.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query. ``oracle=None`` → rows-only check
    (approximate / nondeterministic / non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = " ".join(oracle.split())
        return fn

    return deco


def load_all() -> None:
    """Import every catalog module so registration side effects run."""
    from duckdb_server_spark.catalog import (  # noqa: F401
        aggregates,
        beyond,
        functions_datetime,
        functions_nested,
        functions_numeric,
        functions_string,
        joins,
        remote_sources,
        scale,
        scans,
        setops_cte,
        sorts,
        streaming_analog,
        tpch,
        tpch_suite,
        udfs_sinks,
        windows,
    )
