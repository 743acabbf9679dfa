"""Persistent file sinks — the ``COPY … TO`` analog (S12).

The reference reaches DuckDB's COPY through SQL passthrough (main.go:229)
but its serving connection is read-only (main.go:61): all writes happen in
the init phase (k8s/main.yaml:100-135). Mirroring that split, these sinks
are ETL-phase APIs, not exposed through the Flight façade.

Scale notes: ``partition_by`` produces a hive layout whose partition
columns prune at read time (Dynamic Partition Pruning closes the loop on
joins); writer-side ``maxRecordsPerFile`` bounds file sizes so a 100 TB
output never produces unsplittable multi-GB files.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    max_records_per_file: int = 5_000_000,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(
    df: DataFrame, path: str, header: bool = True, mode: str = "overwrite"
) -> None:
    df.write.mode(mode).option("header", header).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)
