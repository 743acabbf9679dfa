"""Bucketed tables — shuffle-free co-located joins (SURVEY.md §7 scale
list: "bucketing for co-located joins").

Writing both join sides bucketed by the join key into the session
warehouse lets Spark's sort-merge join skip BOTH shuffles: each bucket
pair joins locally. At 100 TB this converts the nightly fact⋈fact join
from a full-cluster shuffle into a map-side merge.

This is the warehouse-layout analog of the reference's persistent DuckDB
file (main.go:31): a bootstrap/ETL-phase layout decision that serving
queries then exploit for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    num_buckets: int = 16,
    sort_by: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed managed table (overwrites)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = df.write.bucketBy(num_buckets, bucket_by)
    writer = writer.sortBy(sort_by or bucket_by)
    writer.mode("overwrite").format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on ``on``: with equal bucket counts the
    planner elides both Exchange nodes (verified by tests/test_scale.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
