"""Scalable global ranking / positional alignment.

DuckDB exposes row-order pairing as ``POSITIONAL JOIN`` (reachable in the
reference via the SQL passthrough, main.go:229). A parallel engine has no
file order to lean on, so the deterministic form is "rank both sides by a
total order and pair by rank". The naive Spark spelling —
``row_number().over(Window.orderBy(key))`` — moves the whole relation to a
single partition (WindowExec warns exactly this), which is the canonical
100 TB anti-pattern.

``with_global_index`` instead computes the same rank with bounded
parallelism loss:

1. range-repartition + sort within partitions on the key (parallel sort;
   this is what ``df.orderBy`` itself plans),
2. count rows per physical partition (tiny aggregate),
3. prefix-sum those counts on the driver-sized side (a window over
   #partitions rows), broadcast the offsets back,
4. local ``row_number`` per partition + offset = global rank.

The sorted frame is persisted (MEMORY_AND_DISK) before the two passes:
``repartitionByRange`` draws fresh boundary samples on every evaluation,
so without a shared materialization the counts pass and the rank pass can
see *different* partitionings and produce duplicate/missing ranks — this
is exactly why ``rdd.zipWithIndex`` works off one reused lineage. Ranks
are exact and deterministic for a unique key; for duplicate keys rows
within a tie are interchangeable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["with_global_index", "positional_join"]


def _cols(keys: list[str | Column]) -> list[Column]:
    return [F.col(k).asc_nulls_last() if isinstance(k, str) else k for k in keys]


def with_global_index(
    df: DataFrame,
    keys: list[str | Column],
    out: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a 1-based global rank column ``out`` ordered by ``keys``
    without a single-partition window."""
    order = _cols(keys)
    parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    from pyspark import StorageLevel

    sorted_df = (
        df.repartitionByRange(int(parts), *order)
        .sortWithinPartitions(*order)
        .withColumn("__pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = sorted_df.groupBy("__pid").agg(F.count(F.lit(1)).alias("__c"))
    # Prefix sum over #partitions rows — single-partition is fine here.
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid", F.coalesce(F.sum("__c").over(w_off), F.lit(0)).alias("__off")
    )
    w_local = Window.partitionBy("__pid").orderBy(*order)
    return (
        sorted_df.join(F.broadcast(offsets), "__pid")
        .withColumn(out, F.col("__off") + F.row_number().over(w_local))
        .drop("__pid", "__off")
    )


def positional_join(
    left: DataFrame,
    right: DataFrame,
    left_keys: list[str | Column],
    right_keys: list[str | Column],
    how: str = "inner",
) -> DataFrame:
    """Deterministic POSITIONAL JOIN: rank both sides by their own total
    order, equi-join on the rank. The rank column ``rn`` survives in the
    output for positional auditing."""
    a = with_global_index(left, left_keys, out="rn")
    b = with_global_index(right, right_keys, out="rn")
    return a.join(b, "rn", how)
