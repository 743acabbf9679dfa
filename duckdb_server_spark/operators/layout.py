"""Data-layout operators: multi-dimensional clustering for write paths.

A 100 TB table is only as fast as its file skipping: parquet min/max
footer stats prune reads IF rows that are close in query-predicate space
are close in file space. Sorting by one column clusters that column and
scatters every other; a Z-order (Morton) curve interleaves the bits of
several columns so every interleaved dimension clusters at once — the
standard layout trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY``.

Everything here is pure Column bit arithmetic (codegen, no UDFs): the
key costs a few shifts per row at scan speed, and the write path is
``repartitionByRange`` on the key (range exchange = one shuffle) +
``sortWithinPartitions`` so each output file covers a small hyper-rectangle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative int
    columns into a single long: x occupies even bit positions, y odd.
    Adjacent z values differ in few low bits of (x, y), so range-bucketing
    the key yields small (x, y) rectangles per bucket."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i
                )
            )
        ).bitwiseOR(
            F.shiftleft(
                F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return z


def zorder_key_sql(x: str, y: str, bits: int = 8) -> str:
    """The SAME interleave as ``zorder_key``, spelled as engine-portable
    SQL (DuckDB/ANSI bit operators) — used by the differential oracle so
    both engines compute the identical curve."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def zorder_bucket_report(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = 8,
    bucket_shift: int = 8,
) -> DataFrame:
    """Cluster-quality report: bucket rows by the z key's high bits (one
    bucket ≈ one output file of the write path) and return each bucket's
    row count and (x, y) extents. With ``bits=8, bucket_shift=8`` every
    bucket is provably a 16x16 rectangle of the 256x256 key space —
    min/max footer stats on BOTH columns prune reads, which a
    single-column sort cannot do."""
    z = zorder_key(x, y, bits)
    return (
        df.select(
            F.shiftright(z, bucket_shift).alias("z_bucket"),
            x.alias("__x"),
            y.alias("__y"),
        )
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("__x").alias("x_min"),
            F.max("__x").alias("x_max"),
            F.min("__y").alias("y_min"),
            F.max("__y").alias("y_max"),
        )
    )


def write_zordered(
    df: DataFrame,
    path: str,
    x: Column,
    y: Column,
    bits: int = 8,
    num_files: int | None = None,
) -> None:
    """The actual write path: range-partition on the z key (one shuffle;
    range boundaries from Spark's sampled range partitioner), sort within
    partitions, drop the key, write parquet. Each file's footer then
    carries tight min/max on every interleaved dimension."""
    keyed = df.withColumn("__z", zorder_key(x, y, bits))
    if num_files is not None:
        keyed = keyed.repartitionByRange(num_files, "__z")
    else:
        keyed = keyed.repartitionByRange("__z")
    keyed.sortWithinPartitions("__z").drop("__z").write.mode(
        "overwrite"
    ).parquet(path)
