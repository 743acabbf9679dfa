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
    without a single-partition window.

    r16 optimization (guide §2.4 — remove shuffles outright): the local
    rank used to be ``row_number() OVER (PARTITION BY __pid ORDER BY
    keys)``. Spark cannot see that ``__pid`` IS the physical partition
    id, so WindowExec demanded ``hashpartitioning(__pid)`` — a full
    extra Exchange + Sort of the data per consumer (a09c's plan carried
    it twice). ``monotonically_increasing_id()`` encodes the same
    information shuffle-free: within a partition it is
    ``(pid << 33) + local_row_index`` assigned in physical row order,
    which after ``sortWithinPartitions`` *is* the key order. So
    ``__pid = __mono >> 33``, ``local rank = (__mono & (2^33-1)) + 1``,
    and the global rank is offset[pid] + local rank — no Window, no
    extra Exchange, identical ranks (ties were already interchangeable:
    the window ordered by the same keys the partition is sorted by).
    Requires < 2^33 rows per partition — at 8 GiB-class task sizing that
    is orders of magnitude of headroom."""
    order = _cols(keys)
    parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    from pyspark import StorageLevel

    mask = (1 << 33) - 1
    # The sorted frame is persisted (see module docstring): repartitionByRange
    # samples fresh boundaries per evaluation AND monotonically_increasing_id
    # is assignment-order-dependent, so both passes must share one
    # materialization to see one consistent (partitioning, id) layout.
    sorted_df = (
        df.repartitionByRange(int(parts), *order)
        .sortWithinPartitions(*order)
        .withColumn("__mono", F.monotonically_increasing_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pid = F.shiftright(F.col("__mono"), 33)
    counts = sorted_df.groupBy(pid.alias("__pid")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    # Prefix sum over #partitions rows — single-partition is fine here.
    # r17 (ADVICE r16): the 2^33-rows-per-partition precondition is now
    # ENFORCED, not just documented — the counts pass already has every
    # partition's size, so an assert_true folded into the offset (so
    # column pruning cannot drop it) turns a silent rank corruption into
    # a loud error, at #partitions-rows cost.
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid",
        (
            F.coalesce(F.sum("__c").over(w_off), F.lit(0))
            + F.coalesce(
                F.assert_true(
                    F.col("__c") <= F.lit(mask),
                    F.lit(
                        "with_global_index: a partition exceeds 2^33 rows"
                        " — monotonically_increasing_id local index would"
                        " overflow; repartition finer"
                    ),
                ).cast("long"),
                F.lit(0),
            )
        ).alias("__off"),
    )
    return (
        sorted_df.withColumn("__pid", pid)
        .join(F.broadcast(offsets), "__pid")
        .withColumn(
            out,
            F.col("__off") + F.col("__mono").bitwiseAND(F.lit(mask)) + F.lit(1),
        )
        .drop("__pid", "__off", "__mono")
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
