"""Bucketed two-phase RANGE window frames — the 100 TB spelling of a
globally-ordered ``RANGE BETWEEN lo AND hi`` aggregate.

A value-range frame with no PARTITION BY (reference surface: DuckDB
``RANGE`` frames, SURVEY.md W6) serializes onto ONE task in any engine:
the window's order is global. That is fine for a dimension table and
fatal for a fact table. But a range frame only ever looks ``|lo|``
behind and ``hi`` ahead in VALUE space, so global order is overkill:
bucket the order column into width-``W`` value ranges (``W ≥ max(|lo|,
hi)``), and every row's frame spans at most its own bucket and an
immediate neighbor. Rows within ``hi`` of a bucket's lower edge (resp.
``|lo|`` of its upper edge) are replicated into that neighbor as frame
*pad* rows — visible to neighbors' frames, excluded from output.

Cost shape: one scan, one map-side explode (replication factor
1 + (|lo|+hi)/W — a few percent for any reasonable ``W``), one hash
shuffle on the bucket id, per-bucket sort. Parallelism = number of
buckets, so the operator scales out with the data while computing
exactly the single-task semantics.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

_BUCKET, _CENTER = "__rf_bucket", "__rf_center"


def bucketed_range_window(
    df: DataFrame,
    order_col: str,
    lo: float,
    hi: float,
    aggs: Callable[[WindowSpec], Sequence[Column]],
    num_buckets: int = 32,
) -> DataFrame:
    """Compute ``aggs`` over ``RANGE BETWEEN lo AND hi`` ordered globally
    by ``order_col``, using bucketed two-phase execution (>1 task).

    ``aggs`` receives the per-bucket WindowSpec and returns the aggregate
    columns (e.g. ``lambda w: [F.count(F.lit(1)).over(w).alias("n")]``).
    Aggregates must be insensitive to which bucket evaluates them —
    count/sum/avg/min/max over the frame qualify; row_number does not.
    Rows with NULL order values are not supported (a global range frame
    over NULLs is a single peer group — handle them separately).
    """
    if lo > 0 or hi < 0:
        raise ValueError("frame must contain the current row: lo <= 0 <= hi")
    # Window.rangeBetween takes integral boundaries (the SQL-literal float
    # form is not exposed to the DataFrame API); the ORDER column itself
    # may be fractional — boundaries coerce against it.
    if int(lo) != lo or int(hi) != hi:
        raise ValueError("frame boundaries must be integral")
    lo, hi = int(lo), int(hi)
    pad_lo, pad_hi = float(-lo), float(hi)

    # Domain bounds ride a 1-row broadcast (no driver collect, no literal
    # bake-in): the plan stays reusable across inputs.
    v = F.col(order_col).cast("double")
    bounds = df.agg(
        F.min(v).alias("__rf_vmin"), F.max(v).alias("__rf_vmax")
    )
    src = df.crossJoin(F.broadcast(bounds))

    width = F.greatest(
        F.ceil((F.col("__rf_vmax") - F.col("__rf_vmin") + 1) / num_buckets),
        F.lit(max(pad_lo, pad_hi, 1.0)),
    ).cast("double")
    offset = v - F.col("__rf_vmin")
    bucket = F.floor(offset / width)
    # Replication targets, built map-side in one pass: own bucket always;
    # the upper neighbor iff the frame of some row there reaches back to
    # us (offset within |lo| of the upper edge); the lower neighbor iff a
    # row there can see forward to us (offset within hi of the lower
    # edge). Frames never span further because W ≥ max(|lo|, hi).
    in_bucket_pos = offset - bucket * width
    targets = F.array(
        bucket,
        F.when((in_bucket_pos >= width - pad_lo) & (bucket >= 0), bucket + 1),
        F.when(in_bucket_pos < pad_hi, bucket - 1),
    )
    exploded = (
        src.withColumn(_BUCKET, F.explode(F.filter(targets, lambda b: b.isNotNull())))
        .withColumn(_CENTER, F.col(_BUCKET) == bucket)
        .drop("__rf_vmin", "__rf_vmax")
    )

    w = (
        Window.partitionBy(_BUCKET)
        .orderBy(F.col(order_col).cast("double").asc())
        .rangeBetween(lo, hi)
    )
    out_cols = [F.col(c) for c in df.columns]
    return (
        exploded.select(*out_cols, F.col(_CENTER), *aggs(w))
        .filter(F.col(_CENTER))
        .drop(_CENTER)
    )
