"""As-of join (J8): DuckDB ``ASOF JOIN`` re-expressed with Spark primitives.

DuckDB ≥0.9 ships ASOF JOIN (reachable through the reference's SQL
passthrough, main.go:229); Spark has no builtin. The classic scalable
rewrite: union the probe (left) and build (right) streams keyed by the join
key + event time, then propagate the most recent build-side values with
``last(..., ignorenulls=True)`` over an ordered window, and keep probe rows.

Scale notes: one shuffle on the join key (the window partition), identical
to what a native as-of join would need; no cartesian blow-up, no driver
materialization. Skewed keys behave like any window partition — salt the
key upstream if one key dominates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    how: str = "left",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right-side ``value_cols``:
    with ``direction='backward'`` the latest with ``right_ts <= left_ts``
    (DuckDB ``ON l.ts >= r.ts``), with ``'forward'`` the earliest with
    ``right_ts >= left_ts`` (DuckDB ``ON l.ts <= r.ts``); ties match in
    both directions. Same plan either way — the direction only flips the
    window's sort order.

    ``how='left'`` keeps unmatched probe rows (ASOF LEFT JOIN);
    ``how='inner'`` drops them.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    value_cols = list(value_cols)

    # build rows sort before probe rows at equal __ts → ties match
    probe = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    for v in value_cols:
        probe = probe.withColumn(f"__b_{v}", F.lit(None).cast(right.schema[v].dataType))

    build = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(v).alias(f"__b_{v}") for v in value_cols],
    )
    # align columns: build side lacks the probe payload columns
    for c in probe.columns:
        if c not in build.columns:
            build = build.withColumn(c, F.lit(None).cast(probe.schema[c].dataType))
    build = build.select(*probe.columns)

    # build rows (__side=0) sort before probe rows at equal __ts in either
    # direction, so a tie is a match; forward just reverses the time axis.
    ts_order = (
        F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = probe.unionByName(build)
    for v in value_cols:
        merged = merged.withColumn(
            f"__last_{v}", F.last(F.col(f"__b_{v}"), ignorenulls=True).over(w)
        )
    out = merged.filter(F.col("__side") == 1)
    for v in value_cols:
        out = out.withColumn(v, F.col(f"__last_{v}"))
    drop = (
        ["__ts", "__side"]
        + [f"__b_{v}" for v in value_cols]
        + [f"__last_{v}" for v in value_cols]
    )
    out = out.drop(*drop)
    if how == "inner":
        out = out.na.drop(subset=[value_cols[0]])
    return out
