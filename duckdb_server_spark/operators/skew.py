"""Skew-mitigation operators (SURVEY.md §7 phase 5 scale list).

AQE's skew-join splitting handles join-side skew automatically
(session.py enables it); these helpers cover the cases AQE does not:
aggregation skew (one hot group key overwhelming a reducer) and
deliberately salted joins for pathological key distributions.

Semantics are exactly the unsalted operation — salting is a physical
rewrite, so every salted query still oracle-checks against plain SQL.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation with a salt column.

    Stage 1 groups by (keys…, salt) — the hot key's rows spread over
    ``salt_buckets`` reducers; stage 2 merges the partials by the real
    keys. ``aggs`` maps output-column name → a *re-aggregable* expression
    built from ``F.col`` over stage-1 outputs is NOT needed: pass the
    partial agg, and give the merge via :func:`_MERGE` lookup below
    (sum→sum, count→sum, min→min, max→max).
    """
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("__salt")
    stage1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt")
    partials = stage1.agg(*[expr.alias(name) for name, expr in aggs.items()])
    merge = [
        _MERGE[_agg_kind(expr)](F.col(name)).alias(name)
        for name, expr in aggs.items()
    ]
    return partials.groupBy(*keys).agg(*merge)


def _agg_kind(expr: Column) -> str:
    """Classify a partial aggregate so the right merge is applied."""
    text = str(expr._jc)  # e.g. "sum(value) AS ..."
    for kind in ("sum", "count", "min", "max"):
        if text.lstrip("(").startswith(kind):
            return kind
    raise ValueError(
        f"salted_agg merges sum/count/min/max partials; got {text!r}. "
        "For avg, pass sum and count and divide after the merge."
    )


_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_group_topk(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    salt_col: Column,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe per-group top-k: two-phase salted window.

    A plain ``row_number() OVER (PARTITION BY group)`` serializes each
    group onto one task — at 100 TB a dominant group (e.g. one language
    holding most of a corpus) becomes a single-partition sort. Phase 1
    ranks within (group…, salt) — the hot group's rows spread over
    ``salt_buckets`` tasks — and keeps each salt's local top-k; phase 2
    re-ranks only the ≤ k·salt_buckets survivors per group. The global
    top-k of a group is always contained in the union of its per-salt
    top-k, so the result is exactly the unsalted window's.

    ``salt_col`` must be deterministic per row (e.g.
    ``pmod(xxhash64(id), buckets)``) so retries and both phases agree —
    never ``rand()`` here, because phase 1 evaluates it inside a shuffle
    that may be recomputed.
    """
    from pyspark.sql import Window

    salted = df.withColumn("__salt", salt_col % salt_buckets)
    w1 = Window.partitionBy(*group_cols, "__salt").orderBy(*order_cols)
    survivors = (
        salted.withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= k)
        .drop("__rn1", "__salt")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        survivors.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: salt the big side, replicate the small side
    ``salt_buckets``× (explode), join on (key, salt). Use when AQE's
    skew splitting is unavailable (e.g. the skewed side feeds a window).
    Result is identical to ``big.join(small, on, how)``."""
    big_s = big.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    small_r = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return big_s.join(small_r, [on, "__salt"], how).drop("__salt")
