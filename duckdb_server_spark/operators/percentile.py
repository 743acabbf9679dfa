"""Distributed exact per-group quantiles — the 100 TB percentile path.

The Arrow-kernel form (catalog a09b) is fastest at moderate group sizes
but shares the fundamental limit of every ``applyInPandas`` per-group
kernel AND of Spark's built-in exact ``percentile``: one task must hold a
whole group's values. With few groups over 100 TB that is an executor OOM,
not a slowdown.

``exact_group_quantiles`` computes the same exact ``quantile_cont`` values
with no per-group materialization anywhere:

1. filter nulls, global parallel sort by (group, value) and attach a
   global rank via :func:`operators.rank.with_global_index` (range
   repartition + per-partition count + broadcast prefix offsets — no
   single-partition window);
2. per-group row counts and rank-starts (tiny aggregates, broadcast);
3. for each (group, prob) the continuous quantile needs exactly the
   values at within-group ranks ``floor(p·(n-1))+1`` and ``ceil(...)+1``
   — a broadcast join selects those ≤ 2·|groups|·|probs| rows;
4. linear interpolation between the two selected values.

Every shuffle carries (group, value) pairs; the only driver-sized data is
#partitions offsets and #groups×#probs needed-rank rows. Skewed groups
cost nothing special: the sort is by (group, value), so a huge group
spans many range partitions.

When exactness is not required, ``approx_percentile`` (t-digest sketch,
single pass, mergeable) remains the cheaper cutover — this operator is
for exact semantics at scale.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duckdb_server_spark.operators.rank import with_global_index

__all__ = ["exact_group_quantiles"]


def exact_group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: Mapping[str, float],
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``quantile_cont`` per group, distributed.

    Returns one row per group with one column per ``probs`` entry
    (name → probability in [0, 1]). NULL values are ignored (SQL
    semantics); a group with zero non-null values is absent from the
    output, matching ``quantile_cont`` over an all-NULL group being NULL
    only when the group still appears — callers needing those groups can
    left-join the group list back.
    """
    clean = df.filter(F.col(value_col).isNotNull()).select(group_col, value_col)
    ranked = with_global_index(
        clean, [group_col, value_col], out="__gidx", num_partitions=num_partitions
    )
    per_group = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("__n"), F.min("__gidx").alias("__start")
    )

    # (group, prob, lo/hi rank, interpolation fraction) — ≤ |groups|·|probs|
    # rows, broadcast to prune the ranked relation down to the needed rows.
    prob_entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("__pname"),
                F.lit(float(p)).alias("__p"),
            )
            for name, p in probs.items()
        ]
    )
    pos = F.col("__p") * (F.col("__n") - 1).cast("double")
    needed = (
        per_group.select(
            group_col, "__n", "__start", F.explode(prob_entries).alias("__e")
        )
        .select(
            F.col(group_col).alias("__g"),
            "__n",
            "__start",
            F.col("__e.__pname").alias("__pname"),
            F.col("__e.__p").alias("__p"),
        )
        .withColumn("__lo", F.floor(pos).cast("bigint") + 1)
        .withColumn("__hi", F.ceil(pos).cast("bigint") + 1)
        .withColumn("__frac", pos - F.floor(pos))
        .drop("__n")
    )
    rank_in_group = F.col("__gidx") - F.col("__start") + 1
    sel = ranked.join(
        F.broadcast(needed),
        (F.col(group_col) == F.col("__g"))
        & ((rank_in_group == F.col("__lo")) | (rank_in_group == F.col("__hi"))),
    ).select(
        group_col,
        "__pname",
        "__frac",
        "__lo",
        "__hi",
        rank_in_group.alias("__rank"),
        F.col(value_col).cast("double").alias("__v"),
    )
    interp = (
        sel.groupBy(group_col, "__pname", "__frac")
        .agg(
            F.min(F.when(F.col("__rank") == F.col("__lo"), F.col("__v"))).alias("__vlo"),
            F.max(F.when(F.col("__rank") == F.col("__hi"), F.col("__v"))).alias("__vhi"),
        )
        .withColumn(
            "__q", F.col("__vlo") + F.col("__frac") * (F.col("__vhi") - F.col("__vlo"))
        )
    )
    return interp.groupBy(group_col).pivot("__pname", list(probs)).agg(F.first("__q"))
