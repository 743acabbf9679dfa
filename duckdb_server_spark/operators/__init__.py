"""Relational + beyond-reference operators.

Operators the reference reaches through SQL passthrough but Spark lacks as
builtins (as-of join, top-k with ties, distinct-on, recursive CTE) are
implemented here as compositions of DataFrame primitives; the
beyond-reference LLM-pipeline operators (dedup, similarity, text analysis,
multimodal) live here too. Everything is shuffle-conscious: see each
module's scale notes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Redistribute ``df`` when its scan yields fewer partitions than the
    session has cores (guide §2.5 — "one huge unsplittable file …
    repartition immediately after the read").

    Python-heavy stages (pandas_udf / mapInPandas) are bounded by the
    SCAN's parallelism: a sub-split-size or single-row-group parquet file
    plans 1-2 real tasks, serializing all Python work on 1-2 cores while
    the rest idle. One narrow shuffle of the input rows buys full-width
    Python throughput. Data-derived, not host-tuned: when the scan
    already saturates the cores — any real warehouse input — this is a
    no-op and no shuffle is added."""
    try:
        scan_parts = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive (plan→RDD quirks)
        return df
    par = df.sparkSession.sparkContext.defaultParallelism
    if scan_parts < par:
        return df.repartition(par)
    return df
