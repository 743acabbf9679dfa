"""Integer-exact PageRank — link-authority scoring for crawl-style
corpora (the quality-weighting signal web-scale training pipelines
compute over their link graph; Page et al. 1999, public algorithm).

Floating-point PageRank is NOT differential-oracle-friendly: partition-
parallel float summation drifts per engine and iteration amplifies the
drift. This implementation therefore runs in INTEGER MICRO-UNITS of
rank mass (``scale`` units = total mass 1.0) with truncating division:

    rank_0(v)   = scale // N
    rank_t+1(v) = (15 * scale) // (100 * N)
                  + Σ_{(u,v) ∈ E} (rank_t(u) * 85) // (100 * outdeg(u))

Every operation is exact 64-bit integer arithmetic with identical
truncation semantics in Spark (``DIV``) and DuckDB (``//``), so the
whole fixed-iteration computation replays in SQL as mechanically
generated chained CTEs — the b61 BPE pattern applied to graph
iteration. (Dangling-node mass simply leaks, the standard simplified
variant; both sides compute the identical formula, and the per-unit
truncation loss is bounded by in-degree per node per round.)

Scale shape: per iteration one join of the edge list to the rank table
on src (both keyed, shuffle carries (node, 8-byte rank)) and one
hash-aggregate on dst with map-side combine — the Pregel-style shape
that holds on a 100 TB link graph; localCheckpoint per round keeps the
lineage flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "pagerank_oracle_ctes"]


def pagerank(
    edges: DataFrame,
    iters: int = 8,
    scale: int = 1_000_000_000_000,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Return (node, rank) in integer micro-units after ``iters``
    rounds over the (deduplicated) directed edge list."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).distinct()
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()  # one scalar — the N in the rank base
    outdeg = e.groupBy("s").agg(F.count(F.lit(1)).alias("odeg"))
    base = (15 * scale) // (100 * n_nodes)
    ranks = nodes.select("node", F.lit(scale // n_nodes).alias("rank"))
    for _ in range(iters):
        contribs = (
            e.join(ranks, e.s == ranks.node)
            .join(outdeg, "s")
            .select(
                F.col("d").alias("node"),
                F.expr("(rank * 85) DIV (100 * odeg)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce("inflow", F.lit(0))).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def pagerank_oracle_ctes(
    edges_sql: str,
    iters: int = 8,
    scale: int = 1_000_000_000_000,
) -> str:
    """Chained-CTE DuckDB replay: ``edges_sql`` is a SELECT yielding
    (s, d); returns the WITH-body computing (node, rank) as ``r{iters}``.
    Callers append their own final SELECT over ``r{iters}``."""
    ctes = [
        f"e AS (SELECT DISTINCT s, d FROM ({edges_sql}))",
        "nodes AS (SELECT s AS node FROM e UNION SELECT d AS node FROM e)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "outdeg AS (SELECT s, count(*) AS odeg FROM e GROUP BY s)",
        f"r0 AS (SELECT node, {scale} // (SELECT n FROM nn) AS rank FROM nodes)",
    ]
    for t in range(iters):
        ctes.append(
            f"""ct{t} AS (
      SELECT e.d AS node, sum((r.rank * 85) // (100 * o.odeg)) AS inflow
      FROM e JOIN r{t} r ON r.node = e.s JOIN outdeg o ON o.s = e.s
      GROUP BY e.d
    ),
    r{t + 1} AS (
      SELECT nodes.node,
             ({15 * scale} // (100 * (SELECT n FROM nn)))
             + coalesce(ct{t}.inflow, 0) AS rank
      FROM nodes LEFT JOIN ct{t} ON ct{t}.node = nodes.node
    )"""
        )
    return ",\n    ".join(ctes)
