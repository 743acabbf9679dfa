"""Connected components by iterative min-label propagation.

The missing step between near-dup *pair* generation (MinHash-LSH /
Jaccard, operators/dedup.py) and actual deduplication: candidate pairs
form a graph whose connected components are the duplicate clusters; the
pipeline keeps one canonical document per component. The reference can
express the closure as a recursive CTE through its SQL passthrough
(main.go:229); Spark SQL has no WITH RECURSIVE, so this is a driver-side
fixpoint — the same pattern as catalog/setops_cte.py::q2 but specialized
to the min-label semiring.

Each round does (a) a neighbor-min hook — one shuffle of the edge list
joined to the current labels + a min-aggregate per node — and (b) a
pointer jump (``label ← label[label]``, a self-join on the label frame)
that doubles the distance a minimum travels per round, so convergence is
O(log diameter) rounds rather than O(diameter) — plain propagation
needs one round per hop and silently mislabels any chain longer than
max_iter (caught by the b05 oracle on a ~200-node chain). This is the
two-phase shape of large-star/small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14). Each round
``localCheckpoint``s the label frame: without it the join lineage
doubles every iteration and Catalyst re-plans an exponentially growing
tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (node, component) where component = min node id reachable.

    ``edges`` is undirected input (each pair listed once is enough);
    isolated nodes should be unioned in by the caller if they must
    appear in the output.
    """
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    sym = sym.distinct().localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint(eager=True)
    )

    # Convergence probe: labels are monotonically non-increasing (every
    # update goes through least()), so the label sum strictly decreases
    # iff any label changed — one aggregate over the checkpointed frame
    # replaces a per-round old-vs-new self-join. decimal(38,0) so huge id
    # sums cannot overflow under ANSI.
    def _label_sum(frame: DataFrame):
        return frame.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    prev_sum = _label_sum(labels)
    for _ in range(max_iter):
        # Hook: pull the minimum label from direct neighbors.
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_min"))
        )
        hooked = labels.join(
            neighbor_min, labels.node == neighbor_min.a, "left"
        ).select(
            "node",
            F.least(
                F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
            ).alias("component"),
        )
        # Jump: label ← label[label] (path compression; component ids are
        # node ids, so the parent's label is in the same frame).
        parent = hooked.select(
            F.col("node").alias("p_node"), F.col("component").alias("p_comp")
        )
        new_labels = (
            hooked.join(parent, hooked.component == parent.p_node, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("p_comp"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        labels = new_labels
        new_sum = _label_sum(labels)
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels
