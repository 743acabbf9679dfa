"""Recursive CTE (Q2): ``WITH RECURSIVE`` via a driver-side fixpoint loop.

The keyword is declared in the reference (RECURSIVE, main.go:477) and
executes in its embedded engine; Spark SQL has no recursive CTE, so the
standard re-expression is iterate-until-fixpoint: seed frame, apply the
recursive step, union new rows, stop when the step yields nothing
(SURVEY.md §7 phase 3).

Scale notes: each iteration is a distributed job; ``localCheckpoint``
truncates the exponentially growing lineage so iteration N doesn't replay
1..N-1. Iteration count — not data size — is the driver-side cost; the data
never collects to the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def recursive_fixpoint(
    seed: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    max_iterations: int = 100,
    distinct: bool = True,
    checkpoint_interval: int = 1,
) -> DataFrame:
    """UNION-semantics recursive CTE: accumulate ``seed ∪ step(frontier)``
    until the frontier is empty (new rows only, like WITH RECURSIVE's
    implicit dedup against all prior rows when UNION is used).

    ``checkpoint_interval``: materialize the frontier every N iterations
    instead of every iteration. 1 (default) is right whenever the step
    shuffles (joins, subtract) — lineage between checkpoints would replay
    those shuffles. For narrow, shuffle-free steps (pure projections) a
    larger interval removes one job per skipped iteration while keeping
    lineage depth bounded at N; the emptiness probe then recomputes at
    most N-1 cheap narrow stages past the last materialized blocks."""
    acc = seed.localCheckpoint(eager=True)
    frontier = acc
    for i in range(max_iterations):
        nxt = step(frontier)
        if distinct:
            nxt = nxt.subtract(acc)
        if checkpoint_interval <= 1 or (i + 1) % checkpoint_interval == 0:
            nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            return acc
        # No accumulator checkpoint: acc is a union of (at least every
        # checkpoint_interval-th) checkpointed frontiers, so its lineage is
        # a shallow Union over materialized blocks plus ≤ interval-1 narrow
        # stages — re-checkpointing it would re-materialize the whole
        # accumulated set every iteration (O(N²) total writes).
        acc = acc.unionByName(nxt)
        frontier = nxt
    raise RuntimeError(f"recursive_fixpoint: no fixpoint in {max_iterations} iterations")
