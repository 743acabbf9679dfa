"""Vector math over ``array<float>`` columns — JVM-side, no Python UDFs.

DuckDB 1.4 ships ``array_cosine_similarity`` / ``array_distance``
(reachable via the reference's SQL passthrough, main.go:229; SURVEY.md §2.9
array row). Spark has no builtin vector ops, so these are built from
``zip_with`` + ``aggregate`` higher-order functions: Catalyst evaluates them
inside codegen, which keeps the similarity-search operators (operators/
similarity.py) fully distributed and Arrow-free on the hot path.

At 100 TB scale this matters: a brute-force top-k over N×M pairs is a
broadcast-join + codegen expression pipeline with zero Python boundary
crossings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (element count must match)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def vector_norm(a: Column) -> Column:
    """L2 norm ‖a‖."""
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """DuckDB ``array_cosine_similarity`` equivalent: a·b / (‖a‖‖b‖)."""
    return dot_product(a, b) / (vector_norm(a) * vector_norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    """DuckDB ``array_distance`` equivalent: ‖a−b‖."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
