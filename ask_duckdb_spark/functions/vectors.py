"""Vector column expressions over array<float>/array<double>.

All JVM-side (`F.zip_with` / `F.aggregate`): no Python in the hot path,
so similarity scans stay inside whole-stage codegen. Floats are upcast
to double before accumulation (exact for f32 inputs; accumulation order
is left-to-right sequential, matching DuckDB's list_* functions).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a, b) -> Column:
    """Dot product of two array columns (double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a) -> Column:
    """Euclidean norm of an array column (double)."""
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a, b) -> Column:
    """Cosine similarity of two array columns (double, NULL-safe on zero)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
