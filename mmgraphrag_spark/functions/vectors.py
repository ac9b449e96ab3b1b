"""Vector column expressions over array<float> — JVM-side higher-order functions.

Used by the ANN / kNN / fusion paths (SURVEY.md §2.8). For per-block dense math
(Gram matrix, eigendecomposition) see operators/fusion.py (numpy in applyInPandas).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

def norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))

def cosine_similarity_col(a: Column, b: Column) -> Column:
    """Exact cosine; NaN-safe via small epsilon on the norms."""
    return dot_col(a, b) / (norm_col(a) * norm_col(b) + F.lit(1e-12))
