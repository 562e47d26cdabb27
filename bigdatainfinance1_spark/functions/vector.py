"""Vector expressions over array<float> columns (SURVEY.md §2.9 L3).

All JVM-side higher-order functions (zip_with + aggregate fold) — no Python
UDFs in the hot path. Elements are cast float→double BEFORE accumulation so
results match engines that fold in double (and stay reproducible); the fold
is sequential, matching a scalar loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<float|double> columns, accumulated in double."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    products = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm, accumulated in double."""
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; null-safe for zero-norm vectors via nullif."""
    return dot(a, b) / F.nullif(
        l2_norm(a) * l2_norm(b), F.lit(0.0)
    )
