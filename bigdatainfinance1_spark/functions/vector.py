"""Vector expressions over array<float> columns (SURVEY.md §2.9 L3).

All JVM-side higher-order functions (zip_with + aggregate fold) — no Python
UDFs in the hot path. Elements are cast float→double BEFORE accumulation so
results match engines that fold in double (and stay reproducible); the fold
is sequential, matching a scalar loop.

Measured alternative (rejected): unrolling the 64-dim dot into a flat
``a[0]*b[0] + …`` expression tree was 2.5× SLOWER than the fold at sf0.01
(4.5s vs 1.8s for the all-pairs near-dup join) — the 64-term tree blows the
whole-stage-codegen method-size limit and falls back to interpreted
per-node evaluation with bounds/null checks per getItem. The HOF fold stays.

The optimization that DOES pay: precompute ``l2_norm`` once per vector
before any pairwise join (callers do this), so each pair costs one dot fold
instead of one dot + two norm folds. IEEE-identical to per-pair recompute.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<float|double> columns, accumulated in double."""
    a, b = _c(a), _c(b)
    products = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm, accumulated in double."""
    a = _c(a)
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; null-safe for zero-norm vectors via nullif."""
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))


def double_matrix_literal(rows: list[list[float]]) -> Column:
    """A small (k×dim, O(model)-sized) double matrix as ONE parsed SQL
    nested-array literal. Building this with k×dim nested F.lit/F.array
    calls costs one py4j round-trip per element (~0.5 s driver time at
    8×64, measured round 5 in the Lloyd loop); one expr string is ~0.2 s
    and bit-identical — repr() of a Python float is its shortest exact
    round-trip form, and Spark SQL parses scientific-notation numerics as
    DOUBLE literals.

    Non-finite guard (round-5 ADVICE): repr(nan)/repr(inf) would parse as
    identifiers (AnalysisException) and None would raise a bare TypeError
    in float(); NaN/±Infinity get their SQL string-cast spelling instead,
    and None raises a diagnosable ValueError naming the cell."""
    import math

    def cell(i: int, j: int, v) -> str:
        if v is None:
            raise ValueError(f"double_matrix_literal: None at row {i}, pos {j}")
        x = float(v)
        if math.isfinite(x):
            return f"CAST({x!r} AS DOUBLE)"
        s = "NaN" if math.isnan(x) else ("Infinity" if x > 0 else "-Infinity")
        return f"CAST('{s}' AS DOUBLE)"

    inner = ",".join(
        "array(" + ",".join(cell(i, j, v) for j, v in enumerate(r)) + ")"
        for i, r in enumerate(rows)
    )
    return F.expr(f"array({inner})")
