"""Vector math over ArrayType(Float/Double) columns — JVM higher-order
functions only (no Python on the hot path).

Determinism contract: dot products / norms are *sequential* left-fold
sums (SQL ``aggregate``), which both Spark and DuckDB evaluate in
element order — so cosine values are bit-identical across engines and
across cluster sizes. A BLAS-backed matmul (pandas UDF path) is faster
per pair but sums in SIMD-blocked order; it exists as the explicitly
non-oracle variant.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: str) -> Column:
    """array<float> -> array<double> (one exact widening per element)."""
    return F.expr(f"transform({col}, x -> CAST(x AS DOUBLE))")


def norm2(col: str) -> Column:
    """L2 norm of a double-array column, sequential sum."""
    return F.expr(
        f"sqrt(aggregate({col}, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x))"
    )


def dot(a: str, b: str) -> Column:
    """Sequential-fold dot product of two double-array columns."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
        " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
