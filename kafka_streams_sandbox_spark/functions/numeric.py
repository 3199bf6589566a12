"""Deterministic numeric aggregation helpers.

IEEE-754 double addition is not associative, so ``SUM(double)`` depends
on partial-aggregation order — Spark's map-side combines and DuckDB's
morsel scheduling would produce last-ulp-different results and the
driver's value-hash correctness gate compares exact values. The fix is
semantic, not cosmetic: oracle-checked aggregates are *defined* over
fixed-point decimals. Per-row double arithmetic is bit-exact across
engines; ``CAST(x AS DECIMAL(p,s))`` rounds identically; decimal sums
are exact integers, so the final ``CAST(... AS DOUBLE)`` is a single,
deterministic rounding on both engines.

This also mirrors what a production 100 TB pipeline does with money
columns: fixed-point, not float.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,{scale})"


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent SUM over a double column via decimal fixed-point."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC.format(scale=scale))).cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """Order-independent AVG: exact decimal sum -> double, / count."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def sql_dsum(expr: str, scale: int = 2) -> str:
    """DuckDB-side twin of :func:`dsum` for oracle SQL strings."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return f"({sql_dsum(expr, scale)} / COUNT({expr}))"
