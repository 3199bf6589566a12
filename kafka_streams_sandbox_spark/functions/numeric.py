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


def lsum_partial(col: Column | str, scale: int = 2) -> Column:
    """Map-phase of the scaled-long exact sum (see :func:`lsum_final`).

    Per row both engines compute the SAME IEEE double ``x * 10^scale``
    and round it half-away — bit-identical across engines by IEEE-754
    determinism (safer than the decimal cast, whose double->decimal
    repr is engine-library-defined). The partial accumulates in a
    plain LONG — Spark's fastest aggregation path (~2x the decimal(18)
    buffer, ~4x the decimal(38) one measured at sf0.1).

    Overflow budget: the partial is bounded by rows-per-partition x
    max-scaled-value. At 10^7 rows/partition (the maxPartitionBytes
    default at 100 TB) and money values < 10^6 at scale 6 the partial
    stays < 1.2x10^18 vs the 9.2x10^18 long range. Partition size is
    the knob if values are larger — documented, not silent: the FINAL
    phase sums partials as decimal(38,0), which cannot overflow.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.round(c * F.lit(float(10**scale))).cast("bigint"))


def lsum_final(partial: Column | str, scale: int = 2) -> Column:
    """Reduce-phase: exact decimal(38,0) sum of the long partials, one
    deterministic cast to double, one double division by 10^scale —
    the DuckDB twin (:func:`sql_lsum`) performs the identical integer
    sum (HUGEINT) and the identical two double ops, so results are
    bit-equal. Integer addition is associative: any partitioning gives
    the same total, unlike double summation."""
    p = F.col(partial) if isinstance(partial, str) else partial
    return F.sum(p.cast("decimal(38,0)")).cast("double") / F.lit(
        float(10**scale)
    )


def sql_lsum(expr: str, scale: int = 2) -> str:
    """DuckDB twin of the two-phase lsum: SUM(BIGINT) accumulates in
    HUGEINT (exact), then the same double cast + division."""
    return (
        f"(CAST(SUM(CAST(ROUND(({expr}) * {10**scale}.0) AS BIGINT)) "
        f"AS DOUBLE) / {10**scale}.0)"
    )


def sql_dsum(expr: str, scale: int = 2) -> str:
    """DuckDB-side twin of :func:`dsum` for oracle SQL strings."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return f"({sql_dsum(expr, scale)} / COUNT({expr}))"
