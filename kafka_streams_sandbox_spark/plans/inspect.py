"""Physical-plan inspection helpers.

The reference prints its topology (``topology.describe()``,
KStreamsToKTable.java:183) as the sanity check on what will execute;
the Spark analog is the Catalyst physical plan. These helpers turn
``df.explain`` into assertable strings so tests can pin the plan
properties that matter at 100 TB — filters reaching the parquet scan,
small dims broadcast, rank-filters compiled to WindowGroupLimit, hot
paths staying out of row-at-a-time Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The query's physical plan as text (explain() only prints)."""
    qe = df._jdf.queryExecution()  # noqa: SLF001 — no public accessor
    jvm = df.sparkSession._jvm  # noqa: SLF001
    explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return qe.explainString(explain_mode)


def _blocks(df: DataFrame) -> list[str]:
    """Formatted-explain node blocks (blank-line separated)."""
    return plan_string(df).split("\n\n")


def scans_with_pushed_filters(df: DataFrame) -> int:
    """Number of parquet scans carrying at least one pushed filter."""
    return sum(
        1
        for block in _blocks(df)
        if "PushedFilters: [" in block
        and "PushedFilters: []" not in block
    )


def count_shuffles(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes (broadcasts excluded).

    Formatted explain prints each node twice (tree + detail), so count
    detail headers ``(N) Exchange`` only.
    """
    import re

    return sum(
        1
        for block in _blocks(df)
        if re.match(r"^\(\d+\) Exchange\b", block.strip())
    )


def has_operator(df: DataFrame, op: str) -> bool:
    """True if the physical plan contains the named operator."""
    return op in plan_string(df)


def uses_row_python_udf(df: DataFrame) -> bool:
    """True if the plan falls back to row-at-a-time Python execution
    (BatchEvalPython) — the slow path our hot-path operators must
    avoid. Arrow-batched pandas paths (ArrowEvalPython, MapInPandas,
    FlatMapGroupsInPandas*) are the sanctioned exceptions."""
    return "BatchEvalPython" in plan_string(df)


def broadcast_hint_count(df: DataFrame) -> int:
    """Number of mandatory broadcast hints in the ANALYZED logical plan.

    A ``F.broadcast()`` hint is an order Catalyst must obey regardless
    of runtime size — correct for genuinely bounded dims (configs,
    calendar weeks), a scale-killer on unbounded sides (per-user /
    per-doc tables OOM the executors at 100x data). Queries joining
    unbounded sides must leave the strategy to AQE, which this counts.
    """
    analyzed = df._jdf.queryExecution().analyzed().toString()  # noqa: SLF001
    return analyzed.count("ResolvedHint (strategy=broadcast)")


def read_schema_columns(df: DataFrame, table_hint: str) -> list[str]:
    """Column names in the ReadSchema of the scan whose path contains
    ``table_hint`` — i.e., what actually gets read from parquet."""
    cols: list[str] = []
    for block in _blocks(df):
        if "Scan parquet" not in block or table_hint not in block:
            continue
        for line in block.splitlines():
            if line.startswith("ReadSchema:"):
                schema = line.split("struct<", 1)[-1].rstrip(">")
                cols.extend(
                    f.split(":")[0].strip() for f in schema.split(",") if ":" in f
                )
    return cols
