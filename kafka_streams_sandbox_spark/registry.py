"""Query registry: the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers here as
``(name, spark_fn, oracle_sql)``. ``__spark_entry__.queries()`` /
``oracle_sql()`` read straight from this module; tests iterate it too.

``oracle_sql=None`` marks a genuinely non-SQL-expressible operator
(LSH/MinHash banding, streaming jobs) — the driver then records a
weaker rows-only check, which is the honest label for those.
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Import order IS driver execution order (decorators register on
# import, and the driver walks queries() in registration order under a
# global time budget — round 1's run was cut off after the 50th query,
# leaving the tail unverified). So: the multimodal + streaming queries
# go FIRST (they had no CORRECTNESS row in round 1), the cheap
# relational/semantic/text oracle set next, and the expensive dedup
# family — already hash-verified in round 1 — absorbs any budget cut
# at the end.
_OPERATOR_MODULES = (
    "kafka_streams_sandbox_spark.operators.multimodal",
    "kafka_streams_sandbox_spark.streaming.ktable",
    "kafka_streams_sandbox_spark.streaming.windows",
    "kafka_streams_sandbox_spark.streaming.app",
    # pipeline next: b64-b71 are round-2 additions with no driver
    # verdict yet, so they must register ahead of the families the
    # round-1 run already hash-verified.
    "kafka_streams_sandbox_spark.operators.pipeline",
    "kafka_streams_sandbox_spark.operators.relational",
    "kafka_streams_sandbox_spark.operators.semantic",
    "kafka_streams_sandbox_spark.operators.text",
    "kafka_streams_sandbox_spark.operators.similarity",
    "kafka_streams_sandbox_spark.operators.extended",
    "kafka_streams_sandbox_spark.operators.dedup",
)

_loaded = False


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query function and its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load() -> None:
    """Import all operator modules so their @query decorators run."""
    global _loaded
    if _loaded:
        return
    for mod in _OPERATOR_MODULES:
        import_module(mod)
    _loaded = True


def all_queries() -> dict[str, QueryFn]:
    load()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load()
    return dict(ORACLES)
