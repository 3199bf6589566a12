"""Oracle parity for every registered query (mirrors the driver's gate).

Each oracle-backed query runs on Spark and DuckDB at sf0.001 and must
match on row count, column names, and exact values (order-insensitive).
This predicts the driver's value-hash check at sf0.01.
"""

from __future__ import annotations

import pytest

from kafka_streams_sandbox_spark.oracle import compare_query
from kafka_streams_sandbox_spark.registry import all_oracles, all_queries


def _oracle_names() -> list[str]:
    return sorted(all_oracles())


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(spark, sf_dir, name):
    result = compare_query(spark, sf_dir, name)
    assert result.ok, (
        f"{name}: {result.detail} "
        f"(rows spark={result.spark_rows} oracle={result.oracle_rows}) "
        f"{result.mismatches[:3]}"
    )


def test_every_query_runs_and_has_rows(spark, sf_dir):
    """Rows-only smoke for queries without an oracle (LSH, streaming)."""
    oracles = all_oracles()
    for name, fn in sorted(all_queries().items()):
        if name in oracles:
            continue
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_reverify_first_is_well_formed():
    """REVERIFY_FIRST drives the driver's ~50-query verification
    window; a typo'd or duplicated name silently wastes a slot (or
    worse, drops a changed query out of the window). Every entry must
    name a registered query, exactly once."""
    from kafka_streams_sandbox_spark import registry

    registry.load()
    assert len(set(registry.REVERIFY_FIRST)) == len(registry.REVERIFY_FIRST)
    missing = [n for n in registry.REVERIFY_FIRST if n not in registry.QUERIES]
    assert not missing, f"REVERIFY_FIRST names unregistered queries: {missing}"
    # and the reorder must put them literally first, same order
    head = list(registry.all_queries())[: len(registry.REVERIFY_FIRST)]
    assert head == list(registry.REVERIFY_FIRST)
