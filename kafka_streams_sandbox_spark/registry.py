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
# global time budget — rounds 1 and 2 were each cut off near the 50th
# query, leaving the tail unverified). Module order is a coarse
# ordering; REVERIFY_FIRST below is the fine one.
_OPERATOR_MODULES = (
    "kafka_streams_sandbox_spark.operators.multimodal",
    "kafka_streams_sandbox_spark.streaming.ktable",
    "kafka_streams_sandbox_spark.streaming.windows",
    "kafka_streams_sandbox_spark.streaming.app",
    "kafka_streams_sandbox_spark.streaming.ddl",
    # pipeline next: b64-b71 are round-2 additions with no driver
    # verdict yet, so they must register ahead of the families the
    # round-1 run already hash-verified.
    "kafka_streams_sandbox_spark.operators.pipeline",
    "kafka_streams_sandbox_spark.operators.curation",
    "kafka_streams_sandbox_spark.operators.packing",
    "kafka_streams_sandbox_spark.operators.privacy",
    "kafka_streams_sandbox_spark.operators.skew",
    "kafka_streams_sandbox_spark.operators.relational",
    "kafka_streams_sandbox_spark.operators.semantic",
    "kafka_streams_sandbox_spark.operators.text",
    "kafka_streams_sandbox_spark.operators.similarity",
    "kafka_streams_sandbox_spark.operators.extended",
    "kafka_streams_sandbox_spark.operators.dedup",
)

# Queries that MUST land inside the driver's ~50-query verification
# window this round, ahead of every already-green family: anything NEW
# or CHANGED since its last green CORRECTNESS row. Round 2's trap was
# front-loading only *new* queries — the six queries *rewritten* that
# round fell past the cutoff and kept stale rows (VERDICT r2 #1).
# Maintain this list every round: add each query you touch; prune once
# its fresh driver row lands.
REVERIFY_FIRST: tuple[str, ...] = (
    # changed in round 2, driver rows stale (VERDICT r2 "Next round" #1)
    "b13_set_operations",
    "b14_rollup_agg",
    "b45_sketch_aggregates",
    "b46_range_join_bands",
    "b52_unpivot_measures",
    "b55_dedup_clusters",
    "b44_cosine_topk_arrow",
    "b39_lsh_embedding_neardup",
    # NEW in round 3
    "a11_avro_value_serde",
    "b82_context_packing",
    "b83_pii_mask",
    "a10_topic_ddl",
    "a27_stream_sliding_window",
    "b84_salted_join",
    "b85_novel_bigram_ratio",
    "b86_phash_neardup",
    "b78_keep_best_in_cluster",
    "b79_stopword_prune",
    "b80_context_length_cdf",
    "b81_lang_centroid_outliers",
    # changed in round 3 (broadcast removal, single-scan TF-IDF,
    # duality-asserting streaming twins)
    "b60_canonical_assignment",
    "b73_retention_cohorts",
    "b58_tfidf_top_terms",
    "a19_stream_tumbling_window",
    "a20_stream_session_window",
    "a21_stream_running_stats",
    # changed in round 3: scaled-long two-phase exact sums (lsum_*),
    # partial-based Expand for rollup/grouping-sets, smart-init label
    # propagation (b55 feeds b60), when-chain band index
    "b02_tpch_q1_agg",
    "b04_multiway_join_agg",
    "b05_broadcast_join_agg",
    "b14_rollup_agg",
    "b16_json_extract",
    "b43_grouping_sets",
    "b50_salted_agg",
)


def _reorder(mapping: dict) -> dict:
    """Priority queries first (in REVERIFY_FIRST order), then the rest
    in registration order. Applied identically to queries and oracles
    so the driver sees one consistent order."""
    head = {k: mapping[k] for k in REVERIFY_FIRST if k in mapping}
    tail = {k: v for k, v in mapping.items() if k not in head}
    return {**head, **tail}


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
    return _reorder(QUERIES)


def all_oracles() -> dict[str, str]:
    load()
    return _reorder(ORACLES)
