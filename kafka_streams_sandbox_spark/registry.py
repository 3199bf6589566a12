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
    "kafka_streams_sandbox_spark.operators.selection",
    "kafka_streams_sandbox_spark.operators.attributes",
)

# Queries that MUST land inside the driver's ~50-query verification
# window this round, ahead of every already-green family: anything NEW
# or CHANGED since its last green CORRECTNESS row. Round 2's trap was
# front-loading only *new* queries — the six queries *rewritten* that
# round fell past the cutoff and kept stale rows (VERDICT r2 #1).
# Maintain this list every round: add each query you touch; prune once
# its fresh driver row lands.
REVERIFY_FIRST: tuple[str, ...] = (
    # --- round-12 ordering (VERDICT r11 #4): new + changed queries
    # first (the r2 stale-row rule: every touched query re-rows),
    # then the 30 r8-aged rows — after this round the latest-row
    # histogram's max age is r9.
    # --- NEW in round 12 (no driver row exists yet) ---
    "b122_bpe_production_train",       # driver-side merge loop over
                                       # the capped vocab (VERDICT
                                       # r11 #1)
    "b123_unigram_lm_train",           # SentencePiece-style unigram
                                       # trainer (VERDICT r11 #2)
    "a42_stream_unigram_segment",      # its frozen-vocab ingest twin
    "b124_quality_attributes",         # single-scan Dolma attributes
                                       # table (VERDICT r11 #3)
    "b125_attribute_gated_funnel",     # the funnel that reads
                                       # attributes, not text
    # --- changed in round 12 ---
    "a37_stream_graded_funnel",        # visible-restart logging in
                                       # the shared ingest run loop
                                       # (ADVICE r11 #3)
    "a34_stream_full_funnel",          # same shared loop
    "a32_stream_curation_funnel",      # same shared loop
    # --- the 30 r8-aged rows (VERDICT r11 #4) ---
    "a30_stream_repetition_gate",
    "a31_stream_pq_encode",
    "b108_bigram_lm_gate",
    "b14_rollup_agg",
    "b16_json_extract",
    "b24_dedup_across_sources",
    "b35_ann_random_projection",
    "b42_above_avg_customers",
    "b43_grouping_sets",
    "b45_sketch_aggregates",
    "b46_range_join_bands",
    "b52_unpivot_measures",
    "b56_exact_percentiles",
    "b57_train_holdout_split",
    "b59_funnel_conversion",
    "b62_contamination_overlap",
    "b63_intradoc_repetition",
    "b65_embedding_quantize",
    "b66_scd2_history",
    "b68_incremental_dedup",
    "b69_quality_gate",
    "b70_bigram_lm",
    "b72_key_skew_report",
    "b74_robust_anomalies",
    "b76_fuzzy_match",
    "b77_value_quartiles",
    "b88_shard_shuffle",
    "b89_shard_write_manifest",
    "b90_time_grid_fill",
    "b99_selfseed_neardup",
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
