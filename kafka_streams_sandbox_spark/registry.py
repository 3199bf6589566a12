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
    # --- round-5 ordering (VERDICT r4 Next #1): the 22 queries whose
    # latest driver row is r1/r2 lead — CORRECTNESS_r04 landed fresh
    # rows on REVERIFY_FIRST positions 1-50 exactly, so this round the
    # stale backlog goes first and the round closes with no registry
    # row older than r3. All 22 pass the full local contract at two
    # scale factors (VERIFY_LOCAL_r04{,_sf0001}.txt) and post-date no
    # code change, so ordering them ahead of round-5 work is safe:
    # round-5-touched queries follow immediately and the combined
    # block still fits the ~50-query window. ---
    "b42_above_avg_customers",     # the single r1 row (position 51 in r4)
    # r2 rows, event/documents/embeddings readers
    "b72_key_skew_report",
    "b74_robust_anomalies",
    "b77_value_quartiles",
    "b63_intradoc_repetition",
    "b64_stratified_sample",
    "b65_embedding_quantize",
    "b67_mixture_sample",
    "b68_incremental_dedup",
    "b69_quality_gate",
    "b70_bigram_lm",
    "b76_fuzzy_match",
    "b66_scd2_history",
    # r2 rows, TPC-H relational basics
    "b01_scan_filter_project",
    "b03_join_orders_customer",
    "b06_left_outer_join",
    "b07_left_semi_join",
    "b08_left_anti_join",
    "b09_window_functions",
    "b10_topk_per_group",
    "b11_global_sort_limit",
    "b12_distinct_count",
    # --- NEW in round 5 (no driver row exists yet) ---
    "b92_ann_ivf_kmeans",          # real Lloyd's coarse quantizer IVF
    "b93_semantic_dedup",          # SemDeDup capstone (LSH candidates ->
                                   # components -> keeper pick)
    "b94_semantic_dedup_exact",    # b93's exact-threshold oracle twin
    # --- changed in round 5 (code touched; rows must refresh) ---
    "b27_minhash_lsh_dedup",       # exact-dup collapse before banding
                                   # (VERDICT r4 Next #3)
    "b35_ann_random_projection",   # plane count now n-scaled (Next #2)
    "b91_ann_ivf_scaled_cells",    # sub-plane count now n-scaled
    "b90_time_grid_fill",          # NULL-ts events dropped pre-union
    "b88_shard_shuffle",           # bucket width now a config knob
    "b89_shard_write_manifest",    # contract checks real exceptions
    "b28_simhash_dedup",           # oversized-bucket star guard (its
                                   # first 100x probe OOMed outright)
    "b37_image_decode_stub",       # empty-batch + NULL-payload guards
    "b38_frame_sample",            # same kernel hardening
    "b49_audio_features",          # same kernel hardening
    # --- rotation filler: oldest remaining rows (r3) so the window,
    # if it reaches here, refreshes them in age order ---
    "b02_tpch_q1_agg",
    "b04_multiway_join_agg",
    "b05_broadcast_join_agg",
    "b13_set_operations",
    "b14_rollup_agg",
    "b16_json_extract",
    "b43_grouping_sets",
    "b45_sketch_aggregates",
    "b46_range_join_bands",
    "b52_unpivot_measures",
    "b56_exact_percentiles",
    "b57_train_holdout_split",
    "b58_tfidf_top_terms",
    "b59_funnel_conversion",
    "b62_contamination_overlap",
    "b73_retention_cohorts",
    "b40_asof_join",
    "b41_pivot_event_counts",
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
