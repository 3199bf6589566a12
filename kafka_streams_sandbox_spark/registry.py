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
    # --- round-7 ordering (VERDICT r6 Next #4): NEW queries first,
    # then queries whose code changed this round, then the 18 queries
    # whose latest driver row is r4 — the combined head (12 new + 7
    # changed + 18 r4 rows = 37) fits the ~50-query window with room
    # for r5-row rotation, and the round closes with no registry row
    # older than r5.
    # --- NEW in round 7 (no driver row exists yet) ---
    "b99_selfseed_neardup",            # self-seeding ingest near-dup:
                                       # accepted docs join the index
    "a29_stream_selfseed_neardup",     # b99's streaming twin (parquet-
                                       # backed growing state)
    "b100_curation_capstone",          # composed funnel: quality ->
                                       # exact -> near-dup -> rewrite ->
                                       # mixture -> split
    "b101_exact_substring_runs",       # maximal-run exact-substring
                                       # rewrite (oracle-backed)
    "b102_gopher_repetition",          # Gopher repetition-rule suite
                                       # (oracle-backed)
    "b103_temperature_mixture",        # alpha=0.5 source rebalancing
                                       # (oracle-backed)
    "b104_pq_ann",                     # 8-bit product-quantization ANN
                                       # (rows-only + planted contracts)
    "b105_winnowing_fingerprints",     # winnowed candidate pairs
                                       # (oracle-backed, engine-exact)
    "a30_stream_repetition_gate",      # b102 at ingest (foreachBatch
                                       # shared core, duality assert)
    "b106_ivfpq_ann",                  # IVF x PQ composed index
                                       # (rows-only + parity contract)
    "a31_stream_pq_encode",            # PQ encode at ingest (shared
                                       # kernel, bit-identical duality)
    "b107_containment_pairs",          # asymmetric containment dedup
                                       # (oracle-backed)
    # --- changed in round 7 (code touched; rows must refresh) ---
    "b98_incremental_neardup",         # guarded_band_index now keeps
                                       # _REP_N reps per oversized bucket
    "a28_stream_incremental_neardup",  # idempotent per-batch subpaths +
                                       # checkpoint release + read guard
    "b97_span_removal_rewrite",        # linear array_except rewrite
                                       # (was per-token array_contains)
    "b27_minhash_lsh_dedup",           # banding+verify core extracted to
                                       # minhash_verified_pairs (pure
                                       # refactor; results hash-stable)
    "b96_lsh_embedding_neardup_scaled",  # docstring-only (star-pair
                                         # contract); cheap to refresh
    "b92_ann_ivf_kmeans",              # training block extracted to
                                       # _train_cell_assignments (pure
                                       # refactor; results unchanged)
    "b91_ann_ivf_scaled_cells",        # same family; cheap to refresh
    # --- r4 rows: the 18 oldest (VERDICT r6 Next #4 list) ---
    "a08_stream_tombstone_store",
    "a09_app_interactive_query",
    "a10_topic_ddl",
    "a21_stream_running_stats",
    "a22_stream_static_join",
    "a23_stream_stream_join",
    "a24_stream_dedup_watermark",
    "a25_stream_quality_gate",
    "b40_asof_join",
    "b41_pivot_event_counts",
    "b71_corpus_curation",
    "b75_table_profile",
    "b78_keep_best_in_cluster",
    "b81_lang_centroid_outliers",
    "b82_context_packing",
    "b83_pii_mask",
    "b86_phash_neardup",
    "b87_duplicated_spans",
    # --- rotation filler: oldest remaining rows (r5) in age order, so
    # the window's tail refreshes them ---
    "b01_scan_filter_project",
    "b02_tpch_q1_agg",
    "b03_join_orders_customer",
    "b04_multiway_join_agg",
    "b05_broadcast_join_agg",
    "b06_left_outer_join",
    "b07_left_semi_join",
    "b08_left_anti_join",
    "b09_window_functions",
    "b10_topk_per_group",
    "b11_global_sort_limit",
    "b12_distinct_count",
    "b13_set_operations",
    "b14_rollup_agg",
    "b16_json_extract",
    "b35_ann_random_projection",
    "b38_frame_sample",
    "b42_above_avg_customers",
    "b43_grouping_sets",
    "b45_sketch_aggregates",
    "b46_range_join_bands",
    "b49_audio_features",
    "b52_unpivot_measures",
    "b56_exact_percentiles",
    "b57_train_holdout_split",
    "b58_tfidf_top_terms",
    "b59_funnel_conversion",
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
