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
    # --- NEW in round 4 (no driver row exists at all yet) ---
    "b87_duplicated_spans",        # span-level substring-dedup coverage
    "b88_shard_shuffle",           # deterministic global shuffle + shards
    "b89_shard_write_manifest",    # partitioned shard sink + read-back
    "b90_time_grid_fill",          # hourly resample + forward fill
    "b91_ann_ivf_scaled_cells",    # late r4: the measured remedy for
                                   # b34's fixed-cell trap, registered
    # --- changed in round 4 (code touched this round; rows must refresh) ---
    "b44_cosine_topk_arrow",       # driver-side query collect removed
    "b82_context_packing",         # bucket id now integer DIV (ADVICE r3)
    "b86_phash_neardup",           # kernel empty-batch guard (ADVICE r3)
    "a10_topic_ddl",               # cached process-lifetime admin root
    "a22_stream_static_join",      # in-query duality assert added
    "a23_stream_stream_join",      # in-query duality assert added
    "b39_lsh_embedding_neardup",   # unbounded candidate broadcast removed;
                                   # late r4: verify joins merge-pinned
                                   # (100x-probe broadcast OOM); b34/b35
                                   # got the same pin — their rows refresh
                                   # via the rotation block below
    "b27_minhash_lsh_dedup",       # same removal + token-less-doc guard
    "b54_merge_upsert",            # |users|-sized change-set broadcast removed
    # hostile-input hardening (late r4) also touched b23/b30 (nullif
    # ratio guards), b26/b28 (token-less-doc guards), and the
    # embedding family b33/b34/b35/b39 (degenerate-vector guards) —
    # all already below in the rotation block, so their rows refresh
    # --- late-r4 streaming semantics fixes (self-review): ---
    "a08_stream_tombstone_store",  # store upsert order survives restart
    "a09_app_interactive_query",   # same store path via StreamsApp
    "a21_stream_running_stats",    # (ts, event_id) tie-break = b17's
    "a24_stream_dedup_watermark",  # full-payload content dedup key
    # --- late-r4 operator-review fixes (see commit messages): ---
    "b81_lang_centroid_outliers",  # degenerate-vector guard (family parity)
    "b71_corpus_curation",         # raw count before tier join; TRY_CAST
    "b83_pii_mask",                # NULL-name concat engine parity
    "a25_stream_quality_gate",     # shared quality_verdict now uses
                                   # the single TRIGRAMS_EXPR constant
    "b55_dedup_clusters",          # star-edge emission now window-min
                                   # (spillable), not collect_list;
                                   # b60/b78 consume b55's pairs so
                                   # their rows must refresh too
    "b60_canonical_assignment",
    "b78_keep_best_in_cluster",
    "b75_table_profile",          # single-scan unpivot profiler replaces
                                  # the 5-scan multi-countDistinct plan
    # DELIBERATE TRADEOFF: the two review waves above grew this list
    # to ~64 against a ~50-query window, so the rotation tail (the
    # schema-stable relational basics at the bottom) may keep its r2
    # rows one more round. Changed-code rows outrank stale-but-
    # unchanged rows — the reverse (fresh rows for unchanged queries,
    # stale-green rows for changed ones) was round 2's #1 defect.
    # Every query below ALSO passes the full local contract
    # (VERIFY_LOCAL_r04.txt, 100/100).
    # --- rotation: every row below predates round 3 (VERDICT r3 #1). ---
    # All 33 r3-touched queries landed green r3 rows, so this round's
    # window goes to the 50 queries whose latest row is r1/r2 — recorded
    # BEFORE the events.ts nanos→micros testdata drift (27d4fe7).
    # r1 rows first; event-readers lead because their rows predate the
    # drift on the very table they read.
    "b17_latest_per_user",
    "b18_table_filter_key_eq_value",
    "b19_tumbling_window_agg",
    "b20_sessionization",
    "b41_pivot_event_counts",
    "b51_sliding_window_agg",
    "b40_asof_join",
    "b56_exact_percentiles",
    # r1 rows, documents/embeddings readers
    "b23_text_stats",
    "b29_language_id",
    "b30_quality_score",
    "b31_token_count",
    "b32_fingerprint",
    "b53_rolling_hash",
    "b21_exact_dedup",
    "b24_dedup_across_sources",
    "b26_ngram_jaccard_pairs",
    "b28_simhash_dedup",
    "b39_embedding_neardup",
    "b33_cosine_topk",
    "b34_ann_ivf_label",
    "b35_ann_random_projection",
    "b48_hybrid_search",
    # r1 rows, TPC-H readers
    "b15_scalar_functions",
    "b42_above_avg_customers",
    # r2 rows, events/documents/embeddings readers
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
    # b71 moved to the operator-review block above
    # b75 moved to the changed-code block above
    "b76_fuzzy_match",
    "b66_scd2_history",
    # r2 rows, TPC-H relational basics — most schema-stable family,
    # so they absorb any window cutoff
    "b01_scan_filter_project",
    "b03_join_orders_customer",
    "b06_left_outer_join",
    "b07_left_semi_join",
    "b08_left_anti_join",
    "b09_window_functions",
    "b10_topk_per_group",
    "b11_global_sort_limit",
    "b12_distinct_count",
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
