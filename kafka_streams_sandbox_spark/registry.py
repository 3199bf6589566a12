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
)

# Queries that MUST land inside the driver's ~50-query verification
# window this round, ahead of every already-green family: anything NEW
# or CHANGED since its last green CORRECTNESS row. Round 2's trap was
# front-loading only *new* queries — the six queries *rewritten* that
# round fell past the cutoff and kept stale rows (VERDICT r2 #1).
# Maintain this list every round: add each query you touch; prune once
# its fresh driver row lands.
REVERIFY_FIRST: tuple[str, ...] = (
    # --- round-11 ordering (VERDICT r10 #3): new + changed queries
    # first (the r2 stale-row rule: every touched query re-rows),
    # then the LAST 24 r7-aged rows — after this round every row in
    # the registry is r8-or-newer and the rotation debt is paid off.
    # --- NEW in round 11 (no driver row exists yet) ---
    "a41_stream_quality_classifier",   # b120's frozen-weights ingest
                                       # twin (VERDICT r10 #4)
    "b121_dsir_bigram_selection",      # DSIR's published bigram unit
                                       # (VERDICT r10 #5)
    # --- changed in round 11 ---
    "b117_bpe_merge_train",            # canonical list-scan merge
                                       # fold (ADVICE r10 #1) — both
                                       # engines re-derived
    "b118_bpe_apply",                  # same fold in the final vocab
    "a39_stream_bpe_segment",          # fold at ingest + token-free
                                       # guard (ADVICE r10 #2)
    "b116_dsir_selection",             # gram-parameterized shared
                                       # core (uni path identical)
    "a38_stream_dsir_gate",            # same shared core
    "b120_quality_classifier",         # _b120_base bucket-lambda
                                       # refactor (same arithmetic)
    "a37_stream_graded_funnel",        # rw/kept_b eager materialize +
                                       # keyed frozen-set persists
                                       # (VERDICT r10 #1a/#1b)
    "a34_stream_full_funnel",          # shares _ingest_funnel's keyed
                                       # persists
    "a32_stream_curation_funnel",      # same shared funnel
    "a36_span_compaction",             # verify= knob (default full
                                       # path unchanged)
    # --- the LAST 24 r7-aged rows (VERDICT r10 #3) ---
    "a08_stream_tombstone_store",
    "a09_app_interactive_query",
    "a10_topic_ddl",
    "a21_stream_running_stats",
    "a22_stream_static_join",
    "a23_stream_stream_join",
    "a24_stream_dedup_watermark",
    "a25_stream_quality_gate",
    "b12_distinct_count",
    "b13_set_operations",
    "b40_asof_join",
    "b41_pivot_event_counts",
    "b75_table_profile",
    "b78_keep_best_in_cluster",
    "b81_lang_centroid_outliers",
    "b82_context_packing",
    "b83_pii_mask",
    "b86_phash_neardup",
    "b91_ann_ivf_scaled_cells",
    "b92_ann_ivf_kmeans",
    "b96_lsh_embedding_neardup_scaled",
    "b101_exact_substring_runs",
    "b102_gopher_repetition",
    "b107_containment_pairs",
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
