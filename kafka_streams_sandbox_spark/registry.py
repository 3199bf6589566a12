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
    # --- round-6 ordering (VERDICT r5 Next #2): the 16 queries whose
    # latest driver row is r3 lead — CORRECTNESS_r05 landed fresh rows
    # on positions 1-50 exactly, so this round the r3 backlog goes
    # first and the round closes with no registry row older than r4.
    # All 16 pass the full local contract at two scale factors
    # (VERIFY_LOCAL_r05{,_sf0001}.txt); none was touched in r6, so
    # ordering them ahead of round-6 work is safe: the new/changed
    # block follows immediately and the combined set (16 + 5 new + 4
    # changed = 25) fits the ~50-query window with room for rotation.
    # --- r3 rows: streaming a-layer ---
    "a01_stream_passthrough",
    "a02_stream_table_latest",
    "a03_stream_peek",
    "a04_stream_filtered_table",
    "a11_avro_value_serde",
    "a19_stream_tumbling_window",
    "a20_stream_session_window",
    "a26_stream_incremental_dedup",
    "a27_stream_sliding_window",
    # --- r3 rows: batch ---
    "b36_multimodal_metadata",
    "b50_salted_agg",
    "b73_retention_cohorts",
    "b79_stopword_prune",
    "b80_context_length_cdf",
    "b84_salted_join",
    "b85_novel_bigram_ratio",
    # --- NEW in round 6 (no driver row exists yet) ---
    "b95_fuzzy_match_minhash_blocked",  # minhash-band blocked fuzzy ER
                                        # (b76's corpus-appropriate key)
    "b96_lsh_embedding_neardup_scaled", # n-scaled + star-guarded twin
                                        # of b39_lsh
    "b97_span_removal_rewrite",         # keep-first exact-substring
                                        # corpus rewrite (oracle-backed)
    "b98_incremental_neardup",          # ingest-time near-dup vs the
                                        # standing corpus band index
    "a28_stream_incremental_neardup",   # b98's streaming twin
                                        # (foreachBatch + static index)
    # --- changed in round 6 (code touched; rows must refresh) ---
    "b93_semantic_dedup",          # oversized-bucket star guard in the
                                   # candidate stage (VERDICT r5 #1)
    "b92_ann_ivf_kmeans",          # sub-bucketed oversized cells +
                                   # broadcast destroy (VERDICT r5 #3)
    "b27_minhash_lsh_dedup",       # collapse now gated on corpus row
                                   # count; direct path at fixture SFs
    "b28_simhash_dedup",           # shares _minhash_band_keys refactor
                                   # context (no semantic change)
    # --- rotation filler: oldest remaining rows (r4) so the window,
    # if it reaches here, refreshes them in age order ---
    "b17_latest_per_user",
    "b18_table_filter_key_eq_value",
    "b19_tumbling_window_agg",
    "b20_sessionization",
    "b21_exact_dedup",
    "b23_text_stats",
    "b24_dedup_across_sources",
    "b15_scalar_functions",
    "b26_ngram_jaccard_pairs",
    "b29_language_id",
    "b30_quality_score",
    "b31_token_count",
    "b32_fingerprint",
    "b33_cosine_topk",
    "b34_ann_ivf_label",
    "b39_embedding_neardup",
    "b39_lsh_embedding_neardup",
    "b44_cosine_topk_arrow",
    "b48_hybrid_search",
    "b51_sliding_window_agg",
    "b53_rolling_hash",
    "b54_merge_upsert",
    "b55_dedup_clusters",
    "b60_canonical_assignment",
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
