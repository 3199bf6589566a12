"""Empty-input robustness: every corpus-facing query must return an
empty result — not crash — when its input table has zero rows.

At cluster scale an empty slice is routine (a new date partition, a
filtered-out source, a dry ingest batch); a query that throws on
zero rows can't be scheduled unconditionally. Scope: the families in
this round's REVERIFY window (text, dedup, similarity, Arrow kernel,
event readers).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_streams_sandbox_spark.operators import dedup, semantic, similarity, text
from kafka_streams_sandbox_spark.operators.extended import (
    b41_pivot_event_counts,
    b44_cosine_topk_arrow,
    b48_hybrid_search,
    b51_sliding_window_agg,
    b90_time_grid_fill,
)
from kafka_streams_sandbox_spark.operators.pipeline import (
    b100_curation_capstone,
    b103_temperature_mixture,
    b108_bigram_lm_gate,
    b111_lm_bucket_mixture,
)
from kafka_streams_sandbox_spark.operators.packing import (
    b88_shard_shuffle,
    b89_shard_write_manifest,
)

_DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
    ]
)
_EMB_SCHEMA = pa.schema(
    [
        ("vec_id", pa.int64()),
        ("embedding", pa.list_(pa.float32())),
        ("label", pa.int32()),
    ]
)
_EVT_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()),
        ("event_type", pa.string()),
        ("value", pa.float64()),
        ("props", pa.string()),
    ]
)


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory) -> str:
    tmp = tmp_path_factory.mktemp("empty_tables")
    for name, schema in [
        ("documents", _DOC_SCHEMA),
        ("embeddings", _EMB_SCHEMA),
        ("events", _EVT_SCHEMA),
    ]:
        pq.write_table(schema.empty_table(), str(tmp / f"{name}.parquet"))
    return str(tmp)


_QUERIES = [
    text.b23_text_stats,
    text.b29_language_id,
    text.b30_quality_score,
    text.b31_token_count,
    text.b32_fingerprint,
    text.b53_rolling_hash,
    text.b102_gopher_repetition,  # r7: empty posting -> left-join zeros
    dedup.b21_exact_dedup,
    dedup.b24_dedup_across_sources,
    dedup.b26_ngram_jaccard_pairs,
    dedup.b27_minhash_lsh_dedup,
    dedup.b28_simhash_dedup,
    dedup.b39_embedding_neardup,
    dedup.b39_lsh_embedding_neardup,
    dedup.b93_semantic_dedup,  # empty pair set -> zero-round label loop
    dedup.b94_semantic_dedup_exact,
    dedup.b95_fuzzy_match_minhash_blocked,  # r6: empty block set
    dedup.b96_lsh_embedding_neardup_scaled,  # r6: plane floor on n=0
    similarity.b33_cosine_topk,
    similarity.b34_ann_ivf_label,
    similarity.b35_ann_random_projection,
    similarity.b91_ann_ivf_scaled_cells,
    similarity.b92_ann_ivf_kmeans,  # zero seeds -> empty result, no Lloyd
    similarity.b104_pq_ann,  # r7: zero training sample -> empty result
    similarity.b106_ivfpq_ann,  # r7: no seeds -> empty result, no training
    b44_cosine_topk_arrow,
    b48_hybrid_search,
    semantic.b17_latest_per_user,
    semantic.b18_table_filter_key_eq_value,
    semantic.b19_tumbling_window_agg,
    semantic.b20_sessionization,
    b41_pivot_event_counts,
    b51_sliding_window_agg,
    dedup.b87_duplicated_spans,
    dedup.b97_span_removal_rewrite,  # r6: empty corpus -> no rewrites
    dedup.b98_incremental_neardup,  # r6: empty batch AND empty index
    dedup.b99_selfseed_neardup,  # r7: two empty rounds, empty deltas
    dedup.b101_exact_substring_runs,  # r7: empty posting/run chain
    dedup.b105_winnowing_fingerprints,  # r7: no tokens -> no prints -> no pairs
    dedup.b107_containment_pairs,  # r7: no shingles -> no buckets -> no pairs
    dedup.b109_winnowing_coverage,  # r8: empty pair set -> empty coverage
    dedup.b110_lsh_neardup_components,  # r8: empty pairs -> zero-round loop
    b88_shard_shuffle,
    b89_shard_write_manifest,  # sink: empty corpus -> empty manifest
    b90_time_grid_fill,  # sequence() over an empty agg + tagged union
    b103_temperature_mixture,  # r7: zero sources -> default cap, empty out
    b108_bigram_lm_gate,  # r8: no bigrams -> no scored docs
    b111_lm_bucket_mixture,  # r8: empty scored set -> empty buckets
    dedup.b112_paragraph_dedup,  # r9: no docs -> no paragraphs
    similarity.b114_ann_drain,  # r9: zero pages -> typed empty frame
    dedup.b115_winnowing_coverage_capped,  # r9: empty posting -> empty
]

from kafka_streams_sandbox_spark.operators.selection import (  # noqa: E402
    b116_dsir_selection,  # r10: empty hist -> zero-vote scoring pass
    b117_bpe_merge_train,  # r10: no pairs -> zero merge rounds
    b118_bpe_apply,  # r10: empty vocab join -> empty report
)

from kafka_streams_sandbox_spark.operators.pipeline import (  # noqa: E402
    b119_decontaminate_rewrite,  # r10: empty posting -> no marks
)
from kafka_streams_sandbox_spark.operators.selection import (  # noqa: E402
    b120_quality_classifier,  # r10: zero features -> zero GD rounds
)

_QUERIES += [
    b116_dsir_selection,
    b117_bpe_merge_train,
    b118_bpe_apply,
    b119_decontaminate_rewrite,
    b120_quality_classifier,
]


@pytest.mark.parametrize("fn", _QUERIES, ids=lambda f: f.__name__)
def test_query_on_empty_input_returns_empty(spark, empty_dir, fn):
    assert fn(spark, empty_dir).count() == 0


def test_graded_capstone_on_empty_input_reports_zero_attrition(
    spark, empty_dir
):
    """b113 (r9): same always-emit contract as b100 — 16 stage rows
    (incl. dedup_para and the per-bucket {in,kept} rows) of zeros on
    an empty corpus, never an empty frame."""
    from kafka_streams_sandbox_spark.operators.pipeline import (
        b113_curation_graded_mixture,
    )

    rows = b113_curation_graded_mixture(spark, empty_dir).collect()
    assert len(rows) == 16
    for r in rows:
        assert r["n_docs"] == 0 and r["n_tokens"] == 0, r


def test_capstone_on_empty_input_reports_zero_attrition(spark, empty_dir):
    """b100 is shaped differently from the list above: it ALWAYS
    emits its 9 stage rows (one stack over a single agg row; lm_gate
    joined in r8), so on an empty corpus the contract is 9 rows of
    (0 docs, 0 tokens) — not an empty frame (r7 review: n_docs
    previously surfaced NULL)."""
    rows = b100_curation_capstone(spark, empty_dir).collect()
    assert len(rows) == 9
    for r in rows:
        assert r["n_docs"] == 0 and r["n_tokens"] == 0, r
