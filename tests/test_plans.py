"""Physical-plan pins: the properties that decide 100 TB viability.

Correctness tests prove the operators compute the right answer;
these prove Catalyst compiled them to the plan we designed for —
pushdown reaching the scan, broadcast where a dim is small, rank
filters fused into the window sort, no row-at-a-time Python anywhere,
and no shuffle where the plan shouldn't need one.
"""

from __future__ import annotations

import pytest

from kafka_streams_sandbox_spark.plans.inspect import (
    broadcast_hint_count,
    count_shuffles,
    has_operator,
    plan_string,
    read_schema_columns,
    scans_with_pushed_filters,
    uses_row_python_udf,
)
from kafka_streams_sandbox_spark.registry import all_queries


@pytest.fixture(scope="module")
def queries():
    return all_queries()


def test_filter_pushdown_reaches_scan(queries, spark, sf_dir):
    """B1's predicate must appear as PushedFilters on the parquet scan
    — at 100 TB that's the difference between reading row groups and
    skipping them via statistics."""
    df = queries["b01_scan_filter_project"](spark, sf_dir)
    assert scans_with_pushed_filters(df) >= 1, plan_string(df)


def test_column_pruning_reaches_scan(queries, spark, sf_dir):
    """B1 projects a handful of lineitem columns; the scan must not
    read the other ~12 (ReadSchema == what the query touches)."""
    df = queries["b01_scan_filter_project"](spark, sf_dir)
    cols = read_schema_columns(df, "lineitem")
    assert 0 < len(cols) <= 8, cols


def test_broadcast_join_is_broadcast(queries, spark, sf_dir):
    """B5 joins lineitem to the part dim — must compile to a
    BroadcastHashJoin, never a shuffle of the fact side."""
    df = queries["b05_broadcast_join_agg"](spark, sf_dir)
    assert has_operator(df, "BroadcastHashJoin"), plan_string(df)


def test_topk_uses_window_group_limit(queries, spark, sf_dir):
    """B10/B17 rank<=k filters must fuse into WindowGroupLimit so each
    partition keeps k rows during the sort instead of ranking
    everything and filtering after."""
    for name in ("b10_topk_per_group", "b17_latest_per_user"):
        df = queries[name](spark, sf_dir)
        assert has_operator(df, "WindowGroupLimit"), (name, plan_string(df))


def test_no_row_python_udfs_anywhere(queries, spark, sf_dir):
    """No registered batch query may fall back to row-at-a-time Python
    (BatchEvalPython). Arrow-batched pandas ops are allowed; everything
    else must stay in the JVM."""
    offenders = []
    for name, fn in sorted(queries.items()):
        if name.startswith("a"):  # streaming pipelines execute on build
            continue
        df = fn(spark, sf_dir)
        if uses_row_python_udf(df):
            offenders.append(name)
    assert not offenders, offenders


def test_global_sort_limit_is_takeordered(queries, spark, sf_dir):
    """B11 orderBy().limit() must compile to TakeOrderedAndProject —
    a per-partition top-N + merge, not a global sort."""
    df = queries["b11_global_sort_limit"](spark, sf_dir)
    assert has_operator(df, "TakeOrderedAndProject"), plan_string(df)


def test_exact_dedup_single_shuffle(queries, spark, sf_dir):
    """B21 exact dedup is one hash-aggregate: exactly one Exchange in
    the plan (the groupBy on text), nothing more."""
    df = queries["b21_exact_dedup"](spark, sf_dir)
    assert count_shuffles(df) == 1, plan_string(df)


def test_map_only_text_ops_have_no_shuffle(queries, spark, sf_dir):
    """Per-document text analysis must stay embarrassingly parallel —
    zero Exchange operators in the plan."""
    for name in ("b23_text_stats", "b29_language_id", "b30_quality_score",
                 "b31_token_count", "b32_fingerprint", "b36_multimodal_metadata"):
        plan = plan_string(queries[name](spark, sf_dir))
        assert "Exchange" not in plan, (name, plan)


def test_lsh_neardup_has_no_nested_loop(queries, spark, sf_dir):
    """b39_lsh is the scale path: candidates come from LSH buckets and
    the verify joins are merge-pinned equi-joins — a nested-loop join
    over the corpus would mean it degenerated to all-pairs, a FORCED
    broadcast of the candidate set is unbounded (Σ bucket² growth;
    OOMed the round-4 10x slope measurement), and a STATIC
    auto-broadcast of the vector side OOMs once the corpus outgrows
    the driver (the 100x probe: 51 MB of parquet under the 64 MB
    threshold ballooned past 8 GB as a hash relation). The merge hints
    make both verify joins SortMergeJoin regardless of size stats."""
    df = queries["b39_lsh_embedding_neardup"](spark, sf_dir)
    assert not has_operator(df, "BroadcastNestedLoopJoin"), plan_string(df)
    assert not has_operator(df, "CartesianProduct"), plan_string(df)
    assert not has_operator(df, "BroadcastHashJoin"), plan_string(df)
    assert has_operator(df, "SortMergeJoin"), plan_string(df)
    import inspect

    from kafka_streams_sandbox_spark.operators import dedup

    src = inspect.getsource(dedup.b39_lsh_embedding_neardup)
    assert "broadcast(" not in src, "unbounded candidate broadcast"


def test_minhash_verify_joins_are_merge_pinned(queries, spark, sf_dir):
    """b27's verify joins carry shingle ARRAYS; a static
    BroadcastHashJoin build of an array-carrying side is the
    file-stats-underestimate OOM class (measured at the r5 10x probe:
    a 2 GB in-JVM hash relation from 105k candidate rows). r13
    (the 1000x disk wall, BASELINE round-13): join 1 stays
    merge-pinned (its sorted sides are bounded — bare pair ids +
    O(candidate-docs) array rows), but join 2 must be a
    SHUFFLED-HASH join so the pair rows carrying sh_a STREAM instead
    of being sorted (~120 GB of sort input at the 1000x tier's
    measured 49M-candidate density, ~235 GB of spill, dead box). No
    nested loop anywhere."""
    df = queries["b27_minhash_lsh_dedup"](spark, sf_dir)
    assert has_operator(df, "SortMergeJoin"), plan_string(df)
    assert has_operator(df, "ShuffledHashJoin"), plan_string(df)
    assert not has_operator(df, "BroadcastNestedLoopJoin"), plan_string(df)
    assert not has_operator(df, "CartesianProduct"), plan_string(df)
    # exactly ONE merge join (join 1): a second SMJ means join 2
    # regressed to sorting the array-carrying pair rows (simple-mode
    # plan: each operator appears once)
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert simple.count("SortMergeJoin") == 1, simple


def test_ann_corpus_self_joins_are_merge_pinned(queries, spark, sf_dir):
    """b34/b35 self-join the corpus-sized vector table on cell/bucket
    keys. File-size stats under-estimate array columns' in-memory
    footprint ~10-20x, so a static BroadcastHashJoin pick survives the
    autoBroadcast threshold long after the build side stopped fitting
    in driver memory (measured: the 100x probe OOM). Both must compile
    to SortMergeJoin — the spillable strategy — at any size."""
    for name in (
        "b34_ann_ivf_label",
        "b35_ann_random_projection",
        "b91_ann_ivf_scaled_cells",
    ):
        df = queries[name](spark, sf_dir)
        assert has_operator(df, "SortMergeJoin"), (name, plan_string(df))
        assert not has_operator(df, "BroadcastHashJoin"), (name, plan_string(df))
        assert not has_operator(df, "BroadcastNestedLoopJoin"), (
            name,
            plan_string(df),
        )


def test_kmeans_ivf_probe_is_cogrouped_kernel(queries, spark, sf_dir):
    """b92's rerank must be the cogrouped per-cell Arrow matmul — no
    join materializes the (n x in-cell x nprobe) candidate pair space
    (312 s at the 100x probe for the SMJ pair-join form it replaced),
    and no row-Python anywhere."""
    df = queries["b92_ann_ivf_kmeans"](spark, sf_dir)
    plan = plan_string(df)
    assert "FlatMapCoGroupsInPandas" in plan, plan
    assert not has_operator(df, "BroadcastNestedLoopJoin"), plan
    assert not has_operator(df, "CartesianProduct"), plan
    assert not uses_row_python_udf(df), plan


def test_stratified_sample_uses_window_group_limit(queries, spark, sf_dir):
    """b64's rank<=k must fuse into WindowGroupLimit (shuffle volume
    O(strata x k), not O(rows)) and shuffle exactly once (the stratum
    repartition)."""
    df = queries["b64_stratified_sample"](spark, sf_dir)
    assert has_operator(df, "WindowGroupLimit"), plan_string(df)
    assert count_shuffles(df) == 1, plan_string(df)


def test_temperature_mixture_uses_window_group_limit(queries, spark, sf_dir):
    """b103's data-dependent quota must still fuse its rank filter
    into WindowGroupLimit via the literal max-quota cap — without it
    the head source's whole partition buffers and sorts in one task —
    and the quota table must join as a broadcast."""
    df = queries["b103_temperature_mixture"](spark, sf_dir)
    plan = plan_string(df)
    assert has_operator(df, "WindowGroupLimit"), plan
    assert has_operator(df, "BroadcastHashJoin"), plan


def test_embedding_quantize_is_map_only(queries, spark, sf_dir):
    """b65 int8 quantization is a pure columnar rewrite — zero
    Exchanges, zero Python; the scale/codes projections must survive
    as separate Projects (CollapseProject inlining would re-derive the
    absmax per element)."""
    df = queries["b65_embedding_quantize"](spark, sf_dir)
    plan = plan_string(df)
    assert "Exchange" not in plan, plan
    assert not uses_row_python_udf(df), plan


def test_scd2_single_shuffle_single_sort(queries, spark, sf_dir):
    """b66's change-detection lag and validity lead share one window
    partitioning+ordering — the whole SCD2 build must be exactly one
    Exchange and one Sort (a second sort would mean the windows didn't
    fuse)."""
    import re

    df = queries["b66_scd2_history"](spark, sf_dir)
    plan = plan_string(df)
    assert count_shuffles(df) == 1, plan
    sorts = re.findall(r"^\(\d+\) Sort\b", plan, flags=re.MULTILINE)
    assert len(sorts) == 1, plan


def test_mixture_sample_broadcasts_config(queries, spark, sf_dir):
    """b67's mixture-weight config dim must broadcast — shuffling the
    corpus against a 4-row table would be the classic scale bug."""
    df = queries["b67_mixture_sample"](spark, sf_dir)
    assert has_operator(df, "BroadcastHashJoin"), plan_string(df)


def test_incremental_dedup_never_shuffles_corpus(queries, spark, sf_dir):
    """b68's corpus side must stream once against broadcast batch
    fingerprints — any SortMergeJoin would mean the corpus got
    shuffled, the thing incremental ingest exists to avoid."""
    df = queries["b68_incremental_dedup"](spark, sf_dir)
    plan = plan_string(df)
    assert not has_operator(df, "SortMergeJoin"), plan
    assert has_operator(df, "BroadcastHashJoin"), plan


def test_quality_gate_is_map_only(queries, spark, sf_dir):
    """b69's filter cascade is per-doc scoring — zero Exchanges."""
    df = queries["b69_quality_gate"](spark, sf_dir)
    assert "Exchange" not in plan_string(df), plan_string(df)


def test_bigram_lm_windows_fuse(queries, spark, sf_dir):
    """b70's per-prev total (full-frame sum) and top-k rank share one
    window spec — exactly one Window node and one Sort in the plan."""
    import re

    df = queries["b70_bigram_lm"](spark, sf_dir)
    plan = plan_string(df)
    assert plan.count(") Window") == 1, plan
    assert len(re.findall(r"^\(\d+\) Sort\b", plan, flags=re.MULTILINE)) == 1, plan


def test_no_mandatory_broadcast_of_unbounded_sides(queries, spark, sf_dir):
    """b60's cluster labeling (docs-in-dup-pairs-sized) and b73's
    per-user cohort table are UNBOUNDED — a mandatory F.broadcast()
    would OOM executors at 100x data (round-2 verdict's one scale
    flaw). b60 must carry zero broadcast hints; b73 exactly one (the
    bounded |weeks|-sized cohort-size dim), never the per-user table.
    AQE still broadcasts at runtime when a side measures small — the
    pin is that nothing *forces* it."""
    b60 = queries["b60_canonical_assignment"](spark, sf_dir)
    assert broadcast_hint_count(b60) == 0, plan_string(b60)
    b73 = queries["b73_retention_cohorts"](spark, sf_dir)
    assert broadcast_hint_count(b73) == 1, plan_string(b73)
    # round 4 additions to the same discipline: b27's LSH candidate
    # set (sum(bucket^2)-sized), b39_lsh's ditto, and b54's per-user
    # change set must carry zero mandatory broadcast hints.
    for name in (
        "b27_minhash_lsh_dedup",
        "b39_lsh_embedding_neardup",
        "b54_merge_upsert",
        # r6: b98's batch x index join and candidate set are both
        # unbounded (a batch is corpus-sized in general) — AQE only
        "b98_incremental_neardup",
    ):
        df = queries[name](spark, sf_dir)
        assert broadcast_hint_count(df) == 0, (name, plan_string(df))


def test_curation_funnel_single_corpus_scan_per_stage_chain(queries, spark, sf_dir):
    """b71 composes four stages; the funnel must not fall back to
    row-Python anywhere and the mixture config must broadcast."""
    df = queries["b71_corpus_curation"](spark, sf_dir)
    assert not uses_row_python_udf(df), plan_string(df)
    assert has_operator(df, "BroadcastHashJoin"), plan_string(df)


def test_keep_best_in_cluster_no_forced_broadcast(queries, spark, sf_dir):
    """b78's cluster labeling and keeper map are docs-in-dup-pairs
    sized (unbounded, like b60) — nothing may force a broadcast; the
    keeper pick must fuse to WindowGroupLimit (one row per cluster
    crosses the rank filter)."""
    df = queries["b78_keep_best_in_cluster"](spark, sf_dir)
    assert broadcast_hint_count(df) == 0, plan_string(df)
    assert has_operator(df, "WindowGroupLimit"), plan_string(df)


def test_stopword_prune_broadcasts_bounded_set(queries, spark, sf_dir):
    """b79's stopword set is bounded by construction (df > N/2 members
    number < 2 x avg doc tokens regardless of corpus rows) — the
    per-doc side must get it via BroadcastHashJoin, never a corpus
    shuffle against the df table; zero Python anywhere."""
    df = queries["b79_stopword_prune"](spark, sf_dir)
    plan = plan_string(df)
    assert has_operator(df, "BroadcastHashJoin"), plan
    assert not uses_row_python_udf(df), plan


def test_context_length_cdf_one_corpus_shuffle(queries, spark, sf_dir):
    """b80: the corpus crosses exactly one Exchange (the bin agg,
    map-side compressed); the CDF windows run over the bin table whose
    size is bounded by max-doc-length/bin-width, so the single-
    partition window stage is constant work at any corpus size."""
    df = queries["b80_context_length_cdf"](spark, sf_dir)
    plan = plan_string(df)
    assert plan.count("hashpartitioning(") == 1, plan
    assert "SinglePartition" in plan, plan  # windows run on the bin table


def test_lang_centroid_outliers_shape(queries, spark, sf_dir):
    """b81: centroids (|langs| rows) broadcast to the scoring pass;
    the per-language top-K rank fuses to WindowGroupLimit; no
    nested-loop join anywhere (scoring is one corpus pass, not
    pairwise)."""
    df = queries["b81_lang_centroid_outliers"](spark, sf_dir)
    plan = plan_string(df)
    assert has_operator(df, "BroadcastHashJoin"), plan
    assert has_operator(df, "WindowGroupLimit"), plan
    assert not has_operator(df, "BroadcastNestedLoopJoin"), plan


def test_context_packing_no_global_order_window(queries, spark, sf_dir):
    """b82's prefix sum must NOT run a global-order window over the
    CORPUS. Exactly one single-partition stage is allowed: the
    offset cumsum over the per-bucket totals (bounded by bucket
    count), which must sit above the bucket aggregate — the
    corpus-side cumsum windows partition by bucket, and the offsets
    reach the corpus via a broadcast join."""
    df = queries["b82_context_packing"](spark, sf_dir)
    plan = plan_string(df)
    # the bounded offsets window is the only single-partition stage
    assert plan.count("SinglePartition") == 1, plan
    # the corpus-side cumsum is bucket-partitioned, never global
    assert "windowspecdefinition(bucket#" in plan, plan
    assert has_operator(df, "BroadcastHashJoin"), plan
    assert not uses_row_python_udf(df), plan


def test_pii_mask_is_map_only(queries, spark, sf_dir):
    """b83 is a pure redaction pass: zero Exchanges, zero joins, no
    Python — the scan cost is the operator cost at any scale."""
    df = queries["b83_pii_mask"](spark, sf_dir)
    plan = plan_string(df)
    assert count_shuffles(df) == 0, plan
    assert not uses_row_python_udf(df), plan


def test_salted_join_is_two_sided_shuffle(queries, spark, sf_dir):
    """b84 exists to exercise the salted SHUFFLE join: the hint must
    hold (ShuffledHashJoin, not broadcast — broadcast would hide what
    salting fixes), and both join keys (user_id, salt) must reach the
    join so hot keys split across reducers."""
    df = queries["b84_salted_join"](spark, sf_dir)
    plan = plan_string(df)
    assert has_operator(df, "ShuffledHashJoin"), plan
    assert not has_operator(df, "BroadcastHashJoin"), plan
    assert "salt" in plan, plan


def test_novelty_no_vocab_broadcast(queries, spark, sf_dir):
    """b85's bigram-frequency side is corpus-sized (unbounded) — the
    plan must not force a broadcast of it, and nothing may fall back
    to Python or a nested loop."""
    df = queries["b85_novel_bigram_ratio"](spark, sf_dir)
    plan = plan_string(df)
    assert broadcast_hint_count(df) == 0, plan
    assert not has_operator(df, "BroadcastNestedLoopJoin"), plan
    assert not uses_row_python_udf(df), plan


def test_phash_neardup_banded_not_allpairs(queries, spark, sf_dir):
    """b86's candidate generation must be the banded equi-join — no
    nested-loop/cartesian pairing — and only Arrow-batched Python
    (the hash kernel), never row-at-a-time."""
    df = queries["b86_phash_neardup"](spark, sf_dir)
    plan = plan_string(df)
    assert not has_operator(df, "BroadcastNestedLoopJoin"), plan
    assert not has_operator(df, "CartesianProduct"), plan
    assert not uses_row_python_udf(df), plan


def test_b44_no_driver_collect_and_map_only_corpus(queries, spark, sf_dir):
    """b44's query side must reach the kernel as a broadcast variable
    (Arrow action + sc.broadcast), never a row-object .collect(); the
    corpus side stays map-only Arrow batches — no join, no cartesian,
    no row-at-a-time Python (VERDICT r3 #5)."""
    import inspect

    from kafka_streams_sandbox_spark.operators import extended

    src = inspect.getsource(extended.b44_cosine_topk_arrow)
    assert ".collect(" not in src, "driver-side collect reintroduced"
    assert "broadcast(" in src, "query matrix must ship as a broadcast"
    df = queries["b44_cosine_topk_arrow"](spark, sf_dir)
    plan = plan_string(df)
    assert not has_operator(df, "BroadcastNestedLoopJoin"), plan
    assert not has_operator(df, "CartesianProduct"), plan
    assert not has_operator(df, "SortMergeJoin"), plan
    assert not uses_row_python_udf(df), plan


def test_scaled_lsh_neardup_merge_pinned_no_forced_broadcast(
    queries, spark, sf_dir
):
    """b96 (r6) inherits b39_lsh's whole plan discipline: verify joins
    merge-pinned (array-carrying corpus sides must never ride a
    static file-stats BroadcastHashJoin), no nested loop, no
    cartesian, and zero MANDATORY broadcasts (the candidate set grows
    with sum(bucket^2))."""
    df = queries["b96_lsh_embedding_neardup_scaled"](spark, sf_dir)
    assert has_operator(df, "SortMergeJoin"), plan_string(df)
    assert not has_operator(df, "BroadcastNestedLoopJoin"), plan_string(df)
    assert not has_operator(df, "CartesianProduct"), plan_string(df)
    assert not has_operator(df, "BroadcastHashJoin"), plan_string(df)
    import inspect

    from kafka_streams_sandbox_spark.operators import dedup

    src = inspect.getsource(dedup.b96_lsh_embedding_neardup_scaled)
    assert "broadcast(" not in src, "unbounded candidate broadcast"


def test_minhash_blocked_fuzzy_match_no_forced_broadcast(
    queries, spark, sf_dir
):
    """b95 (r6): the block-candidate set is unbounded (sum(block^2))
    and the head side is corpus-sized — nothing may FORCE a broadcast
    (AQE still may at runtime when a side measures small), and no
    nested loop / cartesian may appear (the blocking join is pure
    equi-join by construction)."""
    df = queries["b95_fuzzy_match_minhash_blocked"](spark, sf_dir)
    assert broadcast_hint_count(df) == 0, plan_string(df)
    assert not has_operator(df, "BroadcastNestedLoopJoin"), plan_string(df)
    assert not has_operator(df, "CartesianProduct"), plan_string(df)
    assert not uses_row_python_udf(df), plan_string(df)


def test_exact_substring_runs_plan_shape(queries, spark, sf_dir):
    """b101 (r7): same posting-list discipline as b87/b97 — no
    mandatory broadcast anywhere (the dup set, run set, and removal
    set are all unbounded), no row-Python, no nested-loop/cartesian
    fallback, and exactly one spilling per-doc Window (the
    gaps-and-islands run chaining)."""
    df = queries["b101_exact_substring_runs"](spark, sf_dir)
    plan = plan_string(df)
    assert broadcast_hint_count(df) == 0, plan
    assert not uses_row_python_udf(df), plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count(") Window") == 2, plan  # run chaining + keeper election


def test_dsir_scoring_pass_is_join_free(queries, spark, sf_dir):
    """b116's scoring pass inlines the 256-bucket distributions as
    literal arrays, so the only plan operators after the scan are a
    projection and the final ~10-key aggregate: NO join anywhere (a
    histogram join per token is the shape that does NOT survive
    100 TB), and exactly one exchange (the final groupBy)."""
    df = queries["b116_dsir_selection"](spark, sf_dir)
    p = plan_string(df)
    assert not has_operator(df, "Join"), p
    assert count_shuffles(df) == 1, p
    assert not uses_row_python_udf(df), p


def test_decontaminate_marks_via_broadcast_semi_join(queries, spark, sf_dir):
    """b119's benchmark shingle set must broadcast (an eval suite is
    KB-scale at 100 TB): the mark join is a BroadcastHashJoin
    LeftSemi, and the plan carries no nested-loop join."""
    df = queries["b119_decontaminate_rewrite"](spark, sf_dir)
    p = plan_string(df)
    assert "BroadcastHashJoin" in p and "LeftSemi" in p, p
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p, p
    assert not uses_row_python_udf(df), p
