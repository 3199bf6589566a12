#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop sink (count() would let
Catalyst prune the work). Timings are per-query wall clock after a
JVM/session warmup query.
"""

from __future__ import annotations

import json
import os
import sys
import time

from kafka_streams_sandbox_spark.registry import all_queries
from kafka_streams_sandbox_spark.session import get_spark

# Headline set: every oracle-checked batch operator family + the LSH
# scale variants. Streaming (a*) pipelines are excluded — they time
# checkpoint setup, not operator throughput.
BENCH_QUERIES = [
    "b01_scan_filter_project",
    "b02_tpch_q1_agg",
    "b03_join_orders_customer",
    "b04_multiway_join_agg",
    "b05_broadcast_join_agg",
    "b09_window_functions",
    "b10_topk_per_group",
    "b11_global_sort_limit",
    "b12_distinct_count",
    "b14_rollup_agg",
    "b16_json_extract",
    "b17_latest_per_user",
    "b19_tumbling_window_agg",
    "b20_sessionization",
    "b21_exact_dedup",
    "b23_text_stats",
    "b24_dedup_across_sources",
    "b26_ngram_jaccard_pairs",
    "b27_minhash_lsh_dedup",
    "b28_simhash_dedup",
    "b29_language_id",
    "b33_cosine_topk",
    # b34 is a FIXTURE ANCHOR kept only for cross-round metric
    # continuity: its fixed 10-cell geometry is a documented cost
    # cliff (5.7x DuckDB at sf0.1 — similarity.py posture rule);
    # b91/b92 below are the scale shapes a real workload uses
    "b34_ann_ivf_label",
    "b35_ann_random_projection",
    # rows-only (no oracle): adds a Spark-timed row without touching
    # the shared-ratio membership
    "b91_ann_ivf_scaled_cells",
    # round-5: learned-quantizer IVF + the SemDeDup capstone pair
    "b92_ann_ivf_kmeans",
    "b93_semantic_dedup",
    "b94_semantic_dedup_exact",
    "b36_multimodal_metadata",
    "b39_embedding_neardup",
    "b39_lsh_embedding_neardup",
    # round-6: n-scaled LSH twin + minhash-blocked fuzzy ER (both
    # rows-only — Spark-timed rows, shared-ratio membership untouched)
    "b96_lsh_embedding_neardup_scaled",
    "b95_fuzzy_match_minhash_blocked",
    "b40_asof_join",
    "b41_pivot_event_counts",
    "b43_grouping_sets",
    "b44_cosine_topk_arrow",
    "b46_range_join_bands",
    "b48_hybrid_search",
    "b50_salted_agg",
    "b51_sliding_window_agg",
    "b52_unpivot_measures",
    "b53_rolling_hash",
    "b54_merge_upsert",
    "b55_dedup_clusters",
    "b57_train_holdout_split",
    "b58_tfidf_top_terms",
    "b59_funnel_conversion",
    "b60_canonical_assignment",
    "b62_contamination_overlap",
    "b63_intradoc_repetition",
    "b64_stratified_sample",
    "b65_embedding_quantize",
    "b66_scd2_history",
    "b67_mixture_sample",
    "b68_incremental_dedup",
    "b69_quality_gate",
    "b70_bigram_lm",
    "b71_corpus_curation",
    "b72_key_skew_report",
    "b73_retention_cohorts",
    "b74_robust_anomalies",
    "b76_fuzzy_match",
    "b77_value_quartiles",
    "b78_keep_best_in_cluster",
    "b79_stopword_prune",
    "b80_context_length_cdf",
    "b81_lang_centroid_outliers",
    "b82_context_packing",
    "b83_pii_mask",
    "b84_salted_join",
    "b85_novel_bigram_ratio",
    "b86_phash_neardup",
    "b87_duplicated_spans",
    # round-6: keep-first span-removal rewrite (oracle-backed --
    # joins the shared-ratio membership; its DuckDB twin is a
    # cheap posting-list CTE, nothing like b94's recursive CTE)
    "b97_span_removal_rewrite",
    # round-6: ingest-time near-dup vs the standing band index
    # (rows-only -- Spark-timed row, shared membership untouched)
    "b98_incremental_neardup",
    # round-7: self-seeding ingest near-dup and the full curation
    # capstone (both rows-only -- Spark-timed rows, shared membership
    # untouched)
    "b99_selfseed_neardup",
    "b100_curation_capstone",
    # round-7: maximal-run exact-substring rewrite (oracle-backed --
    # joins the shared-ratio membership like b97)
    "b101_exact_substring_runs",
    # round-7: Gopher repetition-rule suite (oracle-backed, joins the
    # shared-ratio membership; the DuckDB twin is per-row list math
    # over ~60-token docs -- well inside budget)
    "b102_gopher_repetition",
    # round-7: temperature-scaled source mixture (oracle-backed)
    "b103_temperature_mixture",
    # round-7: PQ ANN (rows-only -- learned codebooks; Spark-timed row,
    # shared membership untouched)
    "b104_pq_ann",
    # round-7: winnowing fingerprints (oracle-backed -- integer-exact
    # posting join, joins the shared-ratio membership)
    "b105_winnowing_fingerprints",
    # round-7: IVF x PQ composed index (rows-only)
    "b106_ivfpq_ann",
    # round-7: asymmetric containment pairs (oracle-backed, joins the
    # shared-ratio membership -- b26's plan family)
    "b107_containment_pairs",
    # round-8: CCNet-shaped bigram-LM gate (oracle-backed, joins the
    # shared-ratio membership — integer-ratio score, cheap CTE twin)
    "b108_bigram_lm_gate",
    # round-8: winnowing coverage, b105's output-bounded per-doc form
    # (oracle-backed — composes B105's SQL as a CTE)
    "b109_winnowing_coverage",
    # round-8: component expansion over b96's star-guarded pairs
    # (rows-only — iterative label loop; Spark-timed row)
    "b110_lsh_neardup_components",
    # round-8: CCNet bucketed mixture over the b108 score (oracle-
    # backed — same SQL body as b108 plus bucket/keep CASE rules)
    "b111_lm_bucket_mixture",
    # round-9: CCNet paragraph-level keep-first dedup (oracle-backed —
    # window-min + rebuild, cheap CTE twin)
    "b112_paragraph_dedup",
    # round-9: the CCNet-shaped funnel — paragraph stage + graded
    # LM-bucket mixture (rows-only — banding stage; Spark-timed row)
    "b113_curation_graded_mixture",
    # round-9: full ANN query-set drain in _ANN_QBATCH pages
    # (rows-only — learned codebooks; Spark-timed row)
    "b114_ann_drain",
    # round-9: evidence-capped winnowing coverage (oracle-backed —
    # the rank-rule twin shares B105's CTE chain)
    "b115_winnowing_coverage_capped",
    # round-10: DSIR hashed importance selection (oracle-backed —
    # integer cross-multiplied votes; the DuckDB twin is a hist join)
    "b116_dsir_selection",
    # round-10: distributed BPE merge training + its corpus-wide
    # application (both oracle-backed — unrolled MATERIALIZED-CTE
    # twins deriving the same argmax merge sequence)
    "b117_bpe_merge_train",
    "b118_bpe_apply",
    # round-10: GPT-3-style 13-gram benchmark decontamination rewrite
    # (oracle-backed — shares b97's posting/interval-union CTE shape)
    "b119_decontaminate_rewrite",
    # round-10: hashed logistic quality classifier (rows-only —
    # iterative float GD; Spark-timed row, shared membership untouched)
    "b120_quality_classifier",
    # round-11: DSIR at its published bigram unit (oracle-backed —
    # b116's hist-join twin over zip-unnested pairs)
    "b121_dsir_bigram_selection",
    # round-12: production-posture BPE (oracle-backed — the same
    # unrolled chain as b117 at 32 levels with the v0 cap; no memo,
    # every rep pays the full vocab pass + driver loop)
    "b122_bpe_production_train",
    # round-12: unigram-LM (SentencePiece) trainer (rows-only —
    # iterative EM with an Arrow DP; Spark-timed row)
    "b123_unigram_lm_train",
    # round-12: the Dolma attributes table + the funnel reading it
    # (both oracle-backed). Like b117/b118's merge memo, the staged
    # attributes parquet is built once per session — the cold first
    # rep carries the build, warm reps measure the production path
    # (readers hit the persisted table; DuckDB recomputes per pass).
    "b124_quality_attributes",
    "b125_attribute_gated_funnel",
    # round-13: the attribute-reading funnel twins (rows-only —
    # near-dup banding; Spark-timed rows). They ride the same staged
    # attributes memo as b124/b125; the interesting delta is
    # b126-vs-b100 and b127-vs-b113 wall (gates from scalars vs
    # corpus text re-scans).
    "b126_attribute_curation_funnel",
    "b127_attribute_graded_funnel",
    "b88_shard_shuffle",
    "b90_time_grid_fill",
    # b89_shard_write_manifest excluded: a side-effecting sink (writes
    # + re-reads parquet under a temp root) — it times filesystem churn,
    # not operator throughput, same reason the a* streaming jobs are out.
]


def run_query(fn, spark, sf_dir: str, runs: int = 3) -> float:
    """Best-of-N wall clock: the host is a time-shared VM whose load
    bursts inflate single runs 3-10x; the fastest run is the closest
    estimate of actual operator cost. N=3 (was 2): measured
    back-to-back runs differ 1.3-4x under colocated load, and a third
    sample cuts the inflated-best tail substantially for ~1-2 min of
    extra wall clock."""
    best = float("inf")
    for rep in range(runs):
        # label the rep's jobs so the UI/eventlog attributes every job
        # to its query (guide §1.5); thread-local, cleared after
        spark.sparkContext.setJobDescription(f"bench:{fn.__name__}:rep{rep}")
        start = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - start)
    spark.sparkContext.setJobDescription(None)
    return best


# -- DuckDB twins -----------------------------------------------------------
# Same best-of-2 methodology as the Spark side (one warm pass, then
# timed passes), run per-query in a subprocess so a pathological oracle
# (b26's all-pairs form exceeds 180 s at sf0.1) can be cut off without
# killing the bench.
# 60 s: warm + 3 timed passes for the slowest finishing oracle (b29,
# ~4.7 s/pass => ~19 s) with 3x headroom for host-load bursts, so a
# finishing oracle NEVER flaps out of the shared set (VERDICT r3 #8 —
# at 30 s b29 straddled the budget under load and its membership
# moved the headline ratio run to run). Excluding b29 instead would
# bias the ratio AGAINST Spark (DuckDB is genuinely slow there).
DUCKDB_TIMEOUT_S = 60.0

# Oracles pinned as always-timed-out, so the vs-DuckDB shared-query
# set is IDENTICAL run to run: b26/b62's all-pairs / 5-gram self-join
# forms exceed any sane budget every observed run (>180 s); pinning
# them also saves two dead timeout waits per bench.
DUCKDB_EXCLUDED = {
    "b26_ngram_jaccard_pairs",
    "b62_contamination_overlap",
    # b94's recursive-CTE-over-all-pairs oracle exceeds the budget at
    # sf0.1 every observed run (the all-pairs stage is the documented
    # exact anchor); pinned like b26/b62 so the shared-query set stays
    # IDENTICAL run to run instead of flapping on a dead 60 s wait.
    "b94_semantic_dedup_exact",
}


def _duckdb_one(sf_dir: str, sql: str, q) -> None:
    import duckdb

    from kafka_streams_sandbox_spark.catalog import TABLES

    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * "
            f"FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    best = float("inf")
    con.execute(sql).fetchall()  # warm: parquet cache + plan
    for _ in range(3):
        start = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - start)
    q.put(round(best, 3))


def duckdb_timings(names: list[str], sf_dir: str) -> dict[str, float]:
    """Per-query DuckDB wall clock for every headline query that has an
    oracle twin; -1.0 = exceeded DUCKDB_TIMEOUT_S."""
    import multiprocessing as mp

    from kafka_streams_sandbox_spark.registry import all_oracles

    oracles = all_oracles()
    out: dict[str, float] = {}
    for name in names:
        sql = oracles.get(name)
        if sql is None:
            continue
        if name in DUCKDB_EXCLUDED:
            out[name] = -1.0
            continue
        q: mp.Queue = mp.Queue()
        p = mp.Process(target=_duckdb_one, args=(sf_dir, sql, q))
        p.start()
        p.join(DUCKDB_TIMEOUT_S)
        if p.is_alive():
            p.terminate()
            p.join()
            out[name] = -1.0
        else:
            # q.empty() races the feeder-thread flush after p.join(): a
            # finished run could be misreported as a timeout and drop
            # the query from the shared set. Block briefly instead.
            import queue as _queue

            try:
                out[name] = q.get(timeout=1.0)
            except _queue.Empty:
                out[name] = -1.0
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="kss-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # The r8/r9 driver-run tails carried a DAGScheduler
    # updateAccumulators stack trace (VERDICT r9 #5). Root-cause
    # attempt (r10): NOT reproducible here — two full local runs
    # (Spark-only and with the DuckDB twins) produced clean stderr, so
    # it is driver-environment-specific. The trace class is Spark's
    # known-benign late-task accumulator update: a task-completion
    # event arriving after its stage's SQLMetrics accumulators were
    # GC'd logs an ERROR with a stack trace but affects no result
    # (every r8/r9 query reported a timing; rc=0). Real job failures
    # reach Python as exceptions (recorded as -1.0 per query below)
    # regardless of logger level, so silencing this logger in the
    # bench's final output loses nothing — it only keeps the one-line
    # JSON contract's tail free of a scary non-error.
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.scheduler.DAGScheduler",
            jvm.org.apache.logging.log4j.Level.FATAL,
        )
    except Exception:
        pass  # log4j2 API moved — keep benching, worst case the WARN returns
    queries = all_queries()

    # warmup: JVM + codegen + parquet footer caches
    queries["b02_tpch_q1_agg"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    # warmup: Python/Arrow workers (numpy import + worker spawn is ~7s
    # across 32 workers the first time; that's session setup, not
    # operator throughput)
    import pandas as _pd

    spark.range(64).mapInPandas(
        lambda it: iter([_pd.DataFrame({"id": [0]})]), "id long"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = queries.get(name)
        if fn is None:
            continue
        try:
            timings[name] = round(run_query(fn, spark, sf_dir), 3)
        except Exception as exc:  # record failures, keep benching
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            timings[name] = -1.0
    total = round(sum(t for t in timings.values() if t >= 0), 3)

    # DuckDB twins + the vs-baseline ratio, computed HERE so every
    # round's BENCH json carries both engines under one methodology
    # (best-of-2 each; ratio over the queries both engines complete).
    duck: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_DUCKDB", "1") != "0":
        duck = duckdb_timings(list(timings), sf_dir)
    shared = [
        n for n, t in duck.items() if t >= 0 and timings.get(n, -1) >= 0
    ]
    spark_shared = round(sum(timings[n] for n in shared), 3)
    duck_shared = round(sum(duck[n] for n in shared), 3)
    ratio = (
        round(spark_shared / duck_shared, 3) if duck_shared > 0 else None
    )
    result = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "duckdb": duck,
        "shared_total_spark": spark_shared,
        "shared_total_duckdb": duck_shared,
        "ratio_vs_duckdb": ratio,
        "duckdb_timeouts": sorted(n for n, t in duck.items() if t < 0),
    }
    # Sidecar: the FULL payload, full query names, both engines.
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_result.json"),
        "w",
    ) as fh:
        fh.write(json.dumps(result) + "\n")
    # Final stdout line: same contract shape, but compacted to fit the
    # driver's 2000-byte stdout tail buffer (BENCH_r02/r03 were
    # "parsed: null" because the full 67-query payload is ~3.5 KB and
    # the buffer kept only its truncated tail). Query keys shrink to
    # their unique leading segments ("b01", "b39_lsh"); per-engine
    # detail lives in the sidecar.
    payload = json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "value": total,
            "unit": "sec",
            "queries": {_short(n, timings): t for n, t in timings.items()},
            "sf": sf,
            "shared_total_spark": spark_shared,
            "shared_total_duckdb": duck_shared,
            "ratio_vs_duckdb": ratio,
            "duckdb_timeouts": [
                _short(n, timings) for n, t in sorted(duck.items()) if t < 0
            ],
            "detail": "bench_result.json",
        },
        separators=(",", ":"),
    )
    if len(payload) > 1900:  # stay under the tail buffer, always
        payload = json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": {"all": total},
                "sf": sf,
                "ratio_vs_duckdb": ratio,
                "detail": "bench_result.json",
            },
            separators=(",", ":"),
        )
    # The JSON is the SOLE final stdout line: flush both streams, then
    # lead with a newline so a partial progress line can't prefix it.
    sys.stderr.flush()
    sys.stdout.flush()
    sys.stdout.write("\n" + payload + "\n")
    sys.stdout.flush()


def _short(name: str, names) -> str:
    """Shortest leading-underscore-segment prefix of ``name`` unique
    within ``names`` ("b01_scan_filter_project" -> "b01", but
    "b39_lsh_embedding_neardup" -> "b39_lsh" because plain "b39" is
    taken by "b39_embedding_neardup")."""
    parts = name.split("_")
    for i in range(1, len(parts)):
        cand = "_".join(parts[:i])
        clashes = [
            n for n in names if n != name and n.split("_")[: i] == parts[:i]
        ]
        if not clashes:
            return cand
    return name


if __name__ == "__main__":
    main()
