#!/usr/bin/env python
"""Round-13 probes (VERDICT r12 asks).

Modes:
  twin_receipt [sf_dir]   — b126==b100 / b127==b113 row equality at
                            the given SF (the "both SFs" receipt for
                            the attribute-funnel integration; the
                            sf0.001 half is the contract test).
  state_growth [sf_dir] [K] — a29-family standing-state growth across
                            K ingest batches (VERDICT r12 #8): per
                            batch, index/accepted rows + bytes +
                            files + wall; then one
                            compact_committed_state round per store
                            with content-equality check and a
                            post-compaction batch.
  unigram_scale [sf_dir]  — b123 at production piece inventories
                            (VERDICT r12 #5): the loss-contribution
                            prune schedule on the 20k-word corpus at
                            8k and 32k vocab, vs the count-top-K
                            rule, with overlap + wall receipts.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"


def _spark():
    from kafka_streams_sandbox_spark.session import get_spark

    spark = get_spark(app_name="probe-r13")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def twin_receipt(sf_dir: str) -> None:
    from kafka_streams_sandbox_spark.registry import all_queries

    spark = _spark()
    qs = all_queries()
    out = {"sf_dir": sf_dir}
    for new, old in (
        ("b126_attribute_curation_funnel", "b100_curation_capstone"),
        ("b127_attribute_graded_funnel", "b113_curation_graded_mixture"),
    ):
        t0 = time.perf_counter()
        a = sorted(tuple(r) for r in qs[new](spark, sf_dir).collect())
        t_new = time.perf_counter() - t0
        t0 = time.perf_counter()
        b = sorted(tuple(r) for r in qs[old](spark, sf_dir).collect())
        t_old = time.perf_counter() - t0
        out[new] = {
            "equal": a == b,
            "rows": len(a),
            "wall_s": round(t_new, 1),
            "twin_wall_s": round(t_old, 1),
        }
        print(json.dumps({new: out[new]}), flush=True)
    print(json.dumps(out))


def _du(path: str) -> tuple[int, int]:
    """(bytes, parquet file count) under path."""
    total, files = 0, 0
    for root, _dirs, names in os.walk(path):
        for n in names:
            p = os.path.join(root, n)
            total += os.path.getsize(p)
            if n.endswith(".parquet"):
                files += 1
    return total, files


def state_growth(sf_dir: str, k: int = 8) -> None:
    """The a29 self-seeding loop re-run in batch form with K arrival
    slices (the stream's foreachBatch is replayed as a driver loop —
    identical state discipline, measurable between batches)."""
    from pyspark.sql import functions as F

    from kafka_streams_sandbox_spark.catalog import documents_wide
    from kafka_streams_sandbox_spark.functions.tokens import TOKENS_EXPR
    from kafka_streams_sandbox_spark.operators.dedup import (
        guarded_band_index,
        selfseed_delta_from_verdicts,
        selfseed_ingest_round,
    )
    from kafka_streams_sandbox_spark.session import (
        release_local_checkpoint,
        scratch_dir,
    )
    from kafka_streams_sandbox_spark.streaming.windows import (
        committed_state,
        compact_committed_state,
    )

    spark = _spark()
    docs = documents_wide(spark, sf_dir)
    is_new = (F.col("doc_id") % 10) >= 8
    tokened = docs.filter(F.expr(f"size({TOKENS_EXPR}) > 0"))
    corpus_text = tokened.filter(~is_new).select("doc_id", "text")

    index_dir = scratch_dir("kss-r13growth-idx-")
    accepted_dir = scratch_dir("kss-r13growth-acc-")
    out_dir = scratch_dir("kss-r13growth-out-")
    guarded_band_index(tokened.filter(~is_new)).write.parquet(
        f"{index_dir}/seed"
    )

    idx_schema = "doc_ref bigint, band int, key bigint"
    acc_schema = "doc_id bigint, text string"

    def run_batch(batch_id: int, bdf) -> dict:
        t0 = time.perf_counter()
        index = committed_state(spark, index_dir, idx_schema, batch_id,
                                seed=True)
        standing = corpus_text.unionByName(
            committed_state(spark, accepted_dir, acc_schema, batch_id,
                            seed=False)
        )
        handles: list = []
        verdicts, probe = selfseed_ingest_round(
            batch=bdf.filter(F.expr(f"size({TOKENS_EXPR}) > 0")),
            batch_all_ids=bdf.select("doc_id"),
            corpus=standing,
            index=index,
            release_into=handles,
        )
        vpath = f"{out_dir}/batch_id={batch_id}"
        verdicts.write.mode("overwrite").parquet(vpath)
        written = spark.read.parquet(vpath)
        selfseed_delta_from_verdicts(probe, written, index).write.mode(
            "overwrite"
        ).parquet(f"{index_dir}/batch_id={batch_id}")
        accepted = written.filter(F.col("status") == "unique").select(
            "doc_id"
        )
        bdf.join(accepted, "doc_id", "left_semi").select(
            "doc_id", "text"
        ).write.mode("overwrite").parquet(
            f"{accepted_dir}/batch_id={batch_id}"
        )
        for h in handles:
            release_local_checkpoint(h)
        ib, ifl = _du(index_dir)
        ab, afl = _du(accepted_dir)
        row = {
            "batch": batch_id,
            "wall_s": round(time.perf_counter() - t0, 1),
            "arrived": bdf.count(),
            "admitted": accepted.count(),
            "index_bytes": ib,
            "index_files": ifl,
            "accepted_bytes": ab,
            "accepted_files": afl,
        }
        print(json.dumps(row), flush=True)
        return row

    # K arrival slices over the arriving 20% (sub-batch by doc_id//10
    # so each slice mixes the full id range)
    rows = []
    for b in range(k):
        bdf = docs.filter(is_new & ((F.col("doc_id") / 10).cast("long")
                                    % k == b))
        rows.append(run_batch(b, bdf))

    # at-rest compaction of both stores, then one more batch
    pre_idx = committed_state(spark, index_dir, idx_schema, 1 << 30,
                              seed=True)
    pre_rows = pre_idx.count()
    c1 = compact_committed_state(spark, index_dir, idx_schema, 1 << 30)
    c2 = compact_committed_state(spark, accepted_dir, acc_schema, 1 << 30)
    post_rows = committed_state(spark, index_dir, idx_schema, 1 << 30,
                                seed=True).count()
    print(json.dumps({"compaction": {"index": c1, "accepted": c2,
                                     "index_rows_preserved":
                                         pre_rows == post_rows}}),
          flush=True)
    # post-compaction batch must behave identically (state contents
    # unchanged; only layout folded)
    bdf = docs.filter(is_new & ((F.col("doc_id") / 10).cast("long")
                                % k == 0))  # re-offer batch 0's docs
    post = run_batch(k, bdf)
    print(json.dumps({
        "post_compaction_reoffer": post,
        "expect": "admitted == 0 (every re-offered doc matches state)",
    }))


def unigram_scale(sf_dir: str = "/tmp/kss_widevocab") -> None:
    from kafka_streams_sandbox_spark.catalog import table
    from kafka_streams_sandbox_spark.operators.selection import (
        unigram_lm_train,
    )

    spark = _spark()
    docs = table(spark, sf_dir, "documents")
    out = {"sf_dir": sf_dir}
    for vocab in (8192, 32768):
        for label, kw in (
            ("loss_prune", dict(loss_prune=True)),
            ("count_topk", dict(loss_prune=False)),
        ):
            t0 = time.perf_counter()
            counts, _ = unigram_lm_train(
                docs, seed_cap=65536, vocab=vocab, rounds=3, **kw
            )
            wall = round(time.perf_counter() - t0, 1)
            multis = {p for p in counts if len(p) > 1}
            out[f"v{vocab}_{label}"] = {
                "wall_s": wall,
                "pieces": len(counts),
                "multis": len(multis),
            }
            out.setdefault(f"v{vocab}_sets", {})[label] = multis
            print(json.dumps({f"v{vocab}_{label}":
                              out[f"v{vocab}_{label}"]}), flush=True)
        sets = out.pop(f"v{vocab}_sets")
        inter = len(sets["loss_prune"] & sets["count_topk"])
        out[f"v{vocab}_overlap"] = {
            "shared_multis": inter,
            "jaccard": round(
                inter / max(len(sets["loss_prune"] | sets["count_topk"]), 1),
                3,
            ),
        }
        print(json.dumps({f"v{vocab}_overlap": out[f"v{vocab}_overlap"]}),
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "twin_receipt":
        twin_receipt(sys.argv[2] if len(sys.argv) > 2 else
                     "/root/testdata/sf0.01")
    elif mode == "state_growth":
        state_growth(sys.argv[2] if len(sys.argv) > 2 else SRC,
                     int(sys.argv[3]) if len(sys.argv) > 3 else 8)
    elif mode == "unigram_scale":
        unigram_scale(sys.argv[2] if len(sys.argv) > 2 else
                      "/tmp/kss_widevocab")
    else:
        raise SystemExit(f"unknown mode {mode}")
