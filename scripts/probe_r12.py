#!/usr/bin/env python
"""Round-12 probes (VERDICT r11 #1/#2/#3/#5).

1. `bpe_posture <k>` — settle b117's production-merge-count question
   with a measurement: time the per-round DISTRIBUTED merge loop
   (b117's `_bpe_train`) at k merge rounds on the 100x corpus and the
   driver-side incremental loop (b122: one capped (word,count) pass +
   `bpe_merge_loop`) at the same k, printing s/round for both. The
   hypothesis under test: at real BPE's ~30k rounds, per-round JOB
   LATENCY (vocab scan + 1-row argmax collect) dominates the
   distributed form, while the driver loop is seconds after its one
   corpus pass.

2. `run q1,q2[,...] [sf_dir]` — best-of-2 noop-write walls (the
   round's standard 100x receipt mode) for the new operators
   (b122/b123/b124/b125) and the continuity re-pins.

3. `cadence <query> [sf_dir]` — per-batch ingest cadence (a42 and the
   funnel family), identical to probe_r11's cadence mode.

Usage:
  python scripts/probe_r12.py bpe_posture 500 [sf_dir]
  python scripts/probe_r12.py run b122_bpe_production_train /tmp/kss_100x
  python scripts/probe_r12.py cadence a42_stream_unigram_segment /tmp/kss_100x
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/tmp/kss_100x"


def _spark():
    from kafka_streams_sandbox_spark.session import get_spark

    spark = get_spark(app_name="probe-r12")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def build_widevocab(out_dir: str, n_docs: int = 100_000,
                    n_vocab: int = 20_000, wpd: int = 50) -> None:
    """A documents corpus whose VOCABULARY is deep enough to sustain
    ~1000+ BPE merge rounds. The driver corpora (and their 100x
    rescales) carry a ~31-word vocabulary, so the merge loop exhausts
    every adjacent pair after ~89 elections — fine for the s/round
    comparison, but VERDICT r11 #1 asks for the ~500-1000-round
    regime real trainers run in. Deterministic 8-char pseudo-words
    (seeded Zipf-ish draw over n_vocab words) give ~7 electable pairs
    per distinct word: 20k words sustain >100k rounds."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(4242)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    vocab = np.array([
        "".join(rng.choice(letters, 8)) for _ in range(n_vocab)
    ])
    # Zipf-ish weights so pair counts are skewed like real text
    w = 1.0 / np.arange(1, n_vocab + 1)
    w /= w.sum()
    texts = [
        " ".join(rng.choice(vocab, wpd, p=w)) for _ in range(n_docs)
    ]
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n_docs, pa.string()),
            "source": pa.array(["wide"] * n_docs, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        os.path.join(out_dir, "documents.parquet"),
    )
    print(json.dumps({"built": out_dir, "n_docs": n_docs,
                      "n_vocab": n_vocab, "words_per_doc": wpd}))


def bpe_posture(k: int, sf_dir: str, k_driver: int | None = None) -> None:
    """k = distributed-form merge rounds; k_driver (default k) lets the
    driver loop probe the full production depth (~30k) while the
    distributed form — whose per-round cost is the finding — runs a
    shorter, affordable count."""
    from kafka_streams_sandbox_spark.catalog import table
    from kafka_streams_sandbox_spark.operators.selection import (
        _bpe_train,
        bpe_merge_loop,
        capped_vocab,
    )
    from kafka_streams_sandbox_spark.session import (
        release_local_checkpoint,
    )

    spark = _spark()
    k_driver = k if k_driver is None else k_driver
    # the merge-table identity check below prefix-compares the
    # distributed merges against merges[:len(dist_merges)]; that is
    # only meaningful when the driver list is at least as long as the
    # distributed one (r12 ADVICE: a shorter k_driver made identical
    # semantics report False) — clamp and say so in the output
    if k_driver < k:
        k_driver = k
    out: dict = {"k": k, "k_driver": k_driver, "sf_dir": sf_dir,
                 "merge_check": "common-prefix only (first k rounds)"}

    # driver-side production loop (b122's shape, cap wide enough that
    # it does not bind on this corpus — the comparison is loop cost,
    # not vocabulary truncation)
    t0 = time.perf_counter()
    wc = capped_vocab(table(spark, sf_dir, "documents"), cap=1_000_000)
    out["vocab_pass_s"] = round(time.perf_counter() - t0, 1)
    out["vocab_rows"] = len(wc)
    t0 = time.perf_counter()
    merges = bpe_merge_loop(wc, k_driver)
    loop_s = time.perf_counter() - t0
    out["driver_loop_s"] = round(loop_s, 1)
    out["driver_loop_s_per_round"] = round(loop_s / max(len(merges), 1), 6)
    out["driver_rounds_done"] = len(merges)
    print(json.dumps(out), flush=True)  # driver numbers survive a
    # distributed-phase crash (the k>~100 analyzer ceiling below)

    # distributed per-round form (b117's shape) at k rounds. Expected
    # to FAIL for k past ~100: the symbol column nests one
    # _merge_symbols layer per round into a single expression tree,
    # and Catalyst's Resolution batch hits its 100-iteration fixed-
    # point ceiling analyzing it — the structural ceiling recorded in
    # BASELINE round 12, on top of the ~1 s/round job latency.
    t0 = time.perf_counter()
    try:
        dist_merges, final = _bpe_train(spark, sf_dir, k=k)
    except Exception as exc:  # noqa: BLE001 — the ceiling is the datum
        out["distributed_error"] = str(exc).split("\n")[0][:200]
        out["distributed_failed_after_s"] = round(
            time.perf_counter() - t0, 1
        )
    else:
        dist_s = time.perf_counter() - t0
        out["distributed_s"] = round(dist_s, 1)
        out["distributed_s_per_round"] = round(
            dist_s / max(len(dist_merges), 1), 3
        )
        out["distributed_rounds_done"] = len(dist_merges)
        out["merge_tables_identical"] = (
            dist_merges == merges[: len(dist_merges)]
        )
        release_local_checkpoint(final)
    print(json.dumps(out))


def run(names: str, sf_dir: str) -> None:
    from kafka_streams_sandbox_spark.registry import all_queries

    spark = _spark()
    qs = all_queries()
    reps = int(os.environ.get("KSS_PROBE_REPS", "2"))
    results = {}
    for name in names.split(","):
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(round(time.perf_counter() - t0, 1))
        results[name] = walls
        print(json.dumps({name: walls}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "best_of_n": {
        n: min(w) for n, w in results.items()}}))


def cadence(name: str, sf_dir: str) -> None:
    from kafka_streams_sandbox_spark.registry import all_queries
    from kafka_streams_sandbox_spark.streaming import windows

    spark = _spark()
    windows.INGEST_BATCH_SECONDS.clear()
    windows.INGEST_STAGE_SECONDS.clear()
    windows.INGEST_PHASE_SECONDS.clear()
    t0 = time.perf_counter()
    all_queries()[name](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    print(
        json.dumps(
            {
                "query": name,
                "sf_dir": sf_dir,
                "total_s": round(time.perf_counter() - t0, 1),
                "per_batch_s": list(windows.INGEST_BATCH_SECONDS),
                "per_batch_stages": list(windows.INGEST_STAGE_SECONDS),
                "phases": list(windows.INGEST_PHASE_SECONDS),
            }
        )
    )


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "build_widevocab":
        build_widevocab(sys.argv[2] if len(sys.argv) > 2 else "/tmp/kss_widevocab")
    elif mode == "bpe_posture":
        bpe_posture(
            int(sys.argv[2]),
            sys.argv[3] if len(sys.argv) > 3 else SRC,
            int(sys.argv[4]) if len(sys.argv) > 4 else None,
        )
    elif mode == "run":
        run(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else SRC)
    elif mode == "cadence":
        cadence(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else SRC)
    else:
        raise SystemExit(f"unknown mode {mode}")
