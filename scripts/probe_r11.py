#!/usr/bin/env python
"""Round-11 100x probes (VERDICT r10 #1): a37's per-batch ingest cost,
decomposed and cut.

Round 10's receipt: ~345 s per 50k-doc batch, flat across batches, 9x
a34's per-batch constant — suspects (a) the three consumers racing the
`rw` lazy checkpoint's first materialization, (b) the frozen 1.2M-row
set joins re-exchanging per batch, (c) the duality twin's share of the
total wall. The r11 tree fixes (a) via scratch-parquet staging
(`_stage` in windows.py graded_decisions — each shared intermediate is
written once and re-read by footer schema, so every lineage executes
exactly once), (b) via `_keyed_persist` (frozen sets
persisted pre-partitioned + pre-sorted on their join keys), and
reports (c) separately via INGEST_PHASE_SECONDS.

Usage:
  python scripts/probe_r11.py cadence <query> [sf_dir]
  python scripts/probe_r11.py run q1,q2 [sf_dir]       # noop-write walls
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/tmp/kss_100x"


def cadence(name: str, sf_dir: str) -> None:
    """Full-replay wall + per-batch cadence + the r11 decomposition
    (per-batch stage walls, artifact-build wall, twin/duality wall)."""
    from kafka_streams_sandbox_spark.registry import all_queries
    from kafka_streams_sandbox_spark.session import get_spark
    from kafka_streams_sandbox_spark.streaming import windows

    spark = get_spark(app_name="probe-r11")
    spark.sparkContext.setLogLevel("ERROR")
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


def a36_modes(sf_dir: str) -> None:
    """a36 verify-knob receipt (VERDICT r10 #7): the 3-round
    compaction cadence wall with the full store==batch invariance
    assert vs the sampled (doc_id % 16) production form."""
    from pyspark.sql import functions as F  # noqa: F401

    from kafka_streams_sandbox_spark.catalog import documents_wide
    from kafka_streams_sandbox_spark.session import get_spark
    from kafka_streams_sandbox_spark.streaming.windows import (
        span_compaction_rounds,
    )

    spark = get_spark(app_name="probe-r11")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for mode in ("full", "sampled"):
        t0 = time.perf_counter()
        docs = documents_wide(spark, sf_dir).select("doc_id", "text")
        span_compaction_rounds(spark, docs, verify=mode).write.format(
            "noop"
        ).mode("overwrite").save()
        out[mode] = round(time.perf_counter() - t0, 1)
        print(f"a36 verify={mode}: {out[mode]} s", flush=True)
    print(json.dumps({"query": "a36_span_compaction", "sf_dir": sf_dir,
                      "wall_s": out}))


def run(names: list[str], sf_dir: str, repeats: int = 2) -> None:
    from kafka_streams_sandbox_spark.registry import all_queries
    from kafka_streams_sandbox_spark.session import get_spark

    spark = get_spark(app_name="probe-r11")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    out = {}
    for name in names:
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 1)
        print(f"{name}: {out[name]} s", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "noop_wall_s": out}))


if __name__ == "__main__":
    if sys.argv[1] == "cadence":
        cadence(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else SRC)
    elif sys.argv[1] == "a36":
        a36_modes(sys.argv[2] if len(sys.argv) > 2 else SRC)
    else:
        names = sys.argv[2].split(",")
        sf_dir = sys.argv[3] if len(sys.argv) > 3 else SRC
        run(names, sf_dir)
