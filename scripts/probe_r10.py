#!/usr/bin/env python
"""Round-10 100x probes (VERDICT r9 #2/#7): full-materialization
(noop-write) wall clock for the paragraph-dedup family at the 100x
corpus, plus the adversarial paragraph-skew variant.

count() probes are BANNED for these queries — b112 ends in a left
join of an aggregate and count() plans the whole rebuild away (the r9
join-elimination artifact, see BASELINE.md round-9 notes).

Usage:
  python scripts/probe_r10.py build-skew   # /tmp/kss_100x_para from /tmp/kss_100x
  python scripts/probe_r10.py run [q1,q2,...] [sf_dir]

The skew corpus prepends ONE fixed 20-token boilerplate paragraph to
50% of the 100x docs: b112's paragraphs are fixed 20-token blocks, so
the prepended block lands exactly on block 0 of every afflicted doc —
~250k rows in ONE xxhash64 window partition, the b27/b55 hostile
boilerplate class at paragraph granularity.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/tmp/kss_100x"
SKEW = "/tmp/kss_100x_para"
BOILER = " ".join(f"bp{j}" for j in range(20))  # one 20-token block


def build_skew() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(SKEW, exist_ok=True)
    for name in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        dst = os.path.join(SKEW, f"{name}.parquet")
        if os.path.lexists(dst):
            os.unlink(dst)
        os.symlink(os.path.join(SRC, f"{name}.parquet"), dst)
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    # every even doc_id gets the boilerplate block 0 (~50%)
    texts = [
        (BOILER + " " + x) if (i % 2 == 0) else x
        for i, x in zip(ids, texts)
    ]
    cols = {name: t[name] for name in t.column_names}
    cols["text"] = pa.array(texts, pa.string())
    pq.write_table(pa.table(cols), os.path.join(SKEW, "documents.parquet"))
    print(f"wrote {SKEW}/documents.parquet ({len(texts)} docs, "
          f"{sum(i % 2 == 0 for i in ids)} boilerplated)")


def run(names: list[str], sf_dir: str, repeats: int = 2) -> None:
    from kafka_streams_sandbox_spark.registry import all_queries
    from kafka_streams_sandbox_spark.session import get_spark

    spark = get_spark(app_name="probe-r10")
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


def cadence(name: str, sf_dir: str) -> None:
    """Per-micro-batch wall for an ingest funnel query (VERDICT r9
    #4's 'cadence probe flat across batches') via the
    INGEST_BATCH_SECONDS hook. One invocation = the funnel's full
    replay (2 seq batches at the 100x corpus, ~50k docs each)."""
    from kafka_streams_sandbox_spark.registry import all_queries
    from kafka_streams_sandbox_spark.session import get_spark
    from kafka_streams_sandbox_spark.streaming import windows

    spark = get_spark(app_name="probe-r10")
    spark.sparkContext.setLogLevel("ERROR")
    windows.INGEST_BATCH_SECONDS.clear()
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
            }
        )
    )


if __name__ == "__main__":
    if sys.argv[1] == "build-skew":
        build_skew()
    elif sys.argv[1] == "cadence":
        cadence(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else SRC)
    else:
        names = sys.argv[2].split(",")
        sf_dir = sys.argv[3] if len(sys.argv) > 3 else SRC
        run(names, sf_dir)
