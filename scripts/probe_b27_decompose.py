#!/usr/bin/env python
"""Round-12 b27 scale-cliff decomposition (VERDICT r11 #5).

b27 at 300x ran >20 min/rep vs 73-95 s at 100x (>= 9x for 3x data).
Hypothesis under test: the cliff is OUTPUT-quadratic, not plan-
quadratic — the synthetic corpus draws every doc from ONE fixed
~31-word vocabulary, so the probability that two random docs exceed
0.8 char-shingle Jaccard is roughly scale-INDEPENDENT, and the true
near-dup pair count (which any pair-emitting operator must at least
write) grows ~n². This script counts each pipeline stage at a given
sf_dir WITHOUT running the full verify join first: reps after
collapse, band-bucket size distribution, candidate pairs (small-
bucket C(b,2) + star), then the verified output count — so the
stage that explodes is measured, not guessed.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main(sf_dir: str) -> None:
    from kafka_streams_sandbox_spark.catalog import documents_wide
    from kafka_streams_sandbox_spark.functions.tokens import TOKENS_EXPR
    from kafka_streams_sandbox_spark.operators.dedup import (
        _BUCKET_CAP,
        _minhash_band_keys,
        _minhash_lsh,
        char_ngrams_hashed_expr,
    )
    from kafka_streams_sandbox_spark.session import get_spark

    spark = get_spark(app_name="b27-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf_dir": sf_dir}

    all_docs = documents_wide(spark, sf_dir)
    out["n_docs"] = all_docs.count()

    t0 = time.perf_counter()
    fp = all_docs.filter(F.expr(f"size({TOKENS_EXPR}) > 0")).select(
        "doc_id",
        F.xxhash64(F.array_sort(F.expr(char_ngrams_hashed_expr(5)))).alias(
            "fp"
        ),
    )
    groups = fp.groupBy("fp").agg(
        F.min("doc_id").alias("rep"), F.count(F.lit(1)).alias("gsz")
    )
    reps = groups.count()
    out["reps_after_collapse"] = reps
    out["collapse_pass_s"] = round(time.perf_counter() - t0, 1)

    docs = all_docs.join(
        groups.select(F.col("rep").alias("doc_id")), "doc_id", "left_semi"
    )
    t0 = time.perf_counter()
    bands = _minhash_band_keys(docs)
    bsz = bands.groupBy("band", "key").agg(F.count(F.lit(1)).alias("bsz"))
    dist = bsz.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("bsz").alias("max_bucket"),
        F.sum(F.expr("CASE WHEN bsz <= %d THEN bsz*(bsz-1)/2 ELSE 0 END" % _BUCKET_CAP)).alias("small_pairs"),
        F.sum(F.expr("CASE WHEN bsz > %d THEN bsz-1 ELSE 0 END" % _BUCKET_CAP)).alias("star_pairs"),
        F.sum(F.expr("CASE WHEN bsz > 1 THEN bsz ELSE 0 END")).alias("rows_in_multi"),
    ).collect()[0]
    out["banding_pass_s"] = round(time.perf_counter() - t0, 1)
    out["n_buckets"] = dist["n_buckets"]
    out["max_bucket"] = int(dist["max_bucket"])
    out["candidate_pairs_upper"] = int(dist["small_pairs"] + dist["star_pairs"])
    out["small_bucket_pairs"] = int(dist["small_pairs"])
    out["star_pairs"] = int(dist["star_pairs"])
    print(json.dumps(out), flush=True)

    # full operator (verified output) — the expensive truth
    t0 = time.perf_counter()
    n_out = _minhash_lsh(spark, sf_dir, collapse=True).count()
    out["verified_rows"] = n_out
    out["full_operator_s"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/kss_100x")
