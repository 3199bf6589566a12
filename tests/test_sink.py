"""Partitioned-sink layout tests: the write layout must actually buy
the scan-time pruning it promises."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kafka_streams_sandbox_spark.plans.inspect import plan_string
from kafka_streams_sandbox_spark.sources.sink import (
    read_partitioned,
    write_partitioned,
)


def test_partitioned_write_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "docs_by_lang")
    write_partitioned(
        docs, out, partition_by=["lang"], sort_within=["doc_id"]
    )
    # one directory per lang value
    dirs = {d for d in os.listdir(out) if d.startswith("lang=")}
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    assert dirs == {f"lang={v}" for v in langs}

    back = read_partitioned(spark, out)
    assert back.count() == docs.count()

    # a lang predicate must prune partitions at the scan, before I/O
    q = back.filter(F.col("lang") == "en").select("doc_id")
    plan = plan_string(q)
    assert "PartitionFilters" in plan and "lang" in plan.split(
        "PartitionFilters", 1
    )[1].splitlines()[0], plan
    n_en = docs.filter(F.col("lang") == "en").count()
    assert q.count() == n_en
