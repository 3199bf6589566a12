"""Accuracy contract for b45's sketch aggregates.

b45 is rows-only by design (HLL++/KLL internals are engine-specific,
so no DuckDB hash can match) — but the ESTIMATES still have a
published error model: HyperLogLog++ at default rsd 0.05, and
percentile_approx at default accuracy 10000 (near-exact at test
cardinalities). This pins the estimates against exactly-computed
ground truth on the same session, so a rows-only driver row certifies
a working sketch, not just a non-empty DataFrame.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_sandbox_spark.catalog import table
from kafka_streams_sandbox_spark.operators.extended import b45_sketch_aggregates

SF_SMALL = "/root/testdata/sf0.001"


def test_sketch_estimates_within_error_bounds(spark):
    got = {r["l_returnflag"]: r for r in b45_sketch_aggregates(spark, SF_SMALL).collect()}
    li = table(spark, SF_SMALL, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.countDistinct("l_orderkey").alias("orders"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .collect()
    }
    assert got.keys() == exact.keys()
    for flag, e in exact.items():
        g = got[flag]
        # HLL++ default rsd is 0.05; 4 sigma gives a deterministic-safe
        # bound (the sketch itself is deterministic for fixed input)
        assert g["approx_parts"] == pytest.approx(e["parts"], rel=0.2)
        assert g["approx_orders"] == pytest.approx(e["orders"], rel=0.2)
        # percentile_approx returns a real element within rank error
        # 1/accuracy; at a few thousand rows that is the exact value's
        # immediate neighborhood
        for k, lo_q, hi_q in (("p50_price", 0.45, 0.55), ("p95_price", 0.93, 0.97)):
            assert e["lo"] <= g[k] <= e["hi"]
        assert g["p50_price"] == pytest.approx(e["p50"], rel=0.05)
        assert g["p95_price"] == pytest.approx(e["p95"], rel=0.05)
        assert g["p50_price"] <= g["p95_price"]
